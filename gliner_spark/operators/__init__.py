"""DataFrame-level operators."""

from .extract import extract_entities, extract_triples, ENTITY_SCHEMA, TRIPLE_SCHEMA

__all__ = ["extract_entities", "extract_triples", "ENTITY_SCHEMA", "TRIPLE_SCHEMA"]
