"""Corpus sources: the `pages` input table and deterministic fixtures."""

from .pages import synth_pages, pages_df, gold_entities_df, read_pages

__all__ = ["synth_pages", "pages_df", "gold_entities_df", "read_pages"]
