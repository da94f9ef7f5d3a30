"""Corpus sources: the `pages` input table, raw WARC archives, and
deterministic fixtures."""

from .pages import synth_pages, pages_df, gold_entities_df, read_pages
from .warc import build_warc, parse_warc, read_warc

__all__ = [
    "synth_pages",
    "pages_df",
    "gold_entities_df",
    "read_pages",
    "build_warc",
    "parse_warc",
    "read_warc",
]
