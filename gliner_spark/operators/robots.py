"""Retroactive robots.txt filtering of a crawled pages corpus.

Training-data pipelines increasingly re-apply robots rules AFTER the
crawl (retroactive opt-out: a host's current robots.txt governs
whether its already-crawled pages may be used). This operator drops
pages whose path falls under a Disallow prefix for their host.

Supported rule subset — the prefix rules that cover the vast majority
of real robots files, deterministically: ``User-agent: *`` groups'
``Disallow: <prefix>`` lines (non-empty prefixes; ``Allow`` overrides
and wildcards are out of scope and documented so — a page kept by
this filter under full precedence semantics is also kept here, i.e.
the filter only ever errs on the side of DROPPING MORE).

Scale shape: the rules table is tiny relative to the corpus (one row
per (host, prefix)); the filter is a broadcast LEFT ANTI join on the
host equality with the prefix match as a residual predicate — the
corpus never shuffles.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, functions as F

from ..functions.urls import url_host, url_path


def parse_robots(txt: str) -> List[str]:
    """Disallow prefixes applying to ``User-agent: *`` from one
    robots.txt body. Pure kernel, unit-testable; tolerant of case,
    comments, and CRLF. Empty ``Disallow:`` (allow-all) contributes
    nothing."""
    prefixes: List[str] = []
    group_agents: List[str] = []
    collecting_agents = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            # consecutive User-agent lines form ONE group whose rules
            # apply to every listed agent (RFC 9309) — resetting on
            # each line would drop the '*' when another agent follows
            if not collecting_agents:
                group_agents = []
            collecting_agents = True
            group_agents.append(val)
        else:
            collecting_agents = False
            if key == "disallow" and "*" in group_agents and val:
                prefixes.append(val)
    return prefixes


def robots_rules_df(spark, robots: Dict[str, str]) -> DataFrame:
    """{host: robots.txt body} → (host, prefix) rules table."""
    rows: List[Tuple[str, str]] = [
        (host.lower(), p)
        for host, txt in robots.items()
        for p in parse_robots(txt)
    ]
    return spark.createDataFrame(rows or [("", "")], "host string, prefix string").where(
        F.col("host") != ""
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Pages whose (host, path) hits NO (host, Disallow-prefix) rule.

    ``rules`` is a (host, prefix) DataFrame (see ``robots_rules_df``).
    The anti-join keys on host equality (hash-joinable) with
    ``startswith(prefix)`` as the residual condition; the rules side
    is broadcast, so the corpus side stays un-shuffled.
    """
    # a URL with no path component requests '/', so 'Disallow: /'
    # must cover it (url_path returns '' there, which no prefix would
    # match — the filter would silently KEEP an opted-out root page)
    path = url_path(F.col(url_col))
    with_parts = pages.withColumns(
        {
            "__host": url_host(F.col(url_col)),
            "__path": F.when(path == "", F.lit("/")).otherwise(path),
        }
    )
    r = rules.select(
        F.col("host").alias("__r_host"), F.col("prefix").alias("__r_prefix")
    )
    cond = (F.col("__host") == F.col("__r_host")) & F.col(
        "__path"
    ).startswith(F.col("__r_prefix"))
    return (
        with_parts.join(F.broadcast(r), cond, "left_anti")
        .drop("__host", "__path")
    )
