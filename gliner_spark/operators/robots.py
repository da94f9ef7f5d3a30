"""Retroactive robots.txt filtering of a crawled pages corpus.

Training-data pipelines increasingly re-apply robots rules AFTER the
crawl (retroactive opt-out: a host's current robots.txt governs
whether its already-crawled pages may be used). This operator applies
RFC 9309 precedence: of all ``User-agent: *`` group rules whose prefix
matches a page's path+query, the LONGEST match wins, and an Allow
beats a Disallow of equal length (§2.2.2 "most specific match ...
least restrictive on ties").

Conservative handling of the non-prefix syntax, chosen so the filter
only ever errs toward DROPPING MORE (the right failure direction for
an opt-out compliance pass):

* ``Disallow`` values containing ``*`` are truncated at the first
  ``*`` (and a trailing ``$`` is stripped first) — the resulting
  prefix matches a superset of what the wildcard rule matches, so
  over-drops. A value that truncates to '' (leading ``*``) becomes
  ``/`` — everything on that host drops.
* ``Allow`` values containing ``*`` or anchored with ``$`` are
  DISCARDED: widening an Allow would retain opted-out pages (the
  wrong direction), so the carve-out is forfeited instead.

Matching follows RFC 9309 §2.2.2's match target: the URL's path plus
``?query`` when present (``Disallow: /index.php?action=`` works).
Pages whose URL yields no parseable host match no rules; by default
they are KEPT (flagged via ``drop_unparseable=False``) — pass
``drop_unparseable=True`` to drop them instead of silently retaining.

Scale shape: the rules table is tiny relative to the corpus (one row
per (host, rule, prefix)); rules aggregate to one array per host (a
shuffle of the RULES only), then a broadcast LEFT join puts each
host's rule array on its pages and the verdict is a pure array
expression (filter/exists over the struct array) — the corpus never
shuffles and the whole filter is map-side.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, functions as F

from ..functions.urls import url_host, url_path


def parse_robots(txt: str) -> List[Tuple[str, str]]:
    """(rule, prefix) pairs applying to ``User-agent: *`` from one
    robots.txt body, rule ∈ {"allow", "disallow"}. Pure kernel,
    unit-testable; tolerant of case, comments, and CRLF. Empty values
    contribute nothing. Wildcard/``$`` values are conservatively
    truncated (disallow) or discarded (allow) — see module docstring.
    """
    rules: List[Tuple[str, str]] = []
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
            continue
        collecting_agents = False
        if "*" not in group_agents or key not in ("allow", "disallow") or not val:
            continue
        anchored = val.endswith("$")
        wild = "*" in val
        if key == "allow":
            if anchored or wild:
                continue  # widening an Allow would under-drop — forfeit
            rules.append(("allow", val))
            continue
        if anchored:
            val = val[:-1]
        if wild:
            val = val.split("*", 1)[0]
        # a Disallow that truncates to '' ('Disallow: *…') covers every
        # path — the conservative reading is host-wide
        rules.append(("disallow", val or "/"))
    return rules


def robots_rules_df(spark, robots: Dict[str, str]) -> DataFrame:
    """{host: robots.txt body} → (host, rule, prefix) rules table."""
    rows: List[Tuple[str, str, str]] = [
        (host.lower(), rule, p)
        for host, txt in robots.items()
        for rule, p in parse_robots(txt)
    ]
    return spark.createDataFrame(
        rows or [("", "", "")], "host string, rule string, prefix string"
    ).where(F.col("host") != "")


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    precedence: str = "longest_match",
    drop_unparseable: bool = False,
) -> DataFrame:
    """Pages permitted by their host's ``User-agent: *`` rules.

    ``rules`` is a (host, rule, prefix) DataFrame (``robots_rules_df``).

    ``precedence``:

    * ``"longest_match"`` (default, RFC 9309 §2.2.2): among matching
      prefixes the longest wins; Allow beats Disallow on equal length;
      no match keeps the page.
    * ``"disallow_only"`` — the documented over-drop fallback (the
      pre-r5 behavior): Allow rules are ignored and ANY matching
      Disallow prefix drops the page. A page kept under full
      precedence may drop here, never the reverse.

    ``drop_unparseable=True`` drops pages whose URL yields no host
    (scheme-less/garbage URLs match no rules and would silently pass
    an opt-out filter otherwise); the default keeps them.

    The rules aggregate to one struct array per host and broadcast;
    the verdict is an array expression — the corpus side never
    shuffles.
    """
    if precedence not in ("longest_match", "disallow_only"):
        raise ValueError(f"unknown precedence: {precedence!r}")
    # RFC 9309 §2.2.2 match target: path plus query when present. The
    # fragment is stripped FIRST — a '?' that first appears inside the
    # fragment ('https://h/a#sec?x') is not a query, and extracting it
    # as one would let a prefix Allow out-rank a Disallow on a target
    # the real URL never has (an under-drop, the wrong direction).
    no_frag = F.regexp_replace(F.col(url_col), "#.*$", "")
    path = url_path(no_frag)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    target = F.when(
        query != "", F.concat(path, F.lit("?"), query)
    ).otherwise(path)
    with_parts = pages.withColumns(
        {"__host": url_host(F.col(url_col)), "__target": target}
    )
    host_rules = rules.groupBy(F.col("host").alias("__r_host")).agg(
        F.collect_list(
            F.struct(
                F.col("prefix").alias("prefix"),
                (F.col("rule") == "allow").alias("is_allow"),
            )
        ).alias("__rules")
    )
    joined = with_parts.join(F.broadcast(host_rules),
                             F.col("__host") == F.col("__r_host"), "left")
    rule_arr = F.coalesce(F.col("__rules"), F.array())
    matches = F.filter(
        rule_arr, lambda r: F.col("__target").startswith(r["prefix"])
    )
    if precedence == "disallow_only":
        permitted = ~F.exists(matches, lambda r: ~r["is_allow"])
    else:
        best = F.array_max(F.transform(matches, lambda r: F.length(r["prefix"])))
        permitted = (F.size(matches) == 0) | F.exists(
            matches,
            lambda r: (F.length(r["prefix"]) == best) & r["is_allow"],
        )
    if drop_unparseable:
        permitted = permitted & (F.col("__host") != "")
    return (
        joined.where(permitted)
        .drop("__host", "__target", "__r_host", "__rules")
    )
