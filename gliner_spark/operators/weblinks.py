"""Host-level web link graph from raw page markup.

The other graph this pipeline extracts: alongside the (subj, pred,
obj) entity KG, a crawl's ``<a href>`` structure aggregated to host
granularity — the input to domain-authority scoring (PageRank over
hosts via ``operators.graph_stats``), seed-list expansion, and the
spam-neighborhood filters web corpora apply before training. The
reference has no analog (net-new scale tooling, like the rest of the
corpus-hygiene layer).

Plan shape at 100 TB: one scan (html decoded and immediately reduced
to an array of hrefs — the binary column never crosses a shuffle), an
explode bounded by links-per-page, then ONE map-side-combined
aggregation keyed on (src_host, dst_host). Host pairs are far fewer
than pages, and partial aggregation collapses hot pairs per-task
before the exchange — the same Zipf argument as ``top_terms``.
Self-links are kept (a site lining to itself is signal); callers
filter if not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.html import html_links
from ..functions.urls import url_host


def host_link_graph(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    html_is_binary: bool = True,
) -> DataFrame:
    """pages(url, html[, …]) → (src_host, dst_host, n_links).

    ``n_links`` counts link multiplicity (same target linked twice =
    2); links whose href has no parseable host (relative links,
    ``mailto:`` etc — ``url_host`` yields '') are dropped: host-graph
    edges need both endpoints.
    """
    markup = F.col(html_col)
    if html_is_binary:
        markup = F.decode(markup, "UTF-8")
    links = pages.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(html_links(markup)).alias("href"),
    )
    return (
        links.select("src_host", url_host(F.col("href")).alias("dst_host"))
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
