"""Graph analytics over the extracted (subj, pred, obj) triple table.

The reference stops at emitting entities/relations per document
(gliner/decoding/decoder.py:1434-1607 formats per-text triple dicts);
any corpus-level view of the resulting graph is left to the caller. At
the 10^12-document design point the triple table IS the product, and
the two queries every KG consumer runs first are degree statistics
(hub detection, join-skew forecasting for downstream self-joins) and a
PageRank-style importance score (entity ranking / canonical-name
election among linked surface forms).

Both are pure DataFrame compositions:

* ``degree_stats`` — two map-side-combined aggregations + one
  full-outer join on the entity key. Cost is one shuffle of the
  (entity, partial-count) pairs, NOT of the triple table.
* ``pagerank`` — fixed-point INTEGER PageRank, K unrolled iterations
  of (edges ⋈ ranks) → groupBy(dst) → left-join back onto the node
  set. Every iteration shuffles only (node, rank) pairs; the distinct
  edge list is computed once and cached by Catalyst's reuse-exchange
  when the plan repeats it. Ranks are fixed-point BIGINTs (``scale`` =
  1e6) with floor division, so results are bit-identical regardless of
  partitioning, aggregation order, or executor count — which is what
  makes the gate hash-exact against the DuckDB oracle and reruns
  reproducible on a 1000-executor cluster.

Skew note: real KGs are Zipfian — a hub entity's in-edges all land on
one reducer in the contribution groupBy. AQE's skew-join splitting
handles the join side; the aggregation is a SUM, so partial
aggregation (map-side combine) already collapses each task's
contribution to one row per hot key before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degree_stats(
    triples: DataFrame,
    subj_col: str = "subj_text",
    obj_col: str = "obj_text",
) -> DataFrame:
    """Per-entity out/in/total degree over a triple table.

    Degrees count triple multiplicity (a pair related by two predicates
    contributes 2), matching the join-fanout number a planner needs.

    Returns (entity, out_deg, in_deg, degree).
    """
    out_d = triples.groupBy(F.col(subj_col).alias("entity")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = triples.groupBy(F.col(obj_col).alias("entity")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    joined = out_d.join(in_d, "entity", "full_outer")
    return joined.select(
        "entity",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0))).alias(
            "degree"
        ),
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge list.

    Semantics (simplified PR, the GraphFrames/Pregel formulation with
    dangling mass dropped):

        r_0(v)   = scale
        r_k(v)   = base + damping_pct * SUM_{(u,v) in E} (r_{k-1}(u) DIV outdeg(u)) DIV 100
        base     = (100 - damping_pct) * scale DIV 100

    All arithmetic is BIGINT with floor division, so the result is
    exactly reproducible (no float-summation order sensitivity) and a
    DuckDB oracle can replay it with ``//``. ``iterations`` is a fixed
    unroll — the production pattern for bounded-iteration graph jobs on
    Spark (each round is one shuffle of (node, rank); lineage stays
    shallow at small K, checkpoint between rounds for K >~ 10).

    Edges are deduplicated first: PR is defined on the graph, not the
    multigraph, and distinct() also bounds the join fanout on hub
    nodes.

    Returns (entity, rank_fp) where rank_fp = rank * scale.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("entity"))
        .union(e.select(F.col("dst").alias("entity")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # (src, dst, out_deg) — reused every iteration; one exchange, reused.
    e_deg = e.join(out_deg, "src")

    base = (100 - damping_pct) * scale // 100
    ranks = nodes.select("entity", F.lit(scale).cast("long").alias("rank_fp"))
    for _ in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg["src"] == ranks["entity"])
            .select(
                F.col("dst"),
                F.expr("rank_fp div out_deg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(
            contrib, nodes["entity"] == contrib["dst"], "left"
        ).select(
            "entity",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_pct} * coalesce(contrib, 0L)) div 100"
                )
            ).cast("long").alias("rank_fp"),
        )
    return ranks


def entity_cooccurrence(
    mentions: DataFrame,
    doc_col: str = "doc_id",
    entity_col: str = "entity",
    min_pairs: int = 1,
) -> DataFrame:
    """Within-document entity co-occurrence counts — the PMI
    ingredients (n_a, n_b, n_ab, n_docs) for weighting KG edges by
    association strength rather than raw adjacency. Counts are pure
    integers so the result is engine-exact; consumers compute
    PMI = log(n_ab * n_docs / (n_a * n_b)) themselves (a float log's
    last ulp is not oracle-portable, the counts are).

    Pair semantics: presence-based (document-distinct mentions), one
    undirected pair per (doc, a, b) with a < b lexicographically.

    Scale shape: the pair generation is a self-join BLOCKED on the
    document id — fanout is quadratic only in each document's DISTINCT
    entity count (bounded by document length, not corpus size), never
    cross-document. One groupBy per side over uniform keys.

    Returns (entity_a, entity_b, n_a, n_b, n_ab, n_docs) for pairs
    with n_ab >= ``min_pairs``.
    """
    de = mentions.select(
        F.col(doc_col).alias("_doc"), F.col(entity_col).alias("_e")
    ).distinct()
    # lazy one-row aggregate, broadcast onto every pair — a .count()
    # here would execute the upstream plan (the full extraction, for
    # the gate) at DataFrame-CONSTRUCTION time and again on execution
    nd = de.agg(F.countDistinct("_doc").cast("long").alias("n_docs"))
    ent_counts = de.groupBy("_e").agg(F.count(F.lit(1)).alias("n"))
    a = de.select("_doc", F.col("_e").alias("entity_a"))
    b = de.select("_doc", F.col("_e").alias("entity_b"))
    pairs = (
        a.join(b, "_doc")
        .where(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs)
    )
    return (
        pairs.join(
            ent_counts.select(
                F.col("_e").alias("entity_a"), F.col("n").alias("n_a")
            ),
            "entity_a",
        )
        .join(
            ent_counts.select(
                F.col("_e").alias("entity_b"), F.col("n").alias("n_b")
            ),
            "entity_b",
        )
        .crossJoin(F.broadcast(nd))
        .select("entity_a", "entity_b", "n_a", "n_b", "n_ab", "n_docs")
    )
