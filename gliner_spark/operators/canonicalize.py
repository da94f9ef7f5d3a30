"""Canonicalization: connected components + triple rewriting.

Groups linked mentions into canonical entities (component id = the
lexicographically smallest member) and rewrites triples to canonical
ids. Net-new per the north rule (SURVEY.md §4.2.5).

Algorithm: iterative minimum-label propagation over the match-edge
graph as DataFrame self-joins:

  label(u) ← min(label(u), min_{(u,v)∈E} label(v))

repeated until a round changes no label. Entity-match graphs are
low-diameter (near-clique clusters of coreferent mentions), so this
converges in a handful of rounds; every round is one shuffle on the
edge key. Lineage is truncated with localCheckpoint each round so the
plan doesn't grow unboundedly. For adversarial long-chain graphs the
alternating large-star/small-star algorithm (O(log n) rounds) is the
drop-in upgrade; the interface is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    max_driver_edges: int = 5_000_000,
) -> DataFrame:
    """edges(src, dst) → assignments(node, component).

    ``component`` is the minimum node id reachable from ``node``.
    Deterministic; undirected interpretation of edges.

    Two physical routes with identical results:

    * **small edge set** (≤ max_driver_edges): collect the edges and run
      union-find on the driver, then parallelize the assignment. Match
      edges are the *rare* near-dup pairs — a fraction of a percent of
      the corpus — so even a 10^12-doc run usually fits; the collect is
      of edges, never of the corpus. This avoids paying ~2 shuffles ×
      O(diameter) rounds of fixed job overhead for a tiny graph.
    * **large edge set**: iterative distributed min-label propagation
      (below), one shuffle per round, lineage truncated per round.
    """
    spark = edges.sparkSession
    # Materialize the edge set once, fully parallel, then decide the
    # route from its size. (A limit()-guarded collect would trigger
    # CollectLimit's incremental partition execution and run the
    # expensive edge-generating child nearly serially.)
    edge_rows = edges.select(src, dst).persist()
    n_edges = edge_rows.count()
    if n_edges <= max_driver_edges:
        head = edge_rows.collect()
        edge_rows.unpersist()
        pairs = [(r[0], r[1]) for r in head]
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in pairs:
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        # component = min member id (matches the distributed route)
        comp_min: dict = {}
        for node in parent:
            r = find(node)
            if r not in comp_min or node < comp_min[r]:
                comp_min[r] = node
        rows = [(n, comp_min[find(n)]) for n in parent]
        sch = edges.select(F.col(src).alias("node")).schema
        node_type = sch["node"].dataType.simpleString()
        return spark.createDataFrame(
            rows, f"node {node_type}, component {node_type}"
        )
    # big-graph route: iterate over the cached edge rows (released when
    # the caller's plan is done — tiny relative to the corpus anyway)
    sym = (
        edge_rows.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edge_rows.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))

    for _ in range(max_iter):
        # neighbor minimum for every node
        neigh_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("neigh_component"))
            .withColumnRenamed("u", "node")
        )
        new_labels = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neigh_component"), F.col("component")),
                ).alias("component"),
            )
        ).localCheckpoint(eager=True)  # truncate lineage each round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_entities(match_edges: DataFrame, mentions: DataFrame) -> DataFrame:
    """match_edges(src, dst) + mentions(norm, ...) →
    entity table (norm, canonical_id). Unmatched mentions become their
    own singleton components."""
    comps = connected_components(match_edges)
    all_norms = mentions.select("norm").distinct()
    return (
        all_norms.join(comps.withColumnRenamed("node", "norm"), "norm", "left")
        .select(
            "norm",
            F.coalesce(F.col("component"), F.col("norm")).alias("canonical_id"),
        )
    )


def canonicalize_triples(
    triples: DataFrame, entity_table: DataFrame
) -> DataFrame:
    """Rewrite triples' subj/obj to canonical ids via two broadcast-able
    equi-joins on the normalized mention string.

    The entity table (distinct mentions) is orders of magnitude smaller
    than the triples table, so Spark broadcasts it under
    autoBroadcastJoinThreshold; at extreme sizes AQE falls back to a
    shuffled hash join on the same plan.
    """
    from .linking import normalize_mentions

    t = normalize_mentions(triples, "subj_text").withColumnRenamed("norm", "subj_norm")
    t = normalize_mentions(t, "obj_text").withColumnRenamed("norm", "obj_norm")
    subj = entity_table.select(
        F.col("norm").alias("subj_norm"), F.col("canonical_id").alias("subj_id")
    )
    obj = entity_table.select(
        F.col("norm").alias("obj_norm"), F.col("canonical_id").alias("obj_id")
    )
    return (
        t.join(F.broadcast(subj), "subj_norm", "left")
        .join(F.broadcast(obj), "obj_norm", "left")
        .withColumn("subj_id", F.coalesce(F.col("subj_id"), F.col("subj_norm")))
        .withColumn("obj_id", F.coalesce(F.col("obj_id"), F.col("obj_norm")))
    )
