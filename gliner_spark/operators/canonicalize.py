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
    algorithm: str = "auto",
) -> DataFrame:
    """edges(src, dst) → assignments(node, component).

    ``component`` is the minimum node id reachable from ``node``.
    Deterministic; undirected interpretation of edges.

    Physical routes with identical results (``algorithm``):

    * ``auto`` — driver union-find for edge sets ≤ max_driver_edges,
      else large-star/small-star. Match edges are the *rare* near-dup
      pairs — a fraction of a percent of the corpus — so even a
      10^12-doc run usually fits the driver route; the collect is of
      edges, never of the corpus, and avoids paying per-round job
      overhead for a tiny graph.
    * ``star`` — alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond"): converges in
      O(log n) rounds on ANY graph shape, including the adversarial
      long chains where min-label propagation needs O(diameter)
      rounds. One groupBy + one join per half-round, lineage truncated
      per round. THE 100 TB default for big edge sets.
    * ``propagation`` — iterative min-label propagation: one shuffle
      per round, O(diameter) rounds. Fine for the near-clique clusters
      entity-match graphs actually produce; kept for comparison.
    * ``driver`` — force the union-find route.
    """
    if algorithm not in ("auto", "driver", "star", "propagation"):
        raise ValueError(f"unknown CC algorithm {algorithm!r}")
    spark = edges.sparkSession
    # Materialize the edge set once, fully parallel, then decide the
    # route from its size. (A limit()-guarded collect would trigger
    # CollectLimit's incremental partition execution and run the
    # expensive edge-generating child nearly serially.)
    edge_rows = edges.select(src, dst).persist()
    n_edges = edge_rows.count()
    if algorithm == "driver" or (algorithm == "auto" and n_edges <= max_driver_edges):
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
    if algorithm in ("auto", "star"):
        return _cc_star(edge_rows, src, dst, max_iter)
    # min-label propagation route: iterate over the cached edge rows
    # (released when the caller's plan is done)
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


def _cc_star(edge_rows: DataFrame, src: str, dst: str, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star connected components.

    Per round (Kiveris et al. 2014):
      large-star: every node links its LARGER neighbors to its minimum
                  neighborhood member (min(Γ(u) ∪ {u}));
      small-star: every node links its smaller-or-equal neighbors (and
                  itself) to that minimum.
    The edge set contracts toward a star forest rooted at each
    component's minimum id in O(log n) rounds. Each half-round is one
    groupBy (neighborhood min) + one join; lineage truncated per round
    with localCheckpoint.
    """
    node_type = edge_rows.schema[src].dataType.simpleString()
    all_nodes = (
        edge_rows.select(F.col(src).alias("node"))
        .unionByName(edge_rows.select(F.col(dst).alias("node")))
        .distinct()
    )
    # canonical undirected edges (u > v), self-loops dropped
    e = edge_rows.where(F.col(src) != F.col(dst))
    edges = (
        e.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        ).distinct()
    ).localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iter):
        # ---- large-star ----
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))  # larger neighbors only
            .select(F.col("v").alias("x"), F.col("m"))
            .where(F.col("x") != F.col("m"))
            .select(
                F.greatest("x", "m").alias("u"), F.least("x", "m").alias("v")
            )
            .distinct()
        )
        # ---- small-star (on u > v oriented edges) ----
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        pairs = large.join(mins2, "u")
        small = (
            pairs.select(F.col("v").alias("x"), "m")
            .unionByName(pairs.select(F.col("u").alias("x"), "m"))
            .where(F.col("x") != F.col("m"))
            .select(
                F.greatest("x", "m").alias("u"), F.least("x", "m").alias("v")
            )
            .distinct()
        )
        new_edges = small.localCheckpoint(eager=True)
        # converged when the canonical edge set is unchanged
        if (
            new_edges.count() == edges.count()
            and new_edges.exceptAll(edges).limit(1).count() == 0
        ):
            edges = new_edges
            converged = True
            break
        edges = new_edges

    if not converged:
        # The fixpoint guarantees the edge set is a star forest rooted
        # at each component's min; a pre-convergence edge set is NOT
        # (e.g. path 1-5-2 mid-contraction: node 2 has no smaller
        # neighbor yet and would silently self-root). Star contraction
        # halves component diameter per round, so max_iter=25 covers
        # any graph that fits on hardware — hitting this means a bug or
        # an absurdly low cap, and wrong components must not ship.
        raise RuntimeError(
            f"large-star/small-star did not converge within max_iter "
            f"rounds; raise max_iter (components would be wrong)"
        )

    # star forest: child u → root v (= component min); roots self-map.
    assign = edges.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
    return (
        all_nodes.join(assign, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node"))
            .cast(node_type)
            .alias("component"),
        )
    )


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
