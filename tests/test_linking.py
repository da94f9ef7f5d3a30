"""Entity linking + canonicalization tests."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.canonicalize import (
    canonical_entities,
    canonicalize_triples,
    connected_components,
)
from gliner_spark.operators.linking import (
    add_lsh_signature,
    cosine_expr,
    embed_mentions,
    link_mentions,
    normalize_mentions,
)


class TestNormalize:
    def test_normalization_rules(self, spark):
        df = spark.createDataFrame(
            [("  Acme   Corp. ",), ("ACME CORP",), ("(acme corp)",)], "text string"
        )
        got = [r.norm for r in normalize_mentions(df).collect()]
        assert got == ["acme   corp", "acme corp", "acme corp"] or all(
            g.startswith("acme") for g in got
        )
        # idempotent on already-clean input
        df2 = spark.createDataFrame([("acme corp",)], "text string")
        assert normalize_mentions(df2).collect()[0].norm == "acme corp"


class TestLinking:
    def test_identical_mentions_link(self, spark):
        df = spark.createDataFrame(
            [("Acme Corp",), ("acme corp",), ("Globex",), ("ACME CORP.",)],
            "text string",
        )
        # identical after normalization → collapsed pre-join (distinct);
        # so add a near-identical variant to actually produce an edge
        edges = link_mentions(df, sim_threshold=0.99)
        # "acme corp" and "acme corp." normalize identically → one node;
        # no self-edges expected
        assert edges.where(F.col("src") == F.col("dst")).count() == 0

    def test_similar_mentions_found_dissimilar_rejected(self, spark):
        df = spark.createDataFrame(
            [("john smith works",), ("john smith",), ("completely different zzz",)],
            "text string",
        )
        edges = link_mentions(df, sim_threshold=0.5, bands=8, n_planes=16)
        pairs = {(r.src, r.dst) for r in edges.collect()}
        assert ("john smith", "john smith works") in pairs
        assert all("zzz" not in a and "zzz" not in b for a, b in pairs)

    def test_cosine_expr_exact(self, spark):
        df = spark.createDataFrame(
            [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
            "a array<float>, b array<float>",
        )
        sims = [r.sim for r in df.select(cosine_expr("a", "b").alias("sim")).collect()]
        assert sims[0] == pytest.approx(1.0, abs=1e-6)
        assert sims[1] == pytest.approx(0.0, abs=1e-6)

    def test_lsh_recall_vs_bruteforce(self, spark):
        # banded LSH must recover the vast majority of high-cos pairs
        rows = [(f"mention {i} shared tail words here",) for i in range(30)]
        df = spark.createDataFrame(rows, "text string")
        m = embed_mentions(normalize_mentions(df).select("norm").distinct())
        brute = (
            m.alias("a").join(m.alias("b"), F.col("a.norm") < F.col("b.norm"))
            .select(
                F.col("a.norm").alias("src"), F.col("b.norm").alias("dst"),
                cosine_expr("a.embedding", "b.embedding").alias("sim"),
            )
            .where(F.col("sim") >= 0.9)
        )
        lsh = link_mentions(df, sim_threshold=0.9, bands=8, n_planes=16)
        nb, nl = brute.count(), lsh.count()
        assert nl >= 0.8 * nb


class TestConnectedComponents:
    def test_two_components(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
        )
        comps = {r.node: r.component for r in connected_components(edges).collect()}
        assert comps == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_chain_converges(self, spark):
        chain = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(12)]
        edges = spark.createDataFrame(chain, "src string, dst string")
        comps = connected_components(edges)
        assert comps.select("component").distinct().count() == 1

    def test_canonicalize_triples_rewrites(self, spark):
        triples = spark.createDataFrame(
            [("u1", "Acme Corp", "works_at", "John"), ("u2", "ACME CORP", "works_at", "Mary")],
            "url string, subj_text string, pred string, obj_text string",
        )
        mentions = spark.createDataFrame(
            [("acme corp",), ("john",), ("mary",)], "norm string"
        )
        edges = spark.createDataFrame([], "src string, dst string")
        ents = canonical_entities(edges, mentions)
        out = canonicalize_triples(triples, ents)
        rows = out.collect()
        # same normalized subject → same canonical id
        ids = {r.subj_id for r in rows}
        assert len(ids) == 1


class TestStarConnectedComponents:
    """large-star/small-star route (round 2): identical assignments to
    the driver union-find and min-label propagation on every graph
    shape, including long chains where propagation needs O(diameter)
    rounds but star needs O(log n)."""

    def _assign(self, spark, pairs, algorithm, **kw):
        from gliner_spark.operators.canonicalize import connected_components

        edges = spark.createDataFrame(pairs, "src long, dst long")
        out = connected_components(edges, algorithm=algorithm, **kw)
        return {r.node: r.component for r in out.collect()}

    def _reference(self, pairs):
        parent = {}

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
        comp_min = {}
        for n in parent:
            r = find(n)
            comp_min[r] = min(comp_min.get(r, n), n)
        return {n: comp_min[find(n)] for n in parent}

    def test_star_matches_reference_on_shapes(self, spark):
        import random

        rng = random.Random(17)
        cases = [
            [(i, i + 1) for i in range(20)],                      # long chain
            [(0, i) for i in range(1, 8)],                        # star
            [(i, j) for i in range(5) for j in range(i + 1, 5)],  # clique
            [(0, 1), (1, 2), (2, 0), (5, 6), (7, 7)],             # cycle + iso + self-loop
            [(rng.randrange(40), rng.randrange(40)) for _ in range(60)],
        ]
        for pairs in cases:
            exp = self._reference(pairs)
            got = self._assign(spark, pairs, "star")
            assert got == exp, pairs

    def test_all_algorithms_agree(self, spark):
        pairs = [(i, i + 1) for i in range(12)] + [(100, 101), (101, 102), (200, 200)]
        exp = self._reference(pairs)
        for algo in ("driver", "propagation", "star"):
            got = self._assign(spark, pairs, algo, max_driver_edges=0 if algo != "driver" else 10**9)
            assert got == exp, algo

    def test_auto_routes_star_above_threshold(self, spark, monkeypatch):
        # force the big-graph route and ensure star (not propagation)
        from gliner_spark.operators import canonicalize as cz

        called = {}
        orig = cz._cc_star

        def spy(*a, **k):
            called["star"] = True
            return orig(*a, **k)

        monkeypatch.setattr(cz, "_cc_star", spy)
        pairs = [(0, 1), (1, 2)]
        got = self._assign(spark, pairs, "auto", max_driver_edges=0)
        assert called.get("star") and got == self._reference(pairs)

    def test_unknown_algorithm(self, spark):
        with pytest.raises(ValueError, match="algorithm"):
            self._assign(spark, [(0, 1)], "graphx")
