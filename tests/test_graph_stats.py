"""Graph analytics over the triple table: degrees + integer PageRank.

PageRank semantics checked against an independent pure-Python
fixed-point implementation (same integer recurrence), plus structural
invariants: rank conservation bounds, dangling nodes at base rank,
hub-dominance ordering, determinism across partitionings.
"""

import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.graph_stats import degree_stats, pagerank

SCALE = 1_000_000
DAMP = 85
BASE = (100 - DAMP) * SCALE // 100


def py_pagerank(edges, iterations=3, damping=DAMP, scale=SCALE):
    """Reference recurrence, dict-based."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    r = {n: scale for n in nodes}
    base = (100 - damping) * scale // 100
    for _ in range(iterations):
        c = {n: 0 for n in nodes}
        for s, d in e:
            c[d] += r[s] // out[s]
        r = {n: base + damping * c[n] // 100 for n in nodes}
    return r


TOY = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]


class TestPagerank:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(TOY, ["src", "dst"])
        got = {r["entity"]: r["rank_fp"] for r in pagerank(df).collect()}
        assert got == py_pagerank(TOY)

    def test_duplicate_edges_collapse(self, spark):
        """PR is defined on the graph: repeating an edge changes nothing."""
        df = spark.createDataFrame(TOY + TOY[:3], ["src", "dst"])
        got = {r["entity"]: r["rank_fp"] for r in pagerank(df).collect()}
        assert got == py_pagerank(TOY)

    def test_dangling_sink_keeps_mass_out(self, spark):
        """'d' has no in-edges: rank is exactly the base term."""
        df = spark.createDataFrame(TOY, ["src", "dst"])
        got = {r["entity"]: r["rank_fp"] for r in pagerank(df).collect()}
        assert got["d"] == BASE

    def test_hub_ranks_highest(self, spark):
        """A star graph: everyone points at the hub."""
        star = [(f"leaf{i}", "hub") for i in range(10)]
        df = spark.createDataFrame(star, ["src", "dst"])
        got = {r["entity"]: r["rank_fp"] for r in pagerank(df).collect()}
        assert got["hub"] == max(got.values())
        assert all(got[f"leaf{i}"] == BASE for i in range(10))

    def test_partitioning_invariance(self, spark):
        """Integer fixed-point: identical ranks at any parallelism."""
        df = spark.createDataFrame(TOY, ["src", "dst"])
        a = sorted(map(tuple, pagerank(df.repartition(1)).collect()))
        b = sorted(map(tuple, pagerank(df.repartition(7)).collect()))
        assert a == b

    def test_iterations_zero_is_uniform(self, spark):
        df = spark.createDataFrame(TOY, ["src", "dst"])
        got = {r["entity"]: r["rank_fp"] for r in pagerank(df, iterations=0).collect()}
        assert set(got.values()) == {SCALE}

    def test_bad_damping_raises(self, spark):
        df = spark.createDataFrame(TOY, ["src", "dst"])
        with pytest.raises(ValueError):
            pagerank(df, damping_pct=101)


class TestDegreeStats:
    def test_counts_multiplicity(self, spark):
        tr = spark.createDataFrame(
            [("a", "r1", "b"), ("a", "r2", "b"), ("b", "r1", "c")],
            ["subj_text", "pred", "obj_text"],
        )
        got = {r["entity"]: r for r in degree_stats(tr).collect()}
        assert got["a"]["out_deg"] == 2 and got["a"]["in_deg"] == 0
        assert got["b"]["out_deg"] == 1 and got["b"]["in_deg"] == 2
        assert got["c"]["degree"] == 1
        # full-outer: source-only and sink-only entities both present
        assert set(got) == {"a", "b", "c"}

    def test_degree_is_sum(self, spark):
        tr = spark.createDataFrame(
            [("a", "r", "b"), ("b", "r", "a")], ["subj_text", "pred", "obj_text"]
        )
        for r in degree_stats(tr).collect():
            assert r["degree"] == r["out_deg"] + r["in_deg"]


class TestPagerankRandomized:
    def test_random_digraph_matches_python(self, spark):
        """60-node seeded random digraph, ranks must be bit-identical to
        the pure-Python fixed-point recurrence."""
        import random

        rng = random.Random(20240817)
        nodes = [f"n{i}" for i in range(60)]
        edges = list({
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
        })
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["entity"]: r["rank_fp"] for r in pagerank(df, iterations=4).collect()}
        want = py_pagerank(edges, iterations=4)
        assert got == want


class TestEntityCooccurrence:
    def test_hand_computed_counts(self, spark):
        from gliner_spark.operators.graph_stats import entity_cooccurrence

        # d1: {a,b}; d2: {a,b,c}; d3: {a}; d4: {c}
        rows = [
            (1, "a"), (1, "b"), (1, "b"),  # duplicate mention collapses
            (2, "a"), (2, "b"), (2, "c"),
            (3, "a"), (4, "c"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, entity string")
        got = {
            (r.entity_a, r.entity_b): (r.n_a, r.n_b, r.n_ab, r.n_docs)
            for r in entity_cooccurrence(df).collect()
        }
        assert got == {
            ("a", "b"): (3, 2, 2, 4),
            ("a", "c"): (3, 2, 1, 4),
            ("b", "c"): (2, 2, 1, 4),
        }

    def test_min_pairs_filter_and_ordering(self, spark):
        from gliner_spark.operators.graph_stats import entity_cooccurrence

        rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "z")]
        df = spark.createDataFrame(rows, "doc_id long, entity string")
        got = entity_cooccurrence(df, min_pairs=2).collect()
        assert [(r.entity_a, r.entity_b, r.n_ab) for r in got] == [
            ("x", "y", 2)
        ]
        # pairs are canonical: entity_a < entity_b always
        all_pairs = entity_cooccurrence(df).collect()
        assert all(r.entity_a < r.entity_b for r in all_pairs)
