"""Skew plan: salted repartition must actually break hot-key skew."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.plans.skew import length_bucketed, salted_repartition
from gliner_spark.sources.pages import pages_df


class TestSaltedRepartition:
    def test_hot_domain_spread_over_partitions(self, spark):
        """The fixture corpus is domain/lang-skewed (>50% of rows in 2
        domains). Repartitioning on lang alone would put all 'en' rows
        in one partition; the salt must spread them."""
        pages = pages_df(spark, 400)
        n_part = 8
        salted = salted_repartition(pages, num_partitions=n_part)
        sizes = (
            salted.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect()
        )
        counts = [r["count"] for r in sizes]
        total = sum(counts)
        # no partition owns more than ~2.5x the fair share
        assert max(counts) <= 2.5 * total / n_part, counts
        # and the hot language is not confined to one partition
        en_parts = (
            salted.where(F.col("lang") == "en")
            .withColumn("pid", F.spark_partition_id())
            .select("pid").distinct().count()
        )
        assert en_parts >= n_part // 2

    def test_deterministic_placement(self, spark):
        pages = pages_df(spark, 100)
        a = (
            salted_repartition(pages, num_partitions=4)
            .withColumn("pid", F.spark_partition_id())
            .select("url", "pid").collect()
        )
        b = (
            salted_repartition(pages, num_partitions=4)
            .withColumn("pid", F.spark_partition_id())
            .select("url", "pid").collect()
        )
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_length_bucketing_orders_within_partition(self, spark):
        pages = pages_df(spark, 200)
        shaped = length_bucketed(salted_repartition(pages, num_partitions=4))
        rows = (
            shaped.withColumn("pid", F.spark_partition_id())
            .withColumn("len", F.length("text"))
            .select("pid", "len")
            .collect()
        )
        by_pid = {}
        for r in rows:
            by_pid.setdefault(r.pid, []).append(r.len)
        for pid, lens in by_pid.items():
            assert lens == sorted(lens), pid


class TestSkewProfile:
    def test_counts_and_salt_factors(self, spark):
        from gliner_spark.plans.skew import skew_profile

        df = spark.createDataFrame(
            [("hot", "en")] * 90 + [("cold", "de")] * 10, ["source", "lang"]
        )
        prof = {
            (r["source"], r["lang"]): r
            for r in skew_profile(df, target_rows=25).collect()
        }
        hot = prof[("hot", "en")]
        cold = prof[("cold", "de")]
        assert (hot["n_rows"], hot["share_ppm"], hot["salt_buckets"]) == (
            90, 900_000, 4,  # ceil(90/25)
        )
        assert (cold["n_rows"], cold["share_ppm"], cold["salt_buckets"]) == (
            10, 100_000, 1,
        )

    def test_adaptive_salting_splits_only_hot_keys(self, spark):
        """Hot key spreads over >1 partition; a cold key (salt=1) stays
        in exactly one partition — preserving downstream locality."""
        from gliner_spark.plans.skew import adaptive_salted_repartition

        rows = [(f"u{i}", "hot", "en") for i in range(400)] + [
            (f"v{i}", "cold", "de") for i in range(10)
        ]
        df = spark.createDataFrame(rows, ["url", "source", "lang"])
        out = adaptive_salted_repartition(
            df, keys=("source", "lang"), id_col="url", target_rows=50,
            num_partitions=8,
        ).withColumn("pid", F.spark_partition_id())
        hot_parts = (
            out.where(F.col("source") == "hot").select("pid").distinct().count()
        )
        cold_parts = (
            out.where(F.col("source") == "cold").select("pid").distinct().count()
        )
        assert hot_parts >= 3  # 8 salt buckets over 8 partitions
        assert cold_parts == 1
        # no rows lost or duplicated, salt column dropped
        assert out.count() == 410
        assert "__salt" not in df.columns and "salt_buckets" not in out.columns

    def test_bad_target_raises(self, spark):
        from gliner_spark.plans.skew import skew_profile

        df = spark.createDataFrame([("a", "en")], ["source", "lang"])
        import pytest as _pytest

        with _pytest.raises(ValueError):
            skew_profile(df, target_rows=0)


def test_adaptive_salting_keeps_null_keyed_rows(spark):
    """NULL keys (e.g. lang before language-ID) must survive the
    profile join — skew_profile counts the NULL group, and the join is
    null-safe (a plain equi-join silently dropped these rows)."""
    from gliner_spark.plans.skew import adaptive_salted_repartition

    df = spark.createDataFrame(
        [("u1", "web", None), ("u2", "web", "en"), ("u3", None, None)],
        "url string, source string, lang string",
    )
    out = adaptive_salted_repartition(df, keys=("source", "lang"), id_col="url")
    assert sorted(r.url for r in out.collect()) == ["u1", "u2", "u3"]
    from pyspark.sql import functions as F
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # null-safe join stays broadcast-hash
