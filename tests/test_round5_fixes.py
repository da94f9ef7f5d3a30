"""Round-5 review regressions: the pre-fanned plan probe's guard rails
(spine-only, width-checked) in operators/extract._ensure_parallelism."""

from pyspark.sql import functions as F

from gliner_spark.operators.extract import _ensure_parallelism


class TestPlanProbeGuardRails:
    def test_shuffle_repartition_on_spine_stands_down(self, spark):
        par = spark.sparkContext.defaultParallelism
        df = spark.range(100).repartition(par).selectExpr("id", "id * 2 AS y")
        out = _ensure_parallelism(df, None)
        assert out is df  # no second exchange

    def test_dimension_side_repartition_does_not_count(self, spark):
        """A repartition on the broadcast/dimension side of a join says
        nothing about THIS input's parallelism — the probe must stop at
        the Join and still fan out the 1-partition fact side."""
        par = spark.sparkContext.defaultParallelism
        fact = spark.range(100).coalesce(1).withColumn("k", F.col("id") % 5)
        dim = (
            spark.range(5)
            .repartition(4)
            .select(F.col("id").alias("k"), F.lit("x").alias("meta"))
        )
        joined = fact.join(F.broadcast(dim), "k")
        out = _ensure_parallelism(joined, None)
        assert out is not joined
        assert out.rdd.getNumPartitions() == par

    def test_narrow_shuffle_repartition_still_fans_out(self, spark):
        """df.repartition(1) IS a shuffle repartition but an explicit
        shrink — the width check must not mistake it for a fan-out."""
        par = spark.sparkContext.defaultParallelism
        df = spark.range(100).repartition(1)
        out = _ensure_parallelism(df, None)
        assert out.rdd.getNumPartitions() == par

    def test_keyed_repartition_stands_down(self, spark):
        """A caller's salted/keyed repartition (RepartitionByExpression)
        at full width is the canonical 'already handled' case."""
        par = spark.sparkContext.defaultParallelism
        df = spark.range(100).repartition(par, "id")
        out = _ensure_parallelism(df, None)
        assert out is df

    def test_coalesce_still_fans_out(self, spark):
        """Regression pin for the first round-5 probe bug: coalesce
        prints Repartition(shuffle=false) and must NOT stand down."""
        par = spark.sparkContext.defaultParallelism
        df = spark.range(100).coalesce(1)
        out = _ensure_parallelism(df, None)
        assert out.rdd.getNumPartitions() == par
