"""Bucketed tables eliminate the join shuffle (scale evidence)."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.plans.bucketing import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    a = spark.range(0, 2000).select(
        F.col("id").alias("url_id"), (F.col("id") % 7).alias("payload_a")
    )
    b = spark.range(0, 2000).select(
        F.col("id").alias("url_id"), (F.col("id") % 11).alias("payload_b")
    )
    write_bucketed(a, "bktest.left_t", "url_id", buckets=8)
    write_bucketed(b, "bktest.right_t", "url_id", buckets=8)
    yield "bktest.left_t", "bktest.right_t"
    spark.sql("DROP TABLE IF EXISTS bktest.left_t")
    spark.sql("DROP TABLE IF EXISTS bktest.right_t")
    spark.sql("DROP DATABASE IF EXISTS bktest")


class TestBucketedJoin:
    def test_no_exchange_in_join_plan(self, spark, bucketed_tables):
        lt, rt = bucketed_tables
        # disable auto-broadcast so a non-bucketed join WOULD shuffle
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, lt, rt, "url_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 2000
            # control: the same join on raw (non-bucketed) frames shuffles
            raw = spark.table(lt).localCheckpoint().join(
                spark.table(rt).localCheckpoint(), "url_id"
            )
            raw_plan = raw._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in raw_plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
