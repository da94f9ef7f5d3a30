"""Checkpointed resumability: kill/resume loses no partitions and
duplicates no rows (north-rule requirement)."""

import pytest

from pyspark.sql import functions as F

from gliner_spark.operators.extract import extract_entities
from gliner_spark.plans.manifest import RunManifest
from gliner_spark.sources.pages import pages_df

LABELS = ["person", "organization"]


@pytest.fixture()
def pages(spark):
    return pages_df(spark, 60).cache()


def transform(df):
    return extract_entities(df, LABELS)


class TestManifestResume:
    def test_full_run_then_noop_rerun(self, spark, pages, tmp_path):
        out = str(tmp_path / "triples")
        man = str(tmp_path / "manifest")
        m = RunManifest(spark, man, run_id="r1")
        res1 = m.run(pages, transform, out, n_chunks=3)
        assert [r.skipped for r in res1] == [False, False, False]

        direct = transform(pages).count()
        written = spark.read.parquet(out).count()
        assert written == direct

        res2 = RunManifest(spark, man, run_id="r2").run(
            pages, transform, out, n_chunks=3
        )
        assert all(r.skipped for r in res2)
        assert spark.read.parquet(out).count() == direct  # no dupes

    def test_crash_mid_run_resumes_without_loss_or_dupes(
        self, spark, pages, tmp_path
    ):
        out = str(tmp_path / "triples")
        man = str(tmp_path / "manifest")
        calls = {"n": 0}

        def flaky(df):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated executor loss")
            return transform(df)

        with pytest.raises(RuntimeError):
            RunManifest(spark, man, "r1").run(pages, flaky, out, n_chunks=3)

        # chunk 0 committed, chunks 1-2 missing
        done = RunManifest(spark, man, "r1").completed_chunks()
        assert done == {0}

        res = RunManifest(spark, man, "r1b").run(pages, transform, out, n_chunks=3)
        assert [r.skipped for r in res] == [True, False, False]
        assert spark.read.parquet(out).count() == transform(pages).count()
        # lineage rows carry per-chunk metrics
        mf = spark.read.parquet(man)
        assert mf.where(F.col("status") == "ok").count() == 3
        assert mf.where(F.col("wall_ms") <= 0).count() == 0
