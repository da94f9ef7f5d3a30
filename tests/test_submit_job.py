"""spark-submit --py-files integration: the packaged zip must be a
self-sufficient deployment artifact (north rule: runs via spark-submit
on multi-executor clusters; resume is exercised through a second
submit)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)
class TestSubmit:
    def test_pyfiles_job_runs_and_resumes(self, spark, tmp_path):
        sys.path.insert(0, REPO)
        from gliner_spark.sources.pages import pages_df
        from scripts.package_pyfiles import build

        zip_path = build(str(tmp_path / "dist"))
        pages_path = str(tmp_path / "pages.parquet")
        pages_df(spark, 40).write.mode("overwrite").parquet(pages_path)
        gaz = {"acme corporation": "organization", "john smith": "person"}
        gaz_path = str(tmp_path / "gaz.json")
        json.dump(gaz, open(gaz_path, "w"))
        pat_path = str(tmp_path / "patterns.json")
        json.dump([["person", "works_at", "organization"]], open(pat_path, "w"))

        out = str(tmp_path / "triples")
        man = str(tmp_path / "manifest")

        def submit(
            run_id, master="local[2]", out_dir=None, man_dir=None, flags=(),
            pages=None,
        ):
            cmd = [
                SPARK_SUBMIT,
                "--master", master,
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "run_kg_job.py"),
                "--pages", pages or pages_path,
                "--out", out_dir or out,
                "--manifest", man_dir or man,
                "--labels", "person,organization",
                "--relations", "works_at",
                "--gazetteer", gaz_path,
                "--patterns", pat_path,
                "--run-id", run_id,
                "--chunks", "2",
                "--salt", "4",
                *flags,
            ]
            # cwd OUTSIDE the repo: the zip must supply gliner_spark
            proc = subprocess.run(
                cmd, capture_output=True, text=True, cwd=str(tmp_path), timeout=240
            )
            assert proc.returncode == 0, proc.stderr[-3000:]
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            return json.loads(line)

        first = submit("r1")
        assert first["chunks_run"] == 2 and first["chunks_skipped"] == 0

        resumed = submit("r2")
        assert resumed["chunks_run"] == 0 and resumed["chunks_skipped"] == 2
        assert resumed["new_rows"] == 0

        got = spark.read.parquet(out)
        assert {"url", "subj_text", "pred", "obj_text", "score"} <= set(got.columns)

        # north-rule shape: the SAME submit at a 4x-larger cluster size
        # (local[8]) produces byte-identical triples — parallelism never
        # changes results (the cross-process determinism contract).
        # This leg also materializes the predicate-partitioned graph
        # table (+ per-predicate lineage), the rule's output contract.
        out8 = str(tmp_path / "triples8")
        man8 = str(tmp_path / "manifest8")
        big = submit(
            "r8", master="local[8]", out_dir=out8, man_dir=man8,
            flags=("--partition-by-pred", "--analytics", "--export-ntriples"),
        )
        assert big["chunks_run"] == 2 and big.get("preds", 0) >= 1
        assert big.get("analytics_entities", 0) >= 1
        assert big.get("ntriples_lines", 0) >= 1
        nt = [r.value for r in spark.read.text(out8 + "_nt").collect()]
        assert all(l.endswith(" .") and l.startswith("<") for l in nt)
        big_df = spark.read.parquet(out8)
        cols = sorted(set(got.columns) & set(big_df.columns))
        rows_small = sorted(map(tuple, got.select(*cols).collect()))
        rows_big = sorted(map(tuple, big_df.select(*cols).collect()))
        assert rows_small == rows_big
        # pred partition directories + lineage audit rows exist
        assert any(
            d.startswith("pred=")
            for d in os.listdir(os.path.join(out8, "chunk=0"))
        )
        lin = spark.read.parquet(out8 + "_lineage")
        assert {r.pred for r in lin.collect()} == {
            r.pred for r in big_df.select("pred").distinct().collect()
        }

        # --analytics derived tables: degrees + integer PageRank over
        # the committed triples, recomputable and parallelism-invariant
        deg = spark.read.parquet(out8 + "_degrees")
        ents = {r.subj_text for r in big_df.select("subj_text").collect()} | {
            r.obj_text for r in big_df.select("obj_text").collect()
        }
        assert {r.entity for r in deg.collect()} == ents
        pr = spark.read.parquet(out8 + "_pagerank")
        assert {r.entity for r in pr.collect()} == ents
        from gliner_spark.operators.graph_stats import pagerank as pr_op
        from pyspark.sql import functions as F

        local = pr_op(
            big_df.select(
                F.col("subj_text").alias("src"), F.col("obj_text").alias("dst")
            )
        )
        assert sorted(map(tuple, pr.collect())) == sorted(
            map(tuple, local.collect())
        )

        # incremental refresh (--prev-pages): mutate only chunk-0 urls —
        # one changed (gains a guaranteed works_at triple), one gone —
        # and assert the refresh runs exactly that one chunk. Last leg:
        # it rewrites `out` in another process, so it must come after
        # every read of the original `out` content above.
        pg = spark.read.parquet(pages_path).withColumn(
            "c", F.pmod(F.hash("url"), F.lit(2))
        )
        changed_url, gone_url = [
            r.url for r in pg.where("c = 0").select("url").limit(2).collect()
        ]
        pages2 = (
            pg.drop("c")
            .where(F.col("url") != gone_url)
            .withColumn(
                "text",
                F.when(
                    F.col("url") == changed_url,
                    F.concat(
                        F.col("text"),
                        F.lit(" john smith works at acme corporation"),
                    ),
                ).otherwise(F.col("text")),
            )
        )
        pages2_path = str(tmp_path / "pages2.parquet")
        pages2.write.mode("overwrite").parquet(pages2_path)
        inc = submit("rinc", pages=pages2_path, flags=("--prev-pages", pages_path))
        assert inc["chunks_run"] == 1 and inc["chunks_skipped"] == 0
        # the refresh replaced files another session listed: re-list
        spark.catalog.refreshByPath(out)
        after = spark.read.parquet(out)
        assert after.where(F.col("url") == gone_url).count() == 0
        assert (
            after.where(
                (F.col("url") == changed_url) & (F.col("pred") == "works_at")
            ).count()
            >= 1
        )

        # raw-crawl input (--warc): the same packaged job over a
        # directory of WARC archives instead of a parquet table
        from gliner_spark.sources.warc import build_warc

        warc_dir = tmp_path / "crawl"
        warc_dir.mkdir()
        (warc_dir / "a.warc.gz").write_bytes(
            build_warc(
                [
                    {
                        "url": "https://w.example/1",
                        "warc_ts": None,
                        "html": b"<html><body><p>john smith works at "
                        b"acme corporation</p></body></html>",
                    }
                ],
                gzip_records=True,
            )
        )
        wres = submit(
            "rw", pages=str(warc_dir),
            out_dir=str(tmp_path / "wout"), man_dir=str(tmp_path / "wman"),
            flags=("--warc",),
        )
        assert wres["chunks_run"] == 2
        wtri = spark.read.parquet(str(tmp_path / "wout"))
        assert (
            wtri.where(
                (F.col("url") == "https://w.example/1")
                & (F.col("pred") == "works_at")
            ).count()
            >= 1
        )


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)
def test_corpus_prep_job(spark, tmp_path):
    """spark-submit the corpus-prep entrypoint: keep-list verdicts +
    chunked + packed training examples, zipped deps only."""
    sys.path.insert(0, REPO)
    from gliner_spark.sources.pages import pages_df
    from scripts.package_pyfiles import build
    from pyspark.sql import functions as F

    zip_path = build(str(tmp_path / "dist"))
    docs_path = str(tmp_path / "docs.parquet")
    # documents shape: numeric doc_id + text (repeat some texts so the
    # exact-dup reason fires; long docs so chunking fires)
    docs = pages_df(spark, 60).select(
        F.monotonically_increasing_id().alias("doc_id"),
        # plant an email so --redact-pii has work; give every doc a
        # url so --robots can drop path-prefix matches
        F.concat(F.col("text"), F.lit(" mail zoe@pii.example ok")).alias("text"),
    ).cache()
    docs = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 2).cast("string"),
            F.lit(".example/p"), F.col("doc_id").cast("string"),
        ),
    )
    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 1000)
    docs.unionByName(dup).write.mode("overwrite").parquet(docs_path)
    robots_path = str(tmp_path / "robots.json")
    json.dump(
        {"h0.example": "User-agent: *\nDisallow: /p1\n"},
        open(robots_path, "w"),
    )
    out = str(tmp_path / "prep")
    cmd = [
        SPARK_SUBMIT, "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_corpus_prep.py"),
        "--docs", docs_path, "--out", out,
        "--budget", "64", "--window", "32",
        "--robots", robots_path, "--redact-pii",
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(tmp_path), timeout=240
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["docs_in"] == 63
    assert summary["robots_dropped"] >= 1  # h0.example /p1* pages
    assert summary["pii_redacted"]["emails"] >= 50  # planted in every doc
    assert 0 < summary["docs_kept"] < 63  # dups/quality dropped
    assert summary["dropped_by_reason"].get("exact_dup", 0) >= 3
    assert summary["examples"] >= 1 and summary["tokens"] > 0
    # redaction reached the examples table
    assert (
        spark.read.parquet(out + "/examples")
        .where(F.col("chunk_text").contains("zoe@pii.example"))
        .count()
        == 0
    )
    assert (
        spark.read.parquet(out + "/examples")
        .where(F.col("chunk_text").contains("<EMAIL>"))
        .count()
        > 0
    )
    ex = spark.read.parquet(out + "/examples")
    assert {"doc_id", "chunk_idx", "chunk_text", "n_tokens",
            "example_id", "offset_in_example"} <= set(ex.columns)
    # no example except the last can end below the budget boundary
    from collections import defaultdict
    rows = ex.collect()
    by_ex = defaultdict(int)
    for r in rows:
        by_ex[r.example_id] += r.n_tokens
    last = max(by_ex)
    for eid, tot in by_ex.items():
        if eid != last:
            start = min(
                r.cum_before for r in rows if r.example_id == eid
            )
            assert start + tot >= (eid + 1) * 64
