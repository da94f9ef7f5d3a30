"""Streaming session windows: watermark finalization + batch parity."""

import datetime as dt
import random

from gliner_spark.operators.sessions import sessionize
from gliner_spark.streaming.sessions import streaming_sessionize

SCHEMA = "event_id long, ts timestamp_ntz, user_id long"
T0 = dt.datetime(2024, 1, 1)
GAP_S = 3600


def make_events(seed=7, users=5, per_user=40):
    """Seeded event history INCLUDING exact-gap and gap+1s deltas: the
    +1 ms internal window (streaming/sessions.py, ADVICE r4) makes the
    boundary semantics identical to batch — delta == gap stays
    in-session in both, delta == gap+1s splits in both — so the
    equivalence sweep now deliberately hits the boundary it once had
    to avoid."""
    rng = random.Random(seed)
    rows, eid = [], 0
    for u in range(users):
        t = 0
        for _ in range(per_user):
            t += rng.choice([10, 100, 1000, 5000, GAP_S, GAP_S + 1])
            rows.append((eid, T0 + dt.timedelta(seconds=t), u))
            eid += 1
    return rows


def drain(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sessions = streaming_sessionize(
        stream, gap_seconds=GAP_S, watermark="1 hour"
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out)


KEY = ["user_id", "session_start_ms", "session_end_ms", "n_events", "duration_ms"]


class TestStreamingSessionize:
    def test_matches_batch_after_watermark_flush(self, spark, tmp_path):
        src = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        rows = make_events()
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)

        got1 = drain(spark, src, out, ckpt)
        n1 = got1.count()

        # sentinel events far in the future advance the watermark past
        # every real session's close; their own sessions stay open and
        # are never emitted
        max_ts = max(r[1] for r in rows)
        sentinels = [
            (10_000 + u, max_ts + dt.timedelta(days=30), u) for u in range(5)
        ]
        spark.createDataFrame(sentinels, SCHEMA).write.mode("append").parquet(src)
        got2 = drain(spark, src, out, ckpt)

        streamed = {tuple(r) for r in got2.select(*KEY).collect()}
        batch_df = sessionize(
            spark.createDataFrame(rows, SCHEMA), gap_seconds=GAP_S
        )
        batch = {tuple(r) for r in batch_df.select(*KEY).collect()}
        assert streamed == batch
        assert len(streamed) > 5  # multiple sessions per user actually split
        # the first drain already finalized everything the watermark allowed
        assert n1 < len(streamed)

    def test_open_sessions_held_back_by_watermark(self, spark, tmp_path):
        """Events newer than (max ts - watermark) belong to sessions the
        engine must NOT emit yet."""
        src = str(tmp_path / "in2")
        out = str(tmp_path / "out2")
        ckpt = str(tmp_path / "ckpt2")
        rows = [
            (1, T0, 1),
            (2, T0 + dt.timedelta(seconds=10), 1),
            # second session, 3h later — within 1h watermark of max ts
            (3, T0 + dt.timedelta(hours=3), 1),
        ]
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
        got = drain(spark, src, out, ckpt)
        recs = got.collect()
        assert len(recs) == 1  # only the first, watermark-closed session
        assert recs[0]["n_events"] == 2


class TestDstGapPreservation:
    def test_spring_forward_does_not_split_sessions(self, spark, tmp_path):
        """Under a DST session timezone, NTZ events 30 minutes apart
        across the spring-forward hour must stay in ONE session with a
        45-minute gap — a cast-to-LTZ event time would map them ~90
        minutes apart (the skipped hour) and split them, diverging
        from the batch operator's tz-free math."""
        src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
        rows = [
            (1, dt.datetime(2024, 3, 10, 1, 50), 1),  # before 2am EST
            (2, dt.datetime(2024, 3, 10, 2, 20), 1),  # inside skipped hour
            # sentinel far ahead so the watermark finalizes the session
            (3, dt.datetime(2024, 3, 12, 0, 0), 99),
        ]
        prev = spark.conf.get("spark.sql.session.timeZone")
        # write the NTZ parquet under UTC: createDataFrame under a DST
        # tz would already shift the nonexistent 02:20 wall time to
        # 03:20 during python→NTZ conversion, masking what this test
        # isolates (the operator's event-time construction)
        spark.createDataFrame(rows, SCHEMA).write.parquet(src)
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            stream = spark.readStream.schema(SCHEMA).parquet(src)
            q = (
                streaming_sessionize(
                    stream, gap_seconds=45 * 60, watermark="1 hour"
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            got = spark.read.parquet(out).where("user_id = 1").collect()
            assert len(got) == 1 and got[0].n_events == 2
            assert got[0].duration_ms == 30 * 60 * 1000
            # batch operator agrees (read the same parquet — a fresh
            # createDataFrame under NY tz would re-mangle the input)
            batch = sessionize(
                spark.read.parquet(src), gap_seconds=45 * 60
            ).where("user_id = 1").collect()
            assert len(batch) == 1 and batch[0].n_events == 2
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
