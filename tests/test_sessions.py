"""Gap-based sessionization: boundary semantics + determinism."""

import datetime as dt

from gliner_spark.operators.sessions import sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ev(user, eid, seconds):
    return (eid, T0 + dt.timedelta(seconds=seconds), user)


def run(spark, rows, gap=100):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long")
    return sorted(
        map(tuple, sessionize(df, gap_seconds=gap).collect())
    )


class TestSessionize:
    def test_gap_splits_exactly_above_threshold(self, spark):
        """gap == threshold stays in-session; gap > threshold splits."""
        rows = [ev(1, 1, 0), ev(1, 2, 100), ev(1, 3, 201)]
        got = run(spark, rows, gap=100)
        # events 1+2 in session 1 (delta == gap, inclusive), 3 alone
        assert len(got) == 2
        (u1, s1, st1, en1, n1, d1), (u2, s2, st2, en2, n2, d2) = got
        assert (s1, n1, d1) == (1, 2, 100_000)
        assert (s2, n2, d2) == (2, 1, 0)

    def test_users_independent(self, spark):
        rows = [ev(1, 1, 0), ev(2, 2, 50), ev(1, 3, 1000)]
        got = run(spark, rows, gap=100)
        by_user = {}
        for u, s, *_ in got:
            by_user.setdefault(u, []).append(s)
        assert by_user == {1: [1, 2], 2: [1]}

    def test_tie_break_on_event_id(self, spark):
        """Two events with identical ts order deterministically by id."""
        rows = [ev(1, 2, 0), ev(1, 1, 0), ev(1, 3, 500)]
        a = run(spark, rows, gap=100)
        b = run(spark, list(reversed(rows)), gap=100)
        assert a == b
        assert a[0][4] == 2  # the tied pair share session 1

    def test_single_event_sessions(self, spark):
        rows = [ev(1, i, i * 10_000) for i in range(5)]
        got = run(spark, rows, gap=100)
        assert len(got) == 5
        assert all(n == 1 and d == 0 for *_, n, d in got)

    def test_session_bounds_are_min_max_ms(self, spark):
        rows = [ev(1, 1, 0), ev(1, 2, 30), ev(1, 3, 70)]
        (row,) = run(spark, rows, gap=100)
        _, _, start_ms, end_ms, n, dur = row
        assert (end_ms - start_ms, n, dur) == (70_000, 3, 70_000)


class TestSessionizeRandomized:
    def test_random_stream_matches_python(self, spark):
        """400 seeded events, mixed users, gaps straddling the threshold
        (but never exactly on it) — full tuple equality vs the
        pure-Python reference."""
        import random

        rng = random.Random(99)
        rows, eid = [], 0
        for user in range(8):
            t = rng.randint(0, 500)
            for _ in range(50):
                t += rng.choice([1, 40, 99, 101, 250, 1000])
                rows.append((eid, T0 + dt.timedelta(seconds=t), user))
                eid += 1
        got = run(spark, rows, gap=100)
        # py reference uses UTC epoch; T0 is naive → timestamp() applies
        # local tz, but the test compares Spark's NTZ epoch math, so
        # normalize via a fixed epoch base instead
        base = dt.datetime(1970, 1, 1)
        want = []

        def ms(ts):
            return int((ts - base).total_seconds() * 1000)
        by_user = {}
        for e, ts, u in rows:
            by_user.setdefault(u, []).append((ts, e))
        for u, evs in by_user.items():
            evs.sort()
            sessions, cur = [], [evs[0]]
            for prev, nxt in zip(evs, evs[1:]):
                if (ms(nxt[0]) - ms(prev[0])) > 100_000:
                    sessions.append(cur)
                    cur = [nxt]
                else:
                    cur.append(nxt)
            sessions.append(cur)
            for sid, sess in enumerate(sessions, start=1):
                m = [ms(t) for t, _ in sess]
                want.append((u, sid, min(m), max(m), len(sess), max(m) - min(m)))
        assert got == sorted(want)
