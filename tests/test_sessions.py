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
