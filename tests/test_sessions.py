"""Gap-based sessionization edge cases (bulk parity vs DuckDB lives in
test_entry_contract.py)."""

from datetime import datetime, timedelta

from linkgraph.operators.sessions import session_stats, sessionize


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_gap_boundary_is_strict(spark):
    t0 = datetime(2026, 1, 1)
    rows = [
        (1, 7, t0),
        (2, 7, t0 + timedelta(seconds=1800)),      # exactly the gap: SAME session
        (3, 7, t0 + timedelta(seconds=1800 + 1801)),  # 1801s later: NEW session
    ]
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(_ev(spark, rows), gap_seconds=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_sessions_independent_per_actor(spark):
    t0 = datetime(2026, 1, 1)
    rows = [
        (1, 1, t0),
        (2, 2, t0 + timedelta(seconds=10)),
        (3, 1, t0 + timedelta(hours=2)),
        (4, 2, t0 + timedelta(seconds=20)),
    ]
    st = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in session_stats(_ev(spark, rows)).collect()
    }
    assert st == {(1, 1): 1, (1, 2): 1, (2, 1): 2}


def test_span_uses_sub_second_precision(spark):
    t0 = datetime(2026, 1, 1)
    rows = [(1, 5, t0), (2, 5, t0 + timedelta(seconds=1, microseconds=500_000))]
    r = session_stats(_ev(spark, rows)).first()
    assert r["span_ms"] == 1500
