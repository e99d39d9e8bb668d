"""Gap-based sessionization edge cases (bulk parity vs DuckDB lives in
test_entry_contract.py)."""

from datetime import datetime, timedelta

from linkgraph.operators.sessions import session_stats, sessionize
from pyspark.sql import functions as F


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


# ---------------- funnel ----------------


def test_funnel_hand_computed(spark):
    from linkgraph.operators.sessions import funnel

    rows = [
        # user 1 completes in order; the click BEFORE signup must not count
        (1, "click", "2026-01-01 09:00:00"),
        (1, "signup", "2026-01-01 10:00:00"),
        (1, "click", "2026-01-01 11:00:00"),
        (1, "purchase", "2026-01-01 12:00:00"),
        # user 2: purchase before click -> stops at 2 steps
        (2, "signup", "2026-01-01 08:00:00"),
        (2, "purchase", "2026-01-01 08:30:00"),
        (2, "click", "2026-01-01 09:00:00"),
        # user 3: never signs up
        (3, "click", "2026-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["user_id"]: r
        for r in funnel(df, ["signup", "click", "purchase"]).collect()
    }
    assert got[1]["steps_completed"] == 3
    assert str(got[1]["ts_2"]) == "2026-01-01 11:00:00"
    assert got[2]["steps_completed"] == 2
    assert got[2]["ts_3"] is None
    assert got[3]["steps_completed"] == 0
    assert got[3]["ts_1"] is None


def test_funnel_greedy_earliest_is_existence_optimal(spark):
    from linkgraph.operators.sessions import funnel

    # signup@1, click@2, click@5, purchase@3: greedy click@2 lets
    # purchase@3 match (a later click choice would miss it)
    rows = [
        (9, "signup", "2026-01-01 01:00:00"),
        (9, "click", "2026-01-01 02:00:00"),
        (9, "purchase", "2026-01-01 03:00:00"),
        (9, "click", "2026-01-01 05:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = funnel(df, ["signup", "click", "purchase"]).first()
    assert r["steps_completed"] == 3
    assert str(r["ts_2"]) == "2026-01-01 02:00:00"


def test_sample_vertices_induced_properties(spark):
    """Induced-sample invariants: deterministic under repartition, edges
    only between kept vertices, monotone in rate, salt-decorrelated,
    rate 0/1 extremes, and kept-vertex rule matches the python md5
    twin."""
    import hashlib

    from linkgraph.operators.sampling import hex_cutoff, sample_vertices_induced

    edges = [(a, b) for a in range(40) for b in range(40) if a != b and (a + b) % 7 == 0]
    df = spark.createDataFrame(edges, "src long, dst long")
    samp = sample_vertices_induced(df, 0.5)
    got = {(r["src"], r["dst"]) for r in samp.collect()}

    def kept(v, rate, salt="vsample"):
        return hashlib.md5(f"{v}:{salt}".encode()).hexdigest()[:8] < hex_cutoff(rate)

    want = {(a, b) for a, b in edges if kept(a, 0.5) and kept(b, 0.5)}
    assert got == want and 0 < len(got) < len(edges)
    # repartition determinism
    again = {(r["src"], r["dst"]) for r in sample_vertices_induced(df.repartition(9), 0.5).collect()}
    assert again == got
    # monotone: a smaller rate yields a subset
    smaller = {(r["src"], r["dst"]) for r in sample_vertices_induced(df, 0.2).collect()}
    assert smaller <= got
    # extremes
    assert sample_vertices_induced(df, 1.0).count() == len(edges)
    assert sample_vertices_induced(df, 0.0).count() == 0
    # a different salt draws a different (decorrelated) sample
    other = {(r["src"], r["dst"]) for r in sample_vertices_induced(df, 0.5, salt="z").collect()}
    assert other != got
