"""Pins for operators/temporal.py: hand-computed time-respecting paths,
temporal-vs-static reachability divergence, and a python replica on a
random-ish deterministic contact sequence."""

from linkgraph.operators.temporal import (
    bipartite_temporal_edges,
    temporal_reachability,
)


def _df(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, t_ms long")


def _got(res):
    return {r["node"]: r["arr"] for r in res.arrivals.collect()}


def _python_earliest(triples, source, rounds=None):
    nodes = {n for s, d, _ in triples for n in (s, d)}
    arr = {n: None for n in nodes}
    arr[source] = 0
    i = 0
    while True:
        i += 1
        changed = False
        upd = dict(arr)
        for s, d, t in triples:
            if arr[s] is not None and t >= arr[s]:
                if upd[d] is None or t < upd[d]:
                    upd[d] = t
                    changed = True
        arr = upd
        if not changed or (rounds is not None and i >= rounds):
            return arr


def test_temporal_blocks_backward_in_time(spark):
    # a-(t10)-b, b-(t5)-c: statically a reaches c, temporally it cannot
    df = _df(spark, [("a", "b", 10), ("b", "c", 5)])
    got = _got(temporal_reachability(df, "a"))
    assert got == {"a": 0, "b": 10, "c": None}


def test_temporal_waits_for_later_edge(spark):
    # a-(t10)-b, b-(t20)-c: valid time-respecting path; equal ts allowed
    df = _df(spark, [("a", "b", 10), ("b", "c", 20), ("c", "d", 20)])
    got = _got(temporal_reachability(df, "a"))
    assert got == {"a": 0, "b": 10, "c": 20, "d": 20}


def test_temporal_prefers_earliest_arrival(spark):
    # two routes to c: via b arrives at 30, direct at 50 -> 30
    df = _df(spark, [("a", "b", 10), ("b", "c", 30), ("a", "c", 50)])
    got = _got(temporal_reachability(df, "a"))
    assert got["c"] == 30


def test_temporal_matches_python_replica(spark):
    triples = [
        (f"n{(i * 7) % 5}", f"n{(i * 3 + 1) % 5}", (i * 13) % 29)
        for i in range(40)
    ]
    df = _df(spark, triples)
    res = temporal_reachability(df, "n0")
    assert _got(res) == _python_earliest(triples, "n0")


def test_bipartite_temporal_edges_shape(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    te = bipartite_temporal_edges(ev)
    n_events = ev.count()
    assert te.count() == 2 * n_events
    assert te.filter("t_ms is null").count() == 0
