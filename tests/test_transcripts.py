"""Transcript generator determinism + edge-derivation golden tests +
the input_hint per-row invariant: per-turn text equality under stable
(conv_id, turn_idx) ordering through ingest/round-trip."""

import pytest
from pyspark.sql import functions as F

from linkgraph.sources.transcripts import TRANSCRIPT_SCHEMA, derive_edges, generate_transcripts


def test_schema_matches_input_hint(spark):
    t = generate_transcripts(spark, n_convs=5)
    got = [(f.name, f.dataType) for f in t.schema.fields]
    want = [(f.name, f.dataType) for f in TRANSCRIPT_SCHEMA.fields]
    assert got == want


def test_deterministic_across_partitionings(spark):
    a = generate_transcripts(spark, n_convs=20, seed=7)
    b = generate_transcripts(spark, n_convs=20, seed=7).repartition(13)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    c = generate_transcripts(spark, n_convs=20, seed=8)
    assert sorted(map(tuple, c.collect())) != ra


def test_ts_monotone_within_conversation(spark):
    t = generate_transcripts(spark, n_convs=10)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        t.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull() & (F.col("ts") <= F.col("prev_ts")))
        .count()
    )
    assert bad == 0


def test_text_roundtrip_under_stable_ordering(spark, tmp_path):
    """input_hint invariant: per-turn text byte-identical under stable
    (conv_id, turn_idx) ordering after a write/read round-trip."""
    t = generate_transcripts(spark, n_convs=15, seed=42)
    p = str(tmp_path / "transcripts.parquet")
    t.write.parquet(p)
    back = spark.read.parquet(p)
    orig = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    rt = back.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    assert [tuple(r) for r in orig] == [tuple(r) for r in rt]


def test_golden_edge_derivation(spark):
    """Hand-written tiny transcript -> exact expected edge multiset."""
    rows = [
        ("c1", 0, "user_1", "t", None, "2026-01-01 00:00:00"),
        ("c1", 1, "assistant", "t", "bash", "2026-01-01 00:00:01"),
        ("c1", 2, "user_1", "t", None, "2026-01-01 00:00:02"),
        ("c2", 0, "user_2", "t", None, "2026-01-01 00:00:00"),
        ("c2", 1, "agent_9", "t", "search", "2026-01-01 00:00:01"),
        ("c2", 2, "agent_9", "t", "search", "2026-01-01 00:00:02"),
    ]
    t = spark.createDataFrame(
        [(c, i, r, x, tl, ts) for c, i, r, x, tl, ts in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (r["src_name"], r["dst_name"]) for r in derive_edges(t).collect()
    )
    expect = sorted(
        [
            ("assistant", "user_1"),   # c1 reply t1->t0
            ("user_1", "assistant"),   # c1 reply t2->t1
            ("assistant", "bash"),     # c1 tool edge t1
            ("agent_9", "user_2"),     # c2 reply t1->t0
            ("agent_9", "agent_9"),    # c2 reply t2->t1 (self-loop kept)
            ("agent_9", "search"),     # c2 tool edge t1
            ("agent_9", "search"),     # c2 tool edge t2 (multi-edge kept)
        ]
    )
    assert got == expect


def test_node_ids_stable_hash(spark):
    t = generate_transcripts(spark, n_convs=10)
    e = derive_edges(t)
    bad = e.filter(F.xxhash64("src_name") != F.col("src")).count()
    assert bad == 0
