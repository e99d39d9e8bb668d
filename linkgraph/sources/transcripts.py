"""Transcripts source: deterministic synthetic generator + edge derivation.

The engine's primary input (BASELINE.json ``input_hint``) is a table of
multi-turn conversation / agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

``generate_transcripts`` synthesizes that table with *pure Catalyst column
functions* seeded by ``xxhash64`` — no Python RNG, no driver-side loops —
so the same (n_convs, seed) always produces byte-identical rows on any
partitioning and the generator scales linearly with executors. Conversation
lengths follow a power-law-ish distribution (a few very long conversations)
and tool usage is Zipf-skewed (a handful of hub tools) so the derived graph
exercises the hub-skew path by construction.

``derive_edges`` is the fixed, documented edge rule (FIXTURES.md §F1):
within each conversation ordered by ``turn_idx``,

    reply edge:  actor(turn t)  -> actor(turn t-1)      for t >= 1
    tool  edge:  actor(turn t)  -> tool(turn t)          when tool is non-NULL

where ``actor = role`` (the role string *is* the actor identity; roles carry
stable ids like ``user_417`` / ``agent_12``). Node ids are ``xxhash64(actor)``
— a stable string->long keying that replaces the reference's driver-side
dict densification (/root/reference/py_src/prepare_graph.py:15-23) with a
distributed Catalyst built-in. Multi-edges and self-loops are KEPT, matching
the reference's reader which never dedupes
(/root/reference/helpers/file_helper.h:74-83, SURVEY §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# small tool vocabulary — Zipf-ranked so tool_0 is a high-in-degree hub
_TOOLS = [f"tool_{i}" for i in range(24)]


def _u(col, salt: int, seed: int):
    """Deterministic uniform in [0,1) derived from a column + salt."""
    h = F.xxhash64(col, F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def generate_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    max_len: int = 64,
    n_users: int | None = None,
    n_agents: int | None = None,
) -> DataFrame:
    """Deterministic transcripts table, ~n_convs * ~(max_len/4) turns."""
    n_users = n_users or max(2, n_convs // 2)
    n_agents = n_agents or max(2, n_convs // 4)

    convs = spark.range(n_convs).select(F.col("id").alias("conv"))
    # power-law-ish conversation length in [2, max_len]:
    # len = floor(max_len ** u) + 1 clamped to >= 2 — most convs short,
    # a few near max_len (hub-skew by construction)
    convs = convs.withColumn(
        "conv_len",
        F.greatest(
            F.lit(2),
            (F.pow(F.lit(float(max_len)), _u(F.col("conv"), 1, seed)) + F.lit(1)).cast("int"),
        ),
    )
    convs = convs.withColumn("user_id", F.pmod(F.xxhash64("conv", F.lit(2), F.lit(seed)), F.lit(n_users)))

    turns = convs.select(
        "conv",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("turn_idx"),
    )

    th = F.xxhash64("conv", "turn_idx", F.lit(seed))  # per-turn hash
    # role: even turns = the conversation's user; odd turns mostly assistant,
    # sometimes a delegated agent (25%) — agents drawn from a large id space
    agent_id = F.pmod(F.xxhash64("conv", "turn_idx", F.lit(3), F.lit(seed)), F.lit(n_agents))
    role = (
        F.when(F.col("turn_idx") % 2 == 0, F.concat(F.lit("user_"), F.col("user_id")))
        .when(_u(th, 4, seed) < 0.25, F.concat(F.lit("agent_"), agent_id))
        .otherwise(F.lit("assistant"))
    )
    # tool: present on ~30% of non-user turns, Zipf-skewed over _TOOLS
    # (rank ~ floor(len**u) biases toward low indices => tool_0 is the hub)
    tool_rank = F.least(
        F.lit(len(_TOOLS) - 1),
        (F.pow(F.lit(float(len(_TOOLS))), _u(th, 5, seed)) - F.lit(1)).cast("int"),
    )
    tool_arr = F.array(*[F.lit(t) for t in _TOOLS])
    tool = F.when(
        (F.col("turn_idx") % 2 == 1) & (_u(th, 6, seed) < 0.30),
        F.element_at(tool_arr, tool_rank + 1),
    ).otherwise(F.lit(None).cast("string"))

    out = turns.select(
        F.format_string("conv_%08d", F.col("conv")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("turn "),
            F.col("turn_idx"),
            F.lit(" of conv_"),
            F.col("conv"),
            F.lit(" :: "),
            F.hex(th),
        ).alias("text"),
        tool.alias("tool"),
        # monotone within conversation: conv-specific epoch + turn seconds
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.pmod(F.xxhash64("conv", F.lit(7), F.lit(seed)), F.lit(86_400 * 30)).cast("double"))
            + F.make_interval(secs=F.col("turn_idx").cast("double") * 7.0)
        ).alias("ts"),
    )
    return out


def derive_edges(transcripts: DataFrame, include_tool_edges: bool = True) -> DataFrame:
    """Transcripts -> directed edge table [src_name, dst_name, src, dst].

    Reply edges via lag() over (conv_id ORDER BY turn_idx); tool edges via a
    filter — then union. Node ids = xxhash64(actor string). Multi-edges kept.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    base = transcripts.select(
        "conv_id",
        "turn_idx",
        F.col("role").alias("actor"),
        "tool",
        F.lag("role", 1).over(w).alias("prev_actor"),
    )
    reply = base.filter(F.col("prev_actor").isNotNull()).select(
        F.col("actor").alias("src_name"), F.col("prev_actor").alias("dst_name")
    )
    edges = reply
    if include_tool_edges:
        tool = base.filter(F.col("tool").isNotNull()).select(
            F.col("actor").alias("src_name"), F.col("tool").alias("dst_name")
        )
        edges = reply.unionByName(tool)
    return edges.select(
        "src_name",
        "dst_name",
        F.xxhash64("src_name").alias("src"),
        F.xxhash64("dst_name").alias("dst"),
    )
