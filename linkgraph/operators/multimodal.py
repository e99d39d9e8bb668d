"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInArrow``/``mapInPandas``. The decode step
itself is STUBBED in this environment (no image/audio libraries in the
container): ``decode_image(real=True)`` raises NotImplementedError, while
the default deterministic fake decoder exercises the full Spark-side
contract — schema, partitioning, UDF signature, Arrow batch shape — which
is the part that matters for the engine. Swapping in Pillow/ffmpeg later
changes only the numpy body of the kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (payload bytes
    derived from xxhash64 — stands in for real encoded blobs)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.repeat(F.hex(F.xxhash64("id", F.lit(seed + 1))), 16)).alias("payload"),
        F.struct(
            (16 + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(48))).cast("int").alias("width"),
            (16 + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(48))).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (1 + F.pmod(F.xxhash64("id", F.lit(4)), F.lit(32))).cast("int").alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )
    return df


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic MEDIA_SCHEMA view over a documents table (payload =
    encoded text bytes, dims derived from doc_id/n_chars) — lets the
    multimodal plumbing run against the shared test tables and be
    oracle-checked arithmetically."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (16 + F.pmod(F.col("n_chars"), F.lit(64))).cast("int").alias("width"),
            (16 + F.pmod(F.col("doc_id") * 7, F.lit(48))).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (1 + F.pmod(F.col("doc_id"), F.lit(32))).cast("int").alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: bytes -> HxW gray."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    reps = int(np.ceil(need / len(raw)))
    return np.tile(raw, reps)[:need].reshape(height, width)


def decode_and_featurize(media: DataFrame, real: bool = False) -> DataFrame:
    """[media_id, kind, mean_px, std_px, n_bytes] via an Arrow kernel.

    real=True is the hook for an actual decoder (Pillow/libvips) — not
    available in this container, so it raises; the deterministic fake path
    keeps the whole pipeline testable."""
    if real:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; the Spark-side contract is identical"
        )

    def kernel(batches):
        for b in batches:
            mid = b.column("media_id").to_numpy(zero_copy_only=False)
            kind = b.column("kind").to_pylist()
            payload = b.column("payload").to_pylist()
            meta = b.column("meta").to_pylist()
            means, stds, sizes = [], [], []
            for p, m in zip(payload, meta):
                img = _fake_decode(p, m["width"], m["height"])
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                sizes.append(len(p))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(mid),
                    pa.array(kind),
                    pa.array(means),
                    pa.array(stds),
                    pa.array(np.asarray(sizes, dtype=np.int64)),
                ],
                names=["media_id", "kind", "mean_px", "std_px", "n_bytes"],
            )

    return media.mapInArrow(
        kernel, "media_id long, kind string, mean_px double, std_px double, n_bytes long"
    )


def frame_sample(media: DataFrame, every_k: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    (pure Catalyst — the decode of each frame would plug into
    decode_and_featurize's kernel)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_k))
            ).alias("frame_idx"),
        )
    )


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize bookkeeping (aspect-preserving short-side=target) as typed
    columns; the pixel work belongs in the Arrow kernel when a decoder
    exists. Demonstrates metadata-only pushdown: no payload bytes move."""
    w, h = F.col("meta.width"), F.col("meta.height")
    # The short side is pinned to exactly `target`; only the long side is
    # scaled-and-floored. Computing the short side as floor(short * t/short)
    # is an FP trap: e.g. 48 * (224.0/48) = 223.999...97 in float64, and
    # floor breaks the min(out_w,out_h)==target contract. The long side is
    # floor((long * t) / short) — integer product first, so the double
    # division of two small exact ints is correctly rounded and floor-safe.
    out_w = F.when(w <= h, F.lit(target)).otherwise(F.floor(w * target / h))
    out_h = F.when(h <= w, F.lit(target)).otherwise(F.floor(h * target / w))
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        out_w.cast("int").alias("out_width"),
        out_h.cast("int").alias("out_height"),
    )
