"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInArrow``/``mapInPandas``.

Decode paths (``decode_and_featurize``):

* ``real=False`` (default) — deterministic fake decoder: exercises the
  full Spark-side contract (schema, partitioning, UDF signature, Arrow
  batch shape) with no media libraries; the contract queries and oracle
  use this path.
* ``real=True`` — a REAL kernel with runtime import guards: Pillow when
  importable, else a pure-numpy parser for uncompressed 8/24/32-bit BMP
  (decodable with zero dependencies — unit-tested in-sandbox via the
  ``encode_bmp`` helper), else ONE warning per task and the deterministic
  fake as last resort. Environments with Pillow get the full-format
  kernel with no code change; this container (no media libs, no network)
  still exercises the real numpy decode body through BMP.
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


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP encoder (bottom-up, BGR, 4-byte row
    padding). Input: uint8 HxW (gray, replicated to 3 channels) or HxWx3
    (RGB). Exists so the real decode kernel is unit-testable in-sandbox:
    BMP is the one mainstream raster format writable AND readable with
    nothing but numpy."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    header = (
        b"BM"
        + (14 + 40 + data_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (14 + 40).to_bytes(4, "little")  # pixel-data offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")  # positive height = bottom-up rows
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + data_size.to_bytes(4, "little")
        + b"\x00" * 16  # ppm + palette counts (unused)
    )
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for uncompressed 8/24/32-bit BMP -> HxW uint8
    gray. Luma uses Pillow's EXACT ``convert("L")`` fixed-point form
    ((19595·R + 38470·G + 7471·B + 0x8000) >> 16 — ImagingConvert.c's
    L24/L), so the PIL and numpy paths of the real kernel agree
    bit-for-bit on BMP inputs, color included. Raises ValueError on
    non-BMP/compressed/unsupported/corrupt payloads — callers decide the
    fallback."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    b = memoryview(payload)

    def _u(off, size, signed=False):
        return int.from_bytes(b[off : off + size], "little", signed=signed)

    data_off = _u(10, 4)
    dib = _u(14, 4)
    if dib < 40:
        raise ValueError(f"unsupported DIB header size {dib}")
    w, h_raw = _u(18, 4, signed=True), _u(22, 4, signed=True)
    bpp, compression = _u(28, 2), _u(30, 4)
    if compression != 0 or bpp not in (8, 24, 32) or w <= 0 or h_raw == 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    h, bottom_up = abs(h_raw), h_raw > 0
    row_bytes = (w * (bpp // 8) + 3) & ~3
    end = data_off + row_bytes * h
    if end > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(b[data_off:end], dtype=np.uint8).reshape(h, row_bytes)
    if bottom_up:
        rows = rows[::-1]
    if bpp == 8:
        # palette: RGBX entries right after the DIB header
        n_colors = _u(46, 4) or 256
        pal_bytes = b[14 + dib : min(14 + dib + 4 * n_colors, data_off)]
        pal = np.frombuffer(pal_bytes, dtype=np.uint8)[
            : 4 * (len(pal_bytes) // 4)
        ].reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        idx = rows[:, :w].astype(np.intp)
        if idx.size and (len(pal) == 0 or idx.max() >= len(pal)):
            raise ValueError("BMP palette shorter than the max pixel index")
        rgb = pal[idx]
    else:
        step = bpp // 8
        px = rows[:, : w * step].reshape(h, w, step)
        rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    r, g, bl = (rgb[:, :, i].astype(np.int64) for i in range(3))
    # Pillow's L24 fixed-point luma (bit-for-bit with convert("L"))
    return ((r * 19595 + g * 38470 + bl * 7471 + 0x8000) >> 16).astype(np.uint8)


def decode_and_featurize(media: DataFrame, real: bool = False) -> DataFrame:
    """[media_id, kind, mean_px, std_px, n_bytes] via an Arrow kernel.

    ``real=True`` decodes actual image bytes: Pillow when importable (any
    format PIL reads, converted to 8-bit luma), else the pure-numpy BMP
    parser (``decode_bmp``), else the deterministic fake with ONE
    warning per task — the job never fails on a format gap, and the
    fallback is visible in logs. ``real=False`` is the dependency-free
    deterministic fake used by the contract queries/oracle."""

    def kernel(batches):
        if real:
            try:
                from PIL import Image  # noqa: F401 — optional, runtime-probed

                pil = Image
            except ImportError:
                pil = None
            warned = False
        for b in batches:
            mid = b.column("media_id").to_numpy(zero_copy_only=False)
            kind = b.column("kind").to_pylist()
            payload = b.column("payload").to_pylist()
            meta = b.column("meta").to_pylist()
            means, stds, sizes = [], [], []
            for p, m in zip(payload, meta):
                if real:
                    img = None
                    if pil is not None:
                        import io

                        try:
                            img = np.asarray(pil.open(io.BytesIO(p)).convert("L"))
                        except Exception:
                            img = None
                    if img is None:
                        try:
                            img = decode_bmp(p)
                        except Exception:
                            # ValueError for the documented unsupported
                            # cases; anything else a corrupt header slips
                            # past validation must ALSO hit the fallback —
                            # the never-fail contract beats strictness here
                            if not warned:
                                import warnings

                                warnings.warn(
                                    "decode_and_featurize(real=True): payload "
                                    "not decodable (no Pillow, not BMP); "
                                    "falling back to the deterministic fake",
                                    stacklevel=2,
                                )
                                warned = True
                            img = _fake_decode(p, m["width"], m["height"])
                else:
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
