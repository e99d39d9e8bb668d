"""Deduplication operators for large-scale training-data pipelines.

All operate on a documents table ``[doc_id: long, text: string, ...]`` and
are pure Catalyst except where noted — no per-row Python anywhere.

* ``exact_dedup``      — hash-groupBy on md5(text); one shuffle.
* ``minhash_lsh``      — shingle → k minhashes (xxhash64 family) → banded
                         LSH buckets → candidate-pair self-join. The classic
                         MinHash/LSH pipeline (Broder '97; Leskovec et al.,
                         Mining of Massive Datasets ch.3), expressed as
                         explode + groupBy-min + join. Scales: the only
                         quadratic step is within-bucket pairing, bounded by
                         band width.
* ``simhash``          — 64-bit SimHash (Charikar '02) via one token explode
                         + 64 conditional-sum aggregates (no row blowup).
* ``ngram_jaccard_pairs`` — exact Jaccard verification for candidate pairs
                         via shingle-set joins (the verify stage after LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(text_col):
    return F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " ")))


def _doc_toks(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """[id, toks] — one materialized token array per document. The
    one-row-per-id aggregate is a projection-collapse BARRIER (see
    ``shingles``), not a combiner: a duplicated id would silently keep one
    arbitrary row's tokens, so the documented id-uniqueness contract is
    enforced loudly (raise_error evaluates lazily per group — zero cost on
    the honest path, no extra action or shuffle)."""
    toks = F.split(_normalize(F.col(text_col)), " ")
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .groupBy("id")
        .agg(F.first("toks").alias("toks"), F.count(F.lit(1)).alias("_rows"))
        .select(
            "id",
            F.when(
                F.col("_rows") > 1,
                F.raise_error(
                    F.concat(
                        F.lit(f"dedup: duplicate {id_col}: "),
                        F.col("id").cast("string"),
                    )
                ).cast("array<string>"),
            )
            .otherwise(F.col("toks"))
            .alias("toks"),
        )
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: [text_hash, keep_id=min id, dup_count]."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_len: int = 5
) -> DataFrame:
    """[id, shingle] — distinct word shingles of length ``shingle_len``.

    Assembly is slice-over-a-MATERIALIZED-token-array: a trivial
    ``slice(toks, i, L)`` lambda straight after the split is an O(tokens ×
    text_len) trap — Catalyst collapses adjacent projections, so the lambda
    re-evaluates the whole regexp_replace+split per index (measured 64 ms
    CPU/doc; ~10 s for 5k docs). A one-row-per-id ``groupBy(id).first(toks)``
    aggregate is the projection-collapse barrier: the split runs once per
    doc, the slices copy words out of the materialized array. This replaces
    a round-1 posexplode + 5×lead window (the WindowExec's per-row frame
    evaluation measured ~5× slower than the array slices on the same data;
    both produce the identical distinct (id, shingle) set). ``id_col`` must
    be unique per document (true for the documents table); a violation
    raises from the plan (_doc_toks) instead of silently keeping one row.
    Docs shorter than ``shingle_len`` yield their full text as the single
    (short) shingle."""
    base = _doc_toks(docs, id_col, text_col)
    win_starts = F.sequence(F.lit(0), F.size("toks") - F.lit(shingle_len))
    exploded = base.select(
        "id",
        F.explode(
            F.when(
                F.size("toks") <= F.lit(shingle_len),
                F.array(F.concat_ws(" ", F.col("toks"))),
            ).otherwise(
                F.transform(
                    win_starts,
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, shingle_len)),
                )
            )
        ).alias("shingle"),
    )
    return exploded.distinct()


def hashed_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 5,
) -> DataFrame:
    """[id, sh_hash] — distinct xxhash64 per shingle. Hashing BEFORE the
    distinct means the dedup shuffle moves 8 bytes per shingle instead of
    the ~tens-of-bytes string — the string never leaves the map side. The
    per-doc shingle SET survives exactly (64-bit collisions negligible),
    which is all MinHash consumes."""
    base = _doc_toks(docs, id_col, text_col)
    win_starts = F.sequence(F.lit(0), F.size("toks") - F.lit(shingle_len))
    return (
        base.select(
            "id",
            F.explode(
                F.when(
                    F.size("toks") <= F.lit(shingle_len),
                    F.array(F.xxhash64(F.concat_ws(" ", F.col("toks")))),
                ).otherwise(
                    F.transform(
                        win_starts,
                        lambda i: F.xxhash64(
                            F.concat_ws(" ", F.slice("toks", i + 1, shingle_len))
                        ),
                    )
                )
            ).alias("sh_hash"),
        )
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_len: int = 5,
) -> DataFrame:
    """[id, sig: array<long>] — k-minhash signature per document.

    The k-hash family is derived from ONE string hash per shingle:
    h_i(s) = xxhash64(xxhash64(s), i). Hashing the variable-length shingle
    bytes once and mixing the 8-byte result k times is ~k× less string
    traffic than k independent string hashes, with the same independence
    guarantees (each h_i is a fresh xxhash64 over the 16-byte (base, i)
    input); and the shingle-set dedup shuffle moves hashes, not strings
    (hashed_shingles)."""
    sh = hashed_shingles(docs, id_col, text_col, shingle_len)
    mins = [
        F.min(F.xxhash64(F.col("sh_hash"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs [a, b, est_jaccard] (a < b).

    est_jaccard = fraction of agreeing minhashes — the unbiased MinHash
    estimator. Banding: a pair becomes a candidate iff all rows of at least
    one band agree."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_len).persist()
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = banded.select(F.col("id").alias("a"), "band", "bucket")
    right = banded.select(F.col("id").alias("b"), "band", "bucket")
    # dedupe candidate pairs on bare (a, b) ids FIRST — carrying the k-long
    # signature arrays (k·16 B/row) through the bucket self-join shuffle and
    # the distinct would multiply shuffle volume ~30×; the signatures are
    # re-attached once per surviving pair below
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    pairs = pairs.join(
        sig.select(F.col("id").alias("a"), F.col("sig").alias("sig_a")), "a"
    ).join(sig.select(F.col("id").alias("b"), F.col("sig").alias("sig_b")), "b")
    agree = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")), lambda v: v == 1)
    )
    out = pairs.select(
        "a", "b", (agree / F.size("sig_a")).cast("double").alias("est_jaccard")
    )
    return out


def minhash_lsh_md5(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_len: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs [a, b, agree] (a < b) via the md5
    hash family — the cross-engine value-oracle twin of ``minhash_lsh``
    (same shingle → k-minhash → band → bucket-self-join algebra, but
    h_i(s) = md5(s || '|' || i) as a HEX STRING and the per-(doc, i) min
    is the lexicographic string min, which DuckDB reproduces exactly:
    fixed-width lowercase hex compares byte-wise identically in both
    engines, and no float appears anywhere — ``agree`` is the integer
    count of equal minhashes of the pair). The xxhash64 production path
    stays ``minhash_lsh`` (8-byte hashes, ~4× less shuffle width); this
    family exists so the banded-LSH pipeline shape itself carries a
    value-hash driver oracle, the anf_round precedent."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = shingles(docs, id_col, text_col, shingle_len)
    mins = [
        F.min(
            F.md5(F.concat(F.col("shingle"), F.lit(f"|{i}")))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    # no persist: the signature aggregate is recomputed by the banding and
    # the two agree-count joins (cheap at contract scale); a 100-TB caller
    # owns caching/checkpointing of the corpus-sized signature table —
    # persisting here would leak executor storage for the session lifetime
    # (the function returns before any action runs)
    sig = sh.groupBy("id").agg(*mins)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = banded.select(F.col("id").alias("a"), "band", "bucket")
    right = banded.select(F.col("id").alias("b"), "band", "bucket")
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    agree = None
    for i in range(num_hashes):
        t = (F.col(f"sa.h{i}") == F.col(f"sb.h{i}")).cast("int")
        agree = t if agree is None else agree + t
    out = (
        pairs.join(sig.alias("sa"), pairs.a == F.col("sa.id"))
        .join(sig.alias("sb"), pairs.b == F.col("sb.id"))
        .select("a", "b", agree.cast("long").alias("agree"))
    )
    return out


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """[id, simhash: long] — 64-bit SimHash over whitespace tokens.

    One explode + 64 conditional sums; the bit assembly folds sign bits into
    a single long with a shift-or aggregate expression."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(_normalize(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(*sums)
    bit_exprs = [
        F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    fold = bit_exprs[0]
    for e in bit_exprs[1:]:
        fold = fold.bitwiseOR(e)
    return agg.select("id", fold.alias("simhash"))


def simhash_md5(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """[id, simhash60: string] — SimHash over the md5 hash family, the
    cross-engine value-oracle twin of ``simhash`` (same per-bit majority
    algebra over the token MULTISET, but bit i of a token's hash is
    extracted from md5 hex nibble i//4 with pure INTEGER arithmetic —
    Spark reads the nibble via conv(hexchar, 16, 10), DuckDB via
    strpos over the hex alphabet; identical integers, no 64-bit
    signedness anywhere — and the digest is re-assembled as a
    ``bits/4``-char hex string). 60 bits (15 nibbles) keeps everything
    in exact int32 range on both engines; the xxhash64 64-bit ``simhash``
    stays the production path (single long column, bitwise ops)."""
    assert bits % 4 == 0 and 0 < bits <= 124
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(_normalize(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("hx", F.md5("tok"))
    sums = []
    for i in range(bits):
        j, b = divmod(i, 4)
        nib = F.conv(F.substring("hx", j + 1, 1), 16, 10).cast("int")
        bit = F.floor(nib / F.lit(2**b)).cast("int") % 2
        sums.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"b{i}")
        )
    agg = toks.groupBy("id").agg(*sums)
    alphabet = "0123456789abcdef"
    nib_chars = []
    for j in range(bits // 4):
        val = None
        for b in range(4):
            t = F.when(F.col(f"b{4 * j + b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
            val = t if val is None else val + t
        nib_chars.append(F.lit(alphabet).substr(val + 1, F.lit(1)))
    return agg.select("id", F.concat(*nib_chars).alias("simhash60"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, via pigeonhole block
    bucketing: with n_blocks = max_hamming + 1 bit-blocks, any pair at
    distance <= max_hamming shares at least one exactly-equal block, so the
    candidate join is equality-bucketed (never all-pairs)."""
    n_blocks = max_hamming + 1
    bounds = [i * 64 // n_blocks for i in range(n_blocks + 1)]
    sh = simhash(docs, **kw).persist()
    block_structs = []
    for b in range(n_blocks):
        lo, hi = bounds[b], bounds[b + 1]
        mask = (1 << (hi - lo)) - 1
        block_structs.append(
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftright(F.col("simhash"), lo).bitwiseAND(F.lit(mask)).alias("val"),
            )
        )
    blocks = sh.select(
        "id", "simhash", F.explode(F.array(*block_structs)).alias("bv")
    ).select("id", "simhash", F.col("bv.blk").alias("blk"), F.col("bv.val").alias("val"))
    l = blocks.select(F.col("id").alias("a"), F.col("simhash").alias("sh_a"), "blk", "val")
    r = blocks.select(F.col("id").alias("b"), F.col("simhash").alias("sh_b"), "blk", "val")
    pairs = (
        l.join(r, ["blk", "val"]).filter(F.col("a") < F.col("b")).select("a", "b", "sh_a", "sh_b").distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("a", "b", ham.alias("hamming")).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,  # [a, b]
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
) -> DataFrame:
    """Exact Jaccard for candidate pairs via shingle-set joins:
    |A∩B| from an equi-join on shingles, |A∪B| = |A|+|B|-|A∩B|."""
    sh = shingles(docs, id_col, text_col, shingle_len).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    sa = sh.select(F.col("id").alias("a"), "shingle")
    sb = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        candidates.join(sa, "a").join(sb, ["b", "shingle"]).groupBy("a", "b").agg(F.count("*").alias("inter"))
    )
    out = (
        candidates.join(inter, ["a", "b"], "left")
        .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .select(
            "a",
            "b",
            (
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("inter"), F.lit(0)))
            ).alias("jaccard"),
        )
    )
    return out


def chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 10,
) -> DataFrame:
    """Corpus-wide EXACT substring dedup at fixed-width word-chunk
    granularity — the C4/RefinedWeb "repeated span removal" primitive
    (Raffel et al. 2020 dedup three-sentence spans; here the unit is
    ``width`` consecutive normalized tokens, which needs no sentence
    splitter). Every document is cut into non-overlapping ``width``-word
    chunks; each distinct chunk string survives ONLY at its first corpus
    occurrence (min (doc_id, chunk_idx) — deterministic, not
    arrival-order); documents are recomposed from their surviving chunks
    in order. Documents whose every chunk is claimed elsewhere drop out.

    Returns [id, n_chunks, kept_chunks, dedup_text].

    Plan (pure Catalyst): tokenize → per-doc chunk array via
    transform(sequence) (no row blowup until one posexplode) → global
    first-occurrence winner via groupBy(chunk).min(struct(id, idx)) — a
    single map-side-combinable shuffle on the chunk string — → join back
    on equality → per-doc ordered recompose with array_sort(collect_list).
    At 100 TB the chunk table is ~m/width rows; hashing the chunk to 16
    bytes before the shuffle (as hashed_shingles does) is the next lever,
    kept exact here because the contract compares recomposed TEXT.
    """
    chunked = _doc_toks(docs, id_col, text_col).select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(ceil(size(toks) / {width}.0)) - 1),"
                f" i -> array_join(slice(toks, i * {width} + 1, {width}), ' '))"
            )
        ).alias("idx", "chunk"),
    )
    winners = chunked.groupBy("chunk").agg(
        F.min(F.struct(F.col("id"), F.col("idx"))).alias("w")
    )
    kept = chunked.join(winners, "chunk").filter(
        (F.col("id") == F.col("w.id")) & (F.col("idx") == F.col("w.idx"))
    )
    totals = chunked.groupBy("id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        kept.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("kept_chunks"),
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(idx, chunk))),"
                    " x -> x.chunk)"
                ),
                " ",
            ).alias("dedup_text"),
        )
        .join(totals, "id")
        .select("id", "n_chunks", "kept_chunks", "dedup_text")
    )
