"""Text analysis operators — language-ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (JVM-side, codegen'd);
formulas chosen to be exactly reproducible in ANSI SQL so every operator has
a DuckDB oracle in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _fs8(col):
    """Boundary-safe 8-dp rounding (see linkgraph/fp.py for why round()
    is not safe for exact integer-ratio values like punct/len)."""
    from linkgraph.fp import floor_scale

    return floor_scale(col, 8)


# tiny deterministic stopword lists for the n-gram language heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "ich", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_tokens``: whitespace tokens, SQL-portable formula
    (length diff, robust to multiple spaces via normalized text)."""
    t = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )
    return docs.withColumn("n_tokens", n.cast("long"))


def word_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_word_tokens``: BPE-ish subword proxy — count of
    letter-runs and digit-runs and punctuation marks (a deterministic
    regex tokenizer; the standard pre-tokenization shape used by BPE)."""
    pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return docs.withColumn(
        "n_word_tokens", F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).cast("long")
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic quality features + a composite score in [0,1]:

    * len_score      — saturating length preference (500-char knee)
    * punct_ratio    — punctuation chars / chars
    * stopword_ratio — English stopword hits / tokens
    * score          — 0.5*len + 0.3*(1-min(1,4*punct)) + 0.2*min(1,5*stop)
    """
    t = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    n_chars = F.length(t)
    n_tokens = F.when(n_chars == 0, F.lit(0)).otherwise(
        n_chars - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"()]", ""))
    lt = F.lower(t)
    sw = _STOPWORDS["en"]
    # stopword hits counted on space-delimited tokens, SQL-portable:
    padded = F.concat(F.lit(" "), lt, F.lit(" "))
    hits = None
    for w in sw:
        c = (
            F.length(padded)
            - F.length(F.replace(padded, F.lit(f" {w} "), F.lit("")))
        ) / F.lit(len(w) + 2)
        hits = c if hits is None else hits + c
    len_score = F.least(F.lit(1.0), n_chars.cast("double") / 500.0)
    punct_ratio = F.when(n_chars == 0, 0.0).otherwise(n_punct.cast("double") / n_chars)
    stop_ratio = F.when(n_tokens == 0, 0.0).otherwise(hits.cast("double") / n_tokens)
    score = (
        0.5 * len_score
        + 0.3 * (1.0 - F.least(F.lit(1.0), 4.0 * punct_ratio))
        + 0.2 * F.least(F.lit(1.0), 5.0 * stop_ratio)
    )
    return (
        docs.withColumn("len_score", _fs8(len_score))
        .withColumn("punct_ratio", _fs8(punct_ratio))
        .withColumn("stopword_ratio", _fs8(stop_ratio))
        .withColumn("quality", _fs8(score))
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred``: argmax over per-language stopword hit counts
    (n-gram-free heuristic; deterministic ties -> alphabetical first)."""
    lt = F.concat(F.lit(" "), F.lower(F.trim(F.col(text_col))), F.lit(" "))
    scores = []
    for lang in sorted(_STOPWORDS):
        hits = None
        for w in _STOPWORDS[lang]:
            c = (
                F.length(lt) - F.length(F.replace(lt, F.lit(f" {w} "), F.lit("")))
            ) / F.lit(len(w) + 2)
            hits = c if hits is None else hits + c
        scores.append(F.struct(hits.cast("double").alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))
    return docs.withColumn("lang_pred", pred)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append two fingerprints:
    * ``fp_exact`` — xxhash64 of whitespace-normalized lowercased text
    * ``fp_min``   — min xxhash64 over 8-token rolling windows (a 1-hash
      MinHash: equal fp_min is a cheap near-dup signal)"""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = F.split(norm, " ")
    win = 8
    idxs = F.sequence(F.lit(0), F.greatest(F.size(toks) - win, F.lit(0)))
    rolling = F.transform(idxs, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, win))))
    return docs.withColumn("fp_exact", F.xxhash64(norm)).withColumn(
        "fp_min", F.array_min(rolling)
    )


def repetition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append Gopher-style repetition signals (Rae et al. 2021, app. A1.1 —
    boilerplate/spam detectors used by every large corpus-cleaning
    pipeline):

    * ``dup_word_frac``    — 1 − distinct tokens / tokens
    * ``dup_trigram_frac`` — 1 − distinct word-3-grams / 3-gram count

    Pure array expressions (split / transform / array_distinct) on one
    scan — no explode, no shuffle — and SQL-portable, so the driver
    contract value-hashes it against DuckDB. Like the other textstats
    operators these APPEND columns, so composed gates stay a single scan.
    """
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = F.split(norm, " ")
    n = F.size(toks)
    dup_w = F.when(n < 1, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n
    )
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
    )
    dup_t = F.when(n < 3, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(tri)).cast("double") / (n - 2)
    )
    return docs.withColumn("dup_word_frac", _fs8(dup_w)).withColumn(
        "dup_trigram_frac", _fs8(dup_t)
    )


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """[id, fp] — winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03, the MOSS algorithm): hash every k-token gram, slide a
    window of ``window`` gram-hashes, keep each window's minimum, dedupe.
    Guarantees every match of length >= window+k-1 tokens shares a
    fingerprint, while storing ~2/(window+1) of the grams — the
    subsampling property that makes fingerprint joins tractable at corpus
    scale. Pure Catalyst: array ops + a rows-window min.

    ``hash_family="md5"`` switches the gram hash to the md5 HEX STRING
    with a lexicographic window min — byte-identical in DuckDB, so the
    whole winnowing pipeline carries a value-hash driver oracle
    (`winnow_round`); the 8-byte xxhash64 default stays the production
    path (fixed-width ints, ~5× narrower shuffle)."""
    from pyspark.sql import Window as W

    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    ghash = F.xxhash64 if hash_family == "xxhash64" else F.md5
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = F.split(norm, " ")
    idxs = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                idxs, lambda i: ghash(F.concat_ws(" ", F.slice(toks, i + 1, k)))
            )
        ).alias("pos", "h"),
    )
    w = W.partitionBy("id").orderBy("pos").rowsBetween(-(window - 1), 0)
    return (
        grams.withColumn("fp", F.min("h").over(w))
        .filter(F.col("pos") >= window - 1)
        .select("id", "fp")
        .distinct()
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 5,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most frequent word n-grams per group (default: per language) —
    the standard corpus-profile / contamination-screen statistic. Ties
    break on the n-gram string ascending, so the table is deterministic.
    Returns [<group_col>, rank, ngram, n_occurrences].

    Plan (pure Catalyst): one transform(sequence) builds each doc's n-gram
    array with NO row blowup, one posexplode + groupBy(group, ngram) count
    (map-side combinable — the heavy shuffle moves one row per DISTINCT
    (group, ngram)), then a rank window over groups, which is tiny by the
    time it runs. At 100 TB the count shuffle is the only big exchange and
    it is pre-aggregated; the window never sees more than the distinct
    n-gram table."""
    from pyspark.sql import Window as W

    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = F.split(norm, " ")
    # docs shorter than n tokens contribute nothing (sequence() would
    # DESCEND for stop < start, so gate it with CASE, not greatest())
    grams = docs.select(
        F.col(group_col).alias("grp"), toks.alias("toks")
    ).select(
        "grp",
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {n} THEN "
                f"transform(sequence(1, size(toks) - {n - 1}),"
                f" i -> array_join(slice(toks, i, {n}), ' ')) "
                f"ELSE array() END"
            )
        ).alias("ngram"),
    )
    counts = grams.groupBy("grp", "ngram").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    w = W.partitionBy("grp").orderBy(
        F.col("n_occurrences").desc(), F.col("ngram").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "rank", "ngram", "n_occurrences")
    )


def group_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact linear-interpolated percentiles of ``value_col`` per group —
    the corpus length-distribution profile (and the exactness baseline for
    approx_percentile at scale, where you would swap in the t-digest
    variant and keep this as the audit). Returns
    [<group_col>, n, p<q1>, p<q2>, ...].

    percentile() is an exact JVM-side aggregate (sort within group); at
    100 TB you run it per partition-friendly group (language, source) —
    groups are the unit of skew, not rows."""
    aggs = [
        F.percentile(F.col(value_col), F.lit(q)).alias(
            "p" + str(q).replace("0.", "").ljust(2, "0")
        )
        for q in qs
    ]
    return df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"), *aggs)


def unigram_xent(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram cross-entropy against the corpus's own MLE
    unigram model: H(doc) = −(1/n_d) Σ_{t ∈ doc} ln p(t), with p(t) =
    corpus count(t) / corpus tokens. The cheapest perplexity proxy — the
    standard outlier/quality signal when no external LM is available
    (high H = atypical vocabulary; CCNet-style pipelines use the same
    shape with a trained KenLM). No smoothing needed: every scored token
    exists in the corpus it was counted from, so p(t) > 0.
    Returns [id, n_tokens, xent].

    Plan: one posexplode-free explode to (doc, token), a map-side-
    combinable corpus count per token (the only big shuffle — one row per
    DISTINCT token afterwards), total via a window-free cross join of the
    1-row sum, then join-back keyed on the token string and a per-doc avg.
    At 100 TB the token-frequency table is vocabulary-sized — broadcast
    material after the count."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(F.split(norm, " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    p = freq.crossJoin(total).select(
        "tok", (F.col("c") / F.col("total")).alias("p")
    )
    return (
        toks.join(p, "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.log("p")).alias("xent"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bounded query
    term list (Robertson & Zaragoza, "The probabilistic relevance
    framework: BM25 and beyond", FnTIR 2009):

        score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                              (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
        idf(t)   = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)

    over whitespace tokens of the normalized text (the repo-standard
    lower/trim/collapse normalization). Returns
    [id, dl, n_matched, bm25] — the retrieval-quality scorer a
    training-data pipeline uses for query-targeted corpus selection.

    Plan: ZERO explodes — each term's tf is a vectorized
    ``size(filter(tokens, x -> x = t))`` column over one scan, corpus
    statistics (N, avgdl, every df) are ONE 1-row aggregate broadcast
    back by a literal cross join, and the score is a pure projection.
    Two passes over the corpus total, no shuffle wider than 1 row —
    the plan you want at 100 TB for a bounded query vocabulary. (An
    unbounded/query-table variant would explode + join on term; this
    operator deliberately asserts the bounded case.)"""
    # normalize terms with the SAME rule applied to the documents
    # (lower + strip) — a raw 'Table' would otherwise silently score 0
    # against the lowercased token stream; multi-word/empty terms can
    # never match a single token, so they fail loudly
    terms = list(dict.fromkeys(t.strip().lower() for t in query_terms))
    if not terms or len(terms) > 64:
        raise ValueError("bm25_scores: need 1..64 distinct query terms")
    bad = [t for t in terms if not t or any(c.isspace() for c in t)]
    if bad:
        raise ValueError(
            f"bm25_scores: terms must be single non-empty tokens: {bad!r}"
        )
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))

    def _eq(term):
        # unary closure: a default-arg lambda would have arity 2 and be
        # interpreted as pyspark's (element, index) filter form
        return lambda x: x == F.lit(term)

    base = docs.select(
        F.col(id_col).alias("id"), F.split(norm, " ").alias("toks")
    ).select(
        "id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter(F.col("toks"), _eq(t))).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(stats)
    contribs = [
        F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        * F.col(f"tf_{i}")
        * (k1 + 1.0)
        / (
            F.col(f"tf_{i}")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
        for i in range(len(terms))
    ]
    matched = sum(
        ((F.col(f"tf_{i}") > 0).cast("int") for i in range(len(terms))),
        F.lit(0),
    )
    score = sum(contribs[1:], contribs[0])
    return scored.select(
        "id", "dl", matched.alias("n_matched"), score.alias("bm25")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (the sklearn-standard smoothing: idf = ln((1+N)/(1+df)) + 1,
    score = tf_count · idf) over whitespace tokens of the normalized
    text — the keyword-extraction / topic-labeling primitive of a
    corpus pipeline. Deterministic ties: (score desc, term asc).
    Returns [id, term, rank, tfidf].

    Plan: one explode to (doc, term) with a partial+final count
    aggregate (the only corpus-wide shuffle), document frequency as a
    second aggregate over the SAME counted table (one row per distinct
    (doc, term) already — no re-explode), a term-keyed join back
    (vocabulary-sized right side — broadcast material at scale), and a
    per-doc top-k window. Unlike ``bm25_scores`` (bounded query
    vocabulary, zero explodes) this handles the UNBOUNDED vocabulary
    case, so the explode is the correct plan."""
    from pyspark.sql import Window

    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(F.split(norm, " ")).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_row = docs.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(n_row)
        .select(
            "id",
            "term",
            (
                F.col("tf")
                * (
                    F.log(
                        (1.0 + F.col("n_docs")) / (1.0 + F.col("df"))
                    )
                    + 1.0
                )
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "rank", "tfidf")
    )


# RE2-safe patterns (no lookaround/backrefs) so Spark's Java regex and the
# DuckDB RE2 oracle match the same spans: training-corpus PII triage —
# flag/count, redaction is a downstream map over the same matches
_PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "urls": r"https?://[^ \t\n]+",
    "phones": r"\+?[0-9][0-9() .-]{7,14}[0-9]",
    "ipv4s": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII-ish pattern counts [id, emails, urls, phones,
    ipv4s, any_pii] — the filter/report pass of a training-data pipeline
    (decide-drop / route-to-redaction). One single-scan projection, zero
    joins, zero UDFs: each count is size(regexp_extract_all(...)), pure
    codegen. Patterns are deliberately RE2-compatible so the DuckDB
    contract oracle evaluates the identical automaton; counts are
    non-overlapping leftmost-longest matches in both engines."""
    cols = [F.col(id_col).alias("id")]
    flags = None
    for name, pat in _PII_PATTERNS.items():
        c = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        cols.append(c.cast("long").alias(name))
        flags = c if flags is None else flags + c
    cols.append((flags > 0).alias("any_pii"))
    return docs.select(*cols)
