"""spark-submit entry job: documents -> dedup -> filter -> kept corpus.

The training-data companion of jobs/pagerank_job.py: a plain argparse CLI
with NO imports from the repo directory — everything comes from the
shipped zip — so it runs identically via

    spark-submit --py-files dist/linkgraph.zip jobs/corpus_job.py [opts]

on a real cluster. Pipeline (each stage an already-oracle-checked
operator; stages toggle off independently):

1. EXACT dedup — md5(text) groupBy, keeper = min id (dedup.exact_dedup
   semantics; ``stream_dedup`` is the streaming twin of this stage).
2. NEAR-DUP clustering — banded MinHash candidates (never all-pairs) at
   --near-threshold agreeing minhashes -> connected components ->
   canonical min id per cluster (the ``lsh_clusters`` contract shape,
   production xxhash64 family by default).
3. QUALITY/LANGUAGE/LENGTH gate — the ``corpus_filter`` composition:
   language != --lang, token bounds, quality < --min-quality, with the
   FIRST failing gate as the recorded drop reason.

Prints exactly one JSON line: per-stage survivor counts + drop reasons;
--output writes the kept corpus (doc_id, text + gate columns) as parquet.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description="linkgraph corpus pipeline job")
    p.add_argument("--documents", required=True, help="parquet path (doc_id, text, ...)")
    p.add_argument("--output", default=None, help="parquet path for the kept corpus")
    p.add_argument("--skip-exact", action="store_true")
    p.add_argument("--skip-neardup", action="store_true")
    p.add_argument("--skip-gates", action="store_true")
    p.add_argument("--num-hashes", type=int, default=32)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--shingle-len", type=int, default=5)
    p.add_argument(
        "--near-threshold", type=float, default=0.8,
        help="min MinHash agreement fraction for a near-dup edge",
    )
    p.add_argument("--lang", default="en")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--max-tokens", type=int, default=100000)
    p.add_argument("--min-quality", type=float, default=0.6)
    p.add_argument("--master", default=None, help="override spark master")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from linkgraph.session import get_spark
    from linkgraph.operators.components import connected_components
    from linkgraph.operators.dedup import minhash_lsh
    from linkgraph.operators.textstats import (
        language_id,
        quality_score,
        token_count,
    )

    spark = (
        get_spark(app_name="linkgraph-corpus", master=args.master)
        if args.master
        else get_spark(app_name="linkgraph-corpus")
    )
    t0 = time.monotonic()
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()
    stages: dict[str, int] = {"input": n_in}
    # each stage boundary is persisted so the per-stage count, the gate
    # rollup, and the final write do NOT re-execute the upstream joins
    # (exact-dedup semi-join, LSH candidate self-join, near-dup anti-join)
    pinned: list = []

    def _pin(df):
        df = df.persist()
        pinned.append(df)
        return df

    if not args.skip_exact:
        keep = (
            docs.select("doc_id", F.md5("text").alias("_h"))
            .groupBy("_h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        docs = _pin(docs.join(keep, "doc_id", "left_semi"))
        stages["after_exact_dedup"] = docs.count()

    if not args.skip_neardup:
        pairs = minhash_lsh(
            docs,
            num_hashes=args.num_hashes,
            bands=args.bands,
            shingle_len=args.shingle_len,
        ).filter(F.col("est_jaccard") >= args.near_threshold)
        comp = connected_components(
            pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        ).components
        canon = comp.groupBy("component").agg(F.min("node").alias("_keep"))
        drop = (
            comp.join(canon, "component")
            .filter(F.col("node") != F.col("_keep"))
            .select(F.col("node").alias("doc_id"))
        )
        docs = _pin(docs.join(drop, "doc_id", "left_anti"))
        stages["after_neardup"] = docs.count()

    reasons = {}
    if not args.skip_gates:
        j = token_count(language_id(quality_score(docs)))
        reason = (
            F.when(F.col("lang_pred") != args.lang, "non_target_lang")
            .when(F.col("n_tokens") < args.min_tokens, "too_short")
            .when(F.col("n_tokens") > args.max_tokens, "too_long")
            .when(F.col("quality") < args.min_quality, "low_quality")
            .otherwise("ok")
        )
        j = j.withColumn("_reason", reason)
        reasons = {
            r["_reason"]: r["n"]
            for r in j.groupBy("_reason").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        docs = _pin(j.filter(F.col("_reason") == "ok").drop("_reason"))
        stages["after_gates"] = docs.count()

    if args.output:
        docs.write.mode("overwrite").parquet(args.output)
    for df in pinned:
        df.unpersist()

    out = {
        "stages": stages,
        "gate_reasons": reasons,
        "kept": stages[list(stages)[-1]],
        "kept_frac": round(stages[list(stages)[-1]] / max(1, n_in), 4),
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
