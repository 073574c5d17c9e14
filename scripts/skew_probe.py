#!/usr/bin/env python
"""Skew-adversarial capacity probe (r5 VERDICT stretch #8).

SURVEY §7 names term-frequency skew as the one problem Zebra's
single-process design never had to solve. The existing capacity runs
use a Zipf-but-benign vocabulary; this probe rebuilds the synthetic
corpus with ONE pathological head term present in 100% of docs at
tf≈50 (appended to every doc) and records build + worst-case serving,
to show the docid-range sharding absorbs a term that would be a hot
shuffle key in a term-partitioned design.

Usage: python scripts/skew_probe.py [--docs 1000000]
Prints one JSON line; paste into BENCH/capacity.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_TF = 50


def main() -> None:
    docs_n = 1_000_000
    if "--docs" in sys.argv:
        docs_n = int(sys.argv[sys.argv.index("--docs") + 1])

    from pyspark.sql import functions as F

    from idzebra_spark.operators.segment import build_index
    from idzebra_spark.operators.wand import SegmentIndex
    from idzebra_spark.session import get_spark
    from idzebra_spark.sources.corpus import synth_source_files

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # every doc gets ' hotterm' × HOT_TF appended: df = N, cf = N·50 —
    # a head term ~25× heavier than 'int'/'return' in the benign corpus
    corpus = synth_source_files(spark, docs_n).select(
        "doc_id",
        F.concat(F.col("content"),
                 F.lit(" hotterm" * HOT_TF)).alias("content"),
    )

    path = tempfile.mkdtemp(prefix="skew_") + "/idx"
    t0 = time.perf_counter()
    m = build_index(spark, corpus, path, text_col="content",
                    shard_size=2048, block_size=128,
                    cache_source=False)
    build_sec = time.perf_counter() - t0

    idx = SegmentIndex(spark, path, cache_hot=True)
    idx.stats()
    idx.topk(["buffer"], 10, "or").collect()  # warm

    def best(fn, reps=3):
        b = None
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            dt = time.perf_counter() - t
            b = dt if b is None else min(b, dt)
        return round(b, 3)

    # the adversarial queries: the 100%-df term alone, AND'd with the
    # benign ubiquitous pair, and in a phrase with itself (tf≈50 → 49
    # adjacent pairs per doc — the positional worst case)
    q_hot = best(lambda: idx.topk(["hotterm"], 10, "or").collect())
    q_hot_and = best(lambda: idx.topk(
        ["hotterm", "int", "return"], 10, "and").collect())
    q_hot_phrase = best(lambda: idx.phrase(
        ["hotterm", "hotterm"], 10).collect())

    base = ["merge", "block", "parse", "heap", "rotate", "static",
            "void", "hash", "int", "return", "buffer", "node",
            "index", "list", "tree", "sort"]
    batch = {}
    for i in range(64):
        batch[f"b{i:03d}"] = {
            "terms": ["hotterm", base[i % 16]],
            "mode": "and" if i % 4 == 0 else "or"}
    idx.topk_many({"w": {"terms": ["buffer"], "mode": "or"}}, 10).collect()
    b64 = best(lambda: idx.topk_many(batch, 10).collect(), reps=2)

    # straggler evidence: per-shard block-row spread for the hot term
    blk = idx.blocks.where(F.col("term") == "hotterm") \
        .groupBy("shard").agg(F.sum("n_docs").alias("p"))
    rows = [r["p"] for r in blk.collect()]
    spread = (max(rows) / (sum(rows) / len(rows))) if rows else None

    out = {
        "docs": docs_n, "hot_tf": HOT_TF,
        "build_sec": round(build_sec, 1),
        "docs_per_sec": round(docs_n / build_sec, 1),
        "postings": int(m["postings"]),
        "bytes_compressed": int(m["bytes"]),
        "q_hot_sec": q_hot,
        "q_hot_and_ubiq_sec": q_hot_and,
        "q_hot_selfphrase_sec": q_hot_phrase,
        "batch64_hot_sec": b64,
        "batch64_hot_qps": round(64.0 / b64, 1),
        "hot_term_shards": len(rows),
        "hot_term_max_over_mean_shard_postings": round(spread, 3)
        if spread else None,
    }
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
