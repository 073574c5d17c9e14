#!/usr/bin/env python
"""Capacity probe: build + serve a 500k-doc / ~107M-posting index on
local[32] — the repo's robustness datapoint at the largest corpus the
sandbox comfortably holds (BENCH/capacity.md). Not a scaling
measurement (this VM's memory bandwidth caps multi-core throughput;
see BENCH/BASELINE.md) — it answers "does the engine still behave at
20x the bench corpus, including worst-case ubiquitous-term serving".

Usage: python scripts/capacity_probe.py [--docs 500000] [--no-cache-source]
``--no-cache-source`` exercises the documented 100 TB build path
(build_index(cache_source=False): re-read the column-pruned scan
instead of pinning the corpus in storage memory).
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


def main() -> None:
    docs_n = 500_000
    if "--docs" in sys.argv:
        docs_n = int(sys.argv[sys.argv.index("--docs") + 1])
    cache_source = "--no-cache-source" not in sys.argv

    from idzebra_spark.operators.segment import build_index
    from idzebra_spark.operators.wand import SegmentIndex
    from idzebra_spark.session import get_spark
    from idzebra_spark.sources.corpus import synth_source_files

    spark = get_spark("capacity-probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_source_files(spark, docs_n).select("doc_id", "content")
    if cache_source:
        corpus = corpus.cache()
        corpus.count()
    # (with --no-cache-source the synthetic generator runs inside the
    # build's two scans, like re-reading a pruned parquet scan would)

    path = tempfile.mkdtemp(prefix="capacity_") + "/idx"
    t0 = time.perf_counter()
    m = build_index(spark, corpus, path, text_col="content",
                    shard_size=2048, block_size=128,
                    cache_source=cache_source)
    build_sec = time.perf_counter() - t0
    if cache_source:
        corpus.unpersist()

    idx = SegmentIndex(spark, path, cache_hot=True)
    idx.stats()
    idx.topk(["buffer"], 10, "or").collect()  # warm

    out = {
        "docs": docs_n,
        "cache_source": cache_source,
        "build_sec": round(build_sec, 1),
        "docs_per_sec": round(docs_n / build_sec, 1),
        "postings": int(m["postings"]),
        "bytes_compressed": int(m["bytes"]),
    }

    def best(fn, reps=3):
        b = None
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            d = time.perf_counter() - t
            b = d if b is None else min(b, d)
        return round(b, 3)

    # worst-case single queries: ubiquitous terms (~95% df)
    out["q_and_highdf_sec"] = best(
        lambda: idx.topk(["int", "return"], 10, "and").collect())
    out["q_or3_sec"] = best(
        lambda: idx.topk(["static", "void", "hash"], 10, "or").collect())
    out["q_phrase_highdf_sec"] = best(
        lambda: idx.phrase(["int", "return"], 10).collect())

    # worst-case batched serving: 64 mixed queries, ALL over
    # ubiquitous terms
    base = ["int", "return", "static", "void", "char", "const",
            "struct", "if", "for", "while", "break", "case",
            "sizeof", "else", "long", "unsigned"]
    big = {}
    for i in range(64):
        t1, t2 = base[i % 16], base[(i * 5 + 7) % 16]
        big[f"b{i:02d}"] = {"terms": [t1, t2],
                            "mode": "and" if i % 8 == 0 else "or"}
    bsec = best(lambda: idx.topk_many(big, 10).collect())
    out["batch64_sec"] = bsec
    out["batch64_qps"] = round(64.0 / bsec, 1)

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
