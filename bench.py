#!/usr/bin/env python
"""Benchmark harness (driver contract): headline index-build + query
latencies at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "build": {docs, postings, bytes, docs_per_sec, postings_per_sec}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    from idzebra_spark.session import get_spark
    from idzebra_spark.operators.segment import build_index
    from idzebra_spark.operators.wand import SegmentIndex
    from idzebra_spark.operators.bruteforce import bm25_topk
    from idzebra_spark.sources.corpus import load_documents

    spark = get_spark("idzebra-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_documents(spark, sf_dir).cache()
    n_docs = docs.count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()

    idx_path = tempfile.mkdtemp(prefix="idzebra_bench_") + "/idx"
    t0 = time.perf_counter()
    m = build_index(spark, docs, idx_path, shard_size=512, block_size=128)
    build_sec = time.perf_counter() - t0
    timings["build_index"] = round(build_sec, 4)

    idx = SegmentIndex(spark, idx_path)
    idx.stats()  # warm metadata

    def run(name, fn):
        t = time.perf_counter()
        rows = fn().collect()
        timings[name] = round(time.perf_counter() - t, 4)
        return rows

    # headline queries: single-term, high-df OR (theta pruning),
    # selective AND, high-df AND, brute-force comparison point
    run("q_wand_single", lambda: idx.topk(["merge"], 10, "or"))
    run("q_wand_or2", lambda: idx.topk(["merge", "sort"], 10, "or"))
    run("q_wand_or_highdf", lambda: idx.topk(["the", "data", "key"], 10, "or"))
    run("q_wand_and2", lambda: idx.topk(["spark", "query"], 10, "and"))
    run("q_wand_and3", lambda: idx.topk(["merge", "sort", "scan"], 10, "and"))
    run("q_brute_or2", lambda: bm25_topk(docs, ["merge", "sort"], 10, "or"))
    t = time.perf_counter()
    idx.count(["merge", "sort"], "or")
    timings["q_count_or"] = round(time.perf_counter() - t, 4)
    run("q_dictionary", lambda: idx.dictionary().orderBy("term").limit(100))

    total = time.perf_counter() - t_all
    out = {
        "metric": "index-build + BM25 top-k latency (segment WAND engine)",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "build": {
            "docs": int(m["docs"] or 0),
            "postings": int(m["postings"] or 0),
            "bytes_compressed": int(m["bytes"] or 0),
            "docs_per_sec": round(n_docs / build_sec, 2),
            "postings_per_sec": round(float(m["postings"] or 0) / build_sec, 2),
        },
    }
    shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
