#!/usr/bin/env python
"""Benchmark harness (driver contract): headline index-build + query
latencies at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "build": {...}, "bm25_latency": {"p50": ..., "p95": ...}}

Methodology (pinned after the r3 build-number regression turned out
to be cold-start noise): EVERY headline number is a min-of-N — 3 reps
for sub-2s operations, 2 for the multi-second dedup/contamination
passes, and the BUILD itself runs 3× into fresh paths (first run
after boot pays cold page cache + JIT, measured ~2.5× the warm
number on this VM). p50/p95 are still computed over ALL bm25 samples
(they describe the latency distribution, not peak capability).
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

    # index build: min-of-3 into fresh paths (the last one is kept
    # and served below). Rep 0 absorbs cold page cache / codegen.
    build_secs = []
    idx_path = None
    m = None
    for rep in range(3):
        if idx_path is not None:
            shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)
        idx_path = tempfile.mkdtemp(prefix="idzebra_bench_") + "/idx"
        t0 = time.perf_counter()
        m = build_index(spark, docs, idx_path, shard_size=512, block_size=128)
        build_secs.append(time.perf_counter() - t0)
    build_sec = min(build_secs)
    timings["build_index"] = round(build_sec, 4)
    timings["build_index_cold"] = round(build_secs[0], 4)

    idx = SegmentIndex(spark, idx_path, cache_hot=True)  # serving mode
    idx.stats()
    idx.topk(["data"], 10, "or").collect()  # warm python workers / JIT

    def run(name, fn, reps=3):
        best = None
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            dt = time.perf_counter() - t
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        return best

    # headline queries over the segment/WAND engine + the brute plan
    bm25_set = [
        ("q_wand_single", lambda: idx.topk(["merge"], 10, "or").collect()),
        ("q_wand_or2", lambda: idx.topk(["merge", "sort"], 10, "or").collect()),
        ("q_wand_or_highdf",
         lambda: idx.topk(["the", "data", "key"], 10, "or").collect()),
        ("q_wand_and2",
         lambda: idx.topk(["spark", "query"], 10, "and").collect()),
        ("q_wand_and3",
         lambda: idx.topk(["merge", "sort", "scan"], 10, "and").collect()),
        ("q_wand_not",
         lambda: idx.topk(["merge", "sort"], 10, "or",
                          not_terms=["slow"]).collect()),
    ]
    lat: list[float] = []
    for name, fn in bm25_set:
        best = None
        for rep in range(3):
            t = time.perf_counter()
            fn()
            dt = time.perf_counter() - t
            lat.append(dt)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[min(len(lat) - 1, int(len(lat) * 0.95))]

    # batched multi-query throughput: the same 16 mixed queries run
    # one-job-each (serial) vs ONE cogrouped topk_many job — the
    # serving-throughput headline (reference: ~20 q/s sustained,
    # doc/introduction.xml:588-595; single-job latency here is floored
    # by Spark scheduling, the batch amortizes it)
    batch_queries = {}
    base_terms = ["merge", "sort", "scan", "spark", "query", "data",
                  "key", "value", "table", "index", "group", "window",
                  "batch", "join", "filter", "count"]
    for i in range(16):
        t1, t2 = base_terms[i], base_terms[(i + 3) % 16]
        batch_queries[f"q{i:02d}"] = {
            "terms": [t1, t2], "mode": "and" if i % 4 == 0 else "or",
        }
    serial_sec = None
    for _ in range(2):  # min-of-2 (multi-second op, per methodology)
        t = time.perf_counter()
        for q in batch_queries.values():
            idx.topk(q["terms"], 10, q["mode"]).collect()
        dt = time.perf_counter() - t
        serial_sec = dt if serial_sec is None else min(serial_sec, dt)
    timings["q_batch16_serial"] = round(serial_sec, 4)
    batched_sec = run("q_batch16_batched",
                      lambda: idx.topk_many(batch_queries, 10).collect())
    batch_qps = round(16.0 / batched_sec, 2)

    # sustained shape: 64 / 256 distinct queries in one job — the job
    # floor amortizes with batch size (kernel work grows linearly);
    # the 256 point shows the asymptotic q/s the serving path reaches
    # once the per-job constant stops mattering
    def make_batch(n):
        out = {}
        for i in range(n):
            t1 = base_terms[i % 16]
            t2 = base_terms[(i * 5 + 7) % 16]
            t3 = base_terms[(i * 11 + 3) % 16]
            terms = [t1, t2] if i % 2 else [t1, t2, t3]
            out[f"b{i:03d}"] = {
                "terms": terms, "mode": "and" if i % 8 == 0 else "or",
            }
        return out

    big64, big256 = make_batch(64), make_batch(256)
    batch64_sec = run("q_batch64_batched",
                      lambda: idx.topk_many(big64, 10).collect())
    batch64_qps = round(64.0 / batch64_sec, 2)
    batch256_sec = run("q_batch256_batched",
                       lambda: idx.topk_many(big256, 10).collect())
    batch256_qps = round(256.0 / batch256_sec, 2)

    # structured batch: 8 rset DAGs (phrase/prox/truncation/boolean)
    # in ONE search_tree_many pass vs one search_tree job each
    from idzebra_spark.plans.query import parse as _parse
    tree_batch = {}
    for i in range(8):
        t1 = base_terms[i % 16]
        t2 = base_terms[(i * 7 + 5) % 16]
        q = [f'"{t1} {t2}"', f"{t1} NEAR/3 {t2}",
             f"({t1} OR {t2}) AND scan", f"sc* AND {t2}"][i % 4]
        tree_batch[f"t{i}"] = _parse(q).root.to_rset_tree()
    tree_serial_sec = None
    for _ in range(2):
        t = time.perf_counter()
        for tr in tree_batch.values():
            idx.search_tree(tr, 10).collect()
        dt = time.perf_counter() - t
        tree_serial_sec = dt if tree_serial_sec is None \
            else min(tree_serial_sec, dt)
    timings["q_tree8_serial"] = round(tree_serial_sec, 4)
    run("q_tree8_batched",
        lambda: idx.search_tree_many(tree_batch, 10).collect())

    run("q_phrase_segment", lambda: idx.phrase(["batch", "batch"], 10).collect())
    run("q_phrase_highdf", lambda: idx.phrase(["value", "table"], 10).collect())

    def _parsed():
        from idzebra_spark.plans.query import parse
        q = parse('(merge OR sort) AND scan NOT "batch batch"')
        idx.search_tree(q.root.to_rset_tree(), 10).collect()

    run("q_wand_parsed", _parsed)
    run("q_trunc_prefix",
        lambda: idx.eval_tree(("prefix", "sc")).count())
    run("q_count_or", lambda: idx.count(["merge", "sort"], "or"))
    run("q_brute_or2",
        lambda: bm25_topk(docs, ["merge", "sort"], 10, "or").collect())
    run("q_dictionary", lambda: idx.dictionary().orderBy("term").limit(100).collect())

    def _dedup():
        from idzebra_spark.operators.dedup import minhash_lsh_pairs
        minhash_lsh_pairs(docs, threshold=0.5).collect()

    run("q_dedup_minhash_lsh", _dedup, reps=2)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def _qvec():
        from pyspark.sql import functions as F
        return [float(x) for x in
                emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]

    qv = _qvec()

    def _dedup_emb():
        from idzebra_spark.operators.similarity import embedding_dup_pairs
        embedding_dup_pairs(emb, threshold=0.4, n_planes=6).collect()

    run("q_dedup_embedding", _dedup_emb, reps=2)

    def _cosine():
        from idzebra_spark.operators.similarity import cosine_topk
        cosine_topk(emb, qv, 10, exclude_id=0).collect()

    run("q_sim_cosine", _cosine)

    def _lsh():
        from idzebra_spark.operators.similarity import (
            build_lsh_index, lsh_topk_indexed)
        lsh_path = tempfile.mkdtemp(prefix="idzebra_bench_lsh_") + "/lsh"
        t = time.perf_counter()
        build_lsh_index(emb, lsh_path, n_planes=6)
        timings["build_lsh_index"] = round(time.perf_counter() - t, 4)
        run("q_sim_lsh_indexed",
            lambda: lsh_topk_indexed(spark, lsh_path, qv, 10, n_planes=6,
                                     exclude_id=0).collect())
        shutil.rmtree(os.path.dirname(lsh_path), ignore_errors=True)

    _lsh()

    def _contamination():
        from pyspark.sql import functions as F

        from idzebra_spark.operators.dedup import cross_contamination
        test = docs.where(F.col("doc_id") % 5 == 0)
        train = docs.where(F.col("doc_id") % 5 != 0)
        cross_contamination(test, train, n=5, threshold=0.3).collect()

    run("q_dedup_contamination", _contamination, reps=2)

    def _cosine_q8():
        from idzebra_spark.operators.similarity import cosine_topk_q8
        cosine_topk_q8(emb, qv, 10, exclude_id=0).collect()

    run("q_sim_cosine_q8", _cosine_q8, reps=2)

    def _q8_indexed():
        from idzebra_spark.operators.similarity import (
            build_q8_index, cosine_topk_q8_indexed)
        q8_path = tempfile.mkdtemp(prefix="idzebra_bench_q8_") + "/q8"
        t = time.perf_counter()
        build_q8_index(emb, q8_path)
        timings["build_q8_index"] = round(time.perf_counter() - t, 4)
        run("q_sim_q8_indexed",
            lambda: cosine_topk_q8_indexed(spark, q8_path, qv, 10,
                                           exclude_id=0).collect())
        shutil.rmtree(os.path.dirname(q8_path), ignore_errors=True)

    _q8_indexed()

    total = time.perf_counter() - t_all
    out = {
        "metric": "index-build + BM25 top-k latency (segment WAND engine)",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "bm25_latency": {"p50": round(p50, 4), "p95": round(p95, 4),
                         "samples": len(lat)},
        "batch_throughput": {
            "queries": 16,
            "serial_sec": round(serial_sec, 4),
            "batched_sec": round(batched_sec, 4),
            "batched_qps": batch_qps,
            "speedup": round(serial_sec / batched_sec, 2),
            "batch64_sec": round(batch64_sec, 4),
            "batch64_qps": batch64_qps,
            "batch256_sec": round(batch256_sec, 4),
            "batch256_qps": batch256_qps,
        },
        "build": {
            "docs": int(m["docs"] or 0),
            "postings": int(m["postings"] or 0),
            "bytes_compressed": int(m["bytes"] or 0),
            "docs_per_sec": round(n_docs / build_sec, 2),
            "postings_per_sec": round(float(m["postings"] or 0) / build_sec, 2),
            "reps": [round(x, 4) for x in build_secs],
        },
    }
    shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
