#!/usr/bin/env python
"""Match-key update at capacity (r5 VERDICT task #6).

`update_by_matchkey` is oracle-checked at sf-small only; this probe
runs the match-spec path against a 1M-doc register: build with
match_cols=(repo,path), then apply a RE-KEYED crawl wave — every
external id shifts by +N (a full re-crawl handing out fresh ids) while
a contiguous 1% of records change content. Zebra semantics
(extract.c:927-1000): identity resolves through the match key, so the
unchanged 99% keep their sysno and only the shards holding changed
records rebuild. The match-key path's extra window + full-outer join
is the only new shuffle vs the sha-diff path — this measures it at
register scale.

Usage: python scripts/matchkey_capacity.py [--docs 1000000]
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
    docs_n = 1_000_000
    if "--docs" in sys.argv:
        docs_n = int(sys.argv[sys.argv.index("--docs") + 1])
    changed_n = max(docs_n // 100, 1)          # contiguous 1% wave

    from pyspark.sql import functions as F

    from idzebra_spark.operators.segment import build_index, update_index
    from idzebra_spark.operators.wand import SegmentIndex
    from idzebra_spark.session import get_spark
    from idzebra_spark.sources.corpus import synth_source_files

    spark = get_spark("matchkey-capacity")
    spark.sparkContext.setLogLevel("ERROR")
    base = synth_source_files(spark, docs_n).select(
        "doc_id", "repo", "path", "content").cache()
    base.count()

    idx_path = tempfile.mkdtemp(prefix="mkcap_") + "/idx"
    t0 = time.perf_counter()
    m0 = build_index(spark, base, idx_path, text_col="content",
                     shard_size=2048, block_size=128,
                     match_cols=["repo", "path"])
    build_sec = time.perf_counter() - t0

    # re-keyed crawl: every external id += docs_n; content changes for
    # the first `changed_n` records only (contiguous → bounded shards)
    wave = base.select(
        (F.col("doc_id") + F.lit(docs_n)).alias("doc_id"),
        "repo", "path",
        F.when(F.col("doc_id") < changed_n,
               F.concat(F.col("content"), F.lit(" changed wave")))
        .otherwise(F.col("content")).alias("content"),
    )
    t0 = time.perf_counter()
    m1 = update_index(spark, wave, idx_path, text_col="content",
                      match_cols=["repo", "path"])
    update_sec = time.perf_counter() - t0

    # post-update sanity: register count unchanged, changed docs
    # searchable under their ORIGINAL sysnos
    idx = SegmentIndex(spark, idx_path)
    n_docs, _ = idx.stats()
    hits = idx.topk(["changed", "wave"], 10, "and").collect()

    out = {
        "docs": docs_n,
        "changed_docs": changed_n,
        "build_sec": round(build_sec, 1),
        "build_docs_per_sec": round(docs_n / build_sec, 1),
        "postings": int(m0["postings"]),
        "update_sec": round(update_sec, 1),
        "changed_shards": int(m1["changed_shards"]),
        "total_shards": int(m0["shards"]),
        "reindexed_docs": int(m1["docs"]),
        "post_update_n_docs": int(n_docs),
        "changed_docs_searchable": len(hits) == 10,
        "sysno_preserved": bool(hits and all(
            r["doc_id"] < docs_n for r in hits)),
    }
    shutil.rmtree(os.path.dirname(idx_path), ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
