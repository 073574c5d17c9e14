#!/usr/bin/env python
"""spark-submit entry point (north rule: 'launched via spark-submit
--py-files on multi-executor clusters').

Package + launch:

    cd /root/repo && zip -r /tmp/idzebra_spark.zip idzebra_spark
    spark-submit --py-files /tmp/idzebra_spark.zip \
        scripts/submit_job.py build \
        --input  /path/to/source_files_parquet_or_iceberg \
        --index  /path/to/index \
        [--text-col content --shard-size 4096 --resume]

    spark-submit --py-files /tmp/idzebra_spark.zip \
        scripts/submit_job.py query \
        --index /path/to/index --terms merge sort --mode or --k 10

    spark-submit ... scripts/submit_job.py update \
        --input /path/to/new_snapshot --index /path/to/index

On a cluster, DON'T pass --master local[...]; spark-submit's own
--master/--num-executors control placement. The code contains no
local-mode assumptions: all parallelism comes from the data layout
(shards) and standard shuffles.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "update", "query", "phrase",
                                    "scan", "count"])
    ap.add_argument("--input")
    ap.add_argument("--index", required=True)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--id-col", default=None,
                    help="existing docid column; omit to derive dense "
                         "ids from --identity-cols")
    ap.add_argument("--identity-cols", nargs="*",
                    default=["repo", "path", "commit"])
    ap.add_argument("--shard-size", type=int, default=4096)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--terms", nargs="*", default=[])
    ap.add_argument("--not-terms", nargs="*", default=[])
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"idzebra-{args.cmd}").getOrCreate()

    if args.cmd in ("build", "update"):
        src = spark.read.parquet(args.input)
        if args.id_col is None and "doc_id" not in src.columns:
            from idzebra_spark.operators.ids import assign_doc_ids

            src = assign_doc_ids(src, args.identity_cols)
            id_col = "doc_id"
        else:
            id_col = args.id_col or "doc_id"
        from idzebra_spark.operators.segment import build_index, update_index

        fn = build_index if args.cmd == "build" else update_index
        m = fn(
            spark, src, args.index,
            text_col=args.text_col, id_col=id_col,
            shard_size=args.shard_size, block_size=args.block_size,
            store_positions=not args.no_positions,
        )
        print(json.dumps({k: (int(v) if v is not None and not isinstance(v, str)
                              else v) for k, v in m.items()}))
        return

    from idzebra_spark.operators.wand import SegmentIndex

    idx = SegmentIndex(spark, args.index)
    if args.cmd == "query":
        rows = idx.topk(args.terms, args.k, args.mode,
                        not_terms=args.not_terms or None).collect()
        print(json.dumps([[r.doc_id, r.score_milli] for r in rows]))
    elif args.cmd == "phrase":
        rows = idx.phrase(args.terms, args.k).collect()
        print(json.dumps([[r.doc_id, r.n_occ] for r in rows]))
    elif args.cmd == "count":
        print(idx.count(args.terms, args.mode))
    elif args.cmd == "scan":
        from pyspark.sql import functions as F

        rows = (
            idx.dictionary()
            .where(F.col("term") >= args.terms[0])
            .orderBy("term").limit(args.k).collect()
        )
        print(json.dumps([[r.term, int(r.df)] for r in rows]))


if __name__ == "__main__":
    main()
