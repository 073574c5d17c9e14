"""Dense docid assignment — Zebra's sysno counter, distributed.

Zebra assigns each record a monotone ``sysno`` from a single counter
(/root/reference/index/recindex.h:31-39). A global counter doesn't
distribute; the Spark-scale equivalent is the classic two-pass
zipWithIndex shape, expressed with DataFrame ops:

1. range-repartition + sort by the identity key (deterministic global
   order, no single-partition window);
2. count rows per partition (one tiny job);
3. per-partition dense ids = partition offset + local row number
   (mapInPandas, Arrow-batched, no per-row Python).

Ids are dense 0..N-1 and deterministic for a given key order — exactly
what the docid-range sharding of the segment builder wants.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_doc_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense, deterministic ``id_col`` ordered by ``order_cols``."""
    spark = df.sparkSession
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    # cache: passes 1 and 2 must see the identical partitioning (range
    # partitioner samples; caching pins the realized layout).
    # order_cols should be a unique identity key so the within-
    # partition order is total and deterministic.
    parted = df.repartitionByRange(num_partitions, *[
        F.col(c) for c in order_cols
    ]).sortWithinPartitions(*order_cols).cache()

    # pass 1: rows per partition
    counts = (
        parted.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").count().collect()
    )
    sizes = {r["_pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    # pass 2: offset + local row number per Arrow batch
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_col, T.LongType())]
    )
    b_offsets = spark.sparkContext.broadcast(offsets)

    def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = b_offsets.value.get(pid, 0)
        for pdf in it:
            pdf = pdf.copy()
            pdf[id_col] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    return parted.mapInPandas(add_ids, out_schema)


def index_source_files(
    spark,
    src: DataFrame,
    path: str,
    *,
    shard_size: int = 4096,
    block_size: int = 128,
    store_positions: bool = True,
) -> dict:
    """End-to-end entry for the BASELINE input_hint table shape
    ``(repo, path, commit, lang, content)``: assign dense docids by the
    (repo, path, commit) identity, then build the segment index over
    ``content``. Returns build metrics."""
    from idzebra_spark.operators.segment import build_index

    with_ids = assign_doc_ids(src, ["repo", "path", "commit"])
    return build_index(
        spark, with_ids, path,
        text_col="content", id_col="doc_id",
        shard_size=shard_size, block_size=block_size,
        store_positions=store_positions,
    )
