"""Structured Streaming windowed aggregation with watermarked late
data, and a custom stateful operator via applyInPandasWithState.

The reference has no streaming constructs (SURVEY §2.7) — these cover
the brief's training-pipeline streaming surface: event-time tumbling
windows for incremental stats, and cross-batch stateful dedup (the
streaming twin of the doc_store-mirror update path).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "event_windows",
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """readStream → watermark → tumbling-window count per event_type →
    memory sink. UPDATE output mode: watermarks only drop late rows in
    update/append mode (complete mode retains all state and ignores
    them), so this is the mode where the documented late-data policy
    actually holds. The memory sink accumulates one row per window
    UPDATE; the return collapses to the latest version per window
    (counts grow monotonically, so max_by(n) is the final value).

    Coverage caveat: the memory sink is per-RUN. On a RESUMED call
    against an existing checkpoint, windows with no new rows emit no
    update and are absent from the returned rollup — the return covers
    only windows touched in the current run. A caller that needs the
    full window set across runs should merge the rollup into a
    persistent sink (parquet keyed by (win_start, event_type)) or use
    a fresh checkpoint per invocation (what the tests do)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "sum_value"
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(query_name)
        .groupBy("win_start", "event_type")
        .agg(F.max("n").alias("n"),
             F.max_by("sum_value", "n").alias("sum_value"))
    )


DEDUP_OUT_SCHEMA = "doc_id long, text string"
DEDUP_STATE_SCHEMA = "seen boolean"


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """First BATCH wins across batches (GroupState); within a batch
    the surviving row is chosen DETERMINISTICALLY (greatest content
    sha) — head(1) of an unordered Arrow chunk could flip between
    runs/parallelism levels. Groups are duplicates of ONE doc_id, so
    the per-row loop is tiny."""
    import hashlib

    if state.exists:
        return iter(())
    state.update((True,))
    best = None
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            h = hashlib.sha256((row["text"] or "").encode()).hexdigest()
            if best is None or h > best[0]:
                best = (h, row["doc_id"], row["text"])
    if best is not None:
        yield pd.DataFrame({"doc_id": [best[1]], "text": [best[2]]})


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
):
    """Cross-micro-batch stateful dedup by doc_id — first occurrence
    wins, later duplicates (same or later batches) drop. GroupState
    keyed by doc_id via applyInPandasWithState; state survives between
    runs through the checkpoint. Output appends to a parquet sink
    (memory sinks don't support checkpoint recovery). Returns the
    deduped output DataFrame."""
    stream = (
        spark.readStream.schema(
            T.StructType([
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ])
        ).parquet(input_dir)
    )
    out = stream.groupBy("doc_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(output_dir)
