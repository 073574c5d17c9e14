"""Streaming windowed aggregation (watermark) and stateful dedup."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_windowed_event_counts_match_batch(spark, sf_dir, tmp_path_factory):
    from idzebra_spark.streaming.windows import windowed_event_counts

    root = tmp_path_factory.mktemp("win")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.write.mode("overwrite").parquet(str(root / "in"))

    got = windowed_event_counts(
        spark, str(root / "in"), str(root / "ckpt"),
        query_name="evt_win_t",
    )
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    g = {(r.win_start, r.event_type): r.n for r in got.collect()}
    w = {(r.win_start, r.event_type): r.n for r in want.collect()}
    assert g == w and len(g) > 0


def test_stateful_dedup_across_batches(spark, tmp_path_factory):
    from idzebra_spark.streaming.windows import stream_dedup

    root = tmp_path_factory.mktemp("dedup")
    in_dir, ckpt, out_dir = str(root / "in"), str(root / "ckpt"), str(root / "out")

    spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b-dup-same-batch"), (3, "c")],
        ["doc_id", "text"],
    ).write.mode("append").parquet(in_dir)
    out1 = stream_dedup(spark, in_dir, ckpt, out_dir)
    assert sorted(r.doc_id for r in out1.collect()) == [1, 2, 3]

    # batch 2: overlaps 2 and 3; only 4 is new — state persisted via
    # the checkpoint drops the replays
    spark.createDataFrame(
        [(2, "b-again"), (3, "c-again"), (4, "d")], ["doc_id", "text"]
    ).write.mode("append").parquet(in_dir)
    out2 = stream_dedup(spark, in_dir, ckpt, out_dir)
    assert sorted(r.doc_id for r in out2.collect()) == [1, 2, 3, 4]


def test_fold_batch_replay_idempotent(spark, tmp_path_factory):
    """foreachBatch is at-least-once: replaying a batch with the same
    batch_id (crash after mirror write, before checkpoint commit) must
    not duplicate (doc_id, ingest_seq) rows or double tf/doclen."""
    from idzebra_spark.operators.wand import SegmentIndex
    from idzebra_spark.streaming.ingest import doc_store_snapshot, fold_batch

    root = tmp_path_factory.mktemp("replay")
    index_path = str(root / "idx")
    batch = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma delta")], ["doc_id", "text"]
    )
    fold_batch(batch, 0, index_path, shard_size=64, block_size=32)
    snap1 = doc_store_snapshot(spark, index_path)
    assert snap1.count() == 2
    # crash-replay: same batch_id again
    fold_batch(batch, 0, index_path, shard_size=64, block_size=32)
    snap2 = doc_store_snapshot(spark, index_path)
    assert snap2.count() == 2  # no duplicate mirror rows
    idx = SegmentIndex(spark, index_path)
    n_docs, avgdl = idx.stats()
    assert n_docs == 2
    info = idx.lookup_terms(["alpha"])
    assert info["alpha"]["cf"] == 2  # tf not doubled
