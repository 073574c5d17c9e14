"""Segment builder: the distributed successor of Zebra's
dict + ISAM-B register build.

Zebra's write path (SURVEY.md §2.5) is: extract keys → 8 MB sorted
runs (/root/reference/index/key_block.c:259-368) → N-way heap merge
into a term dictionary + per-term B-tree of delta+varint-compressed
postings (/root/reference/index/kinput.c:709-799,
/root/reference/isamb/isamb.c:1266-1330, codec
/root/reference/util/it_key.c:160-254), committed via shadow pages
(/root/reference/bfile/commit.c).

The Spark-first redesign is **document-sharded** (the architecture
every horizontally-scaled search engine converges on): docids are
range-bucketed into shards of ``shard_size`` docs; one shuffle
(groupBy shard) builds a complete mini-index per shard inside a single
Arrow-batched kernel. Term-frequency skew ('int'/'return' in ~every
doc) is handled *structurally*: a head term's postings are split
across shards by docid range, and every shard group is bounded by
``shard_size × avgdl`` tokens regardless of term distribution — no
hot shuffle key exists. Shards align across terms, so query-time
scoring is embarrassingly parallel per shard with no overlap joins.

On-disk layout (all parquet, under ``path/``):

- ``blocks/batch=<id>/``     (term, shard, block_seq, n_docs,
                              first_docid, last_docid, max_tf, sum_tf,
                              docids_bin, tfs_bin, pos_bin)
  — posting blocks: docid-delta varint + varint tfs + per-doc-reset
  delta varint positions; first/last docid + max_tf are the
  block-max metadata driving WAND pruning. Files are range-partitioned
  and sorted by term so parquet min/max stats prune scans by term.
- ``norms/batch=<id>/``      (shard, n_docs, min_dl, docids_bin,
                              doclens_bin) — per-shard doc lengths
  (BM25 norms), the analogue of Zebra's sort/zinfo doc stats.
- ``dictionary/batch=<id>/`` (term, df, cf, max_tf, n_blocks) —
  per-batch partials; global dictionary = groupBy(term).sum — the
  second-stage merge mirroring kinput.c's heap merge.
- ``doc_meta/batch=<id>/``   (shard, doc_id, doclen, sha256) — the
  per-row content-sha256 invariant carrier.
- ``stats/batch=<id>/``      (n_docs, sum_dl, n_postings) partials.
- ``lineage/``               (batch, build_seq, shard, docs_indexed,
                              postings_emitted, bytes_compressed)
  — written LAST, one row per completed shard. A batch exists iff its
  lineage rows exist: readers resolve committed batches from lineage
  only, so a crash mid-write leaves invisible orphan files — exactly
  the shadow-page/commit semantics of bfile/commit.c, and what an
  Iceberg snapshot commit gives on a real cluster. Resume = skip
  shards already present in lineage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from idzebra_spark.functions.codec import delta_varint_encode, varint_encode
from idzebra_spark.functions.tokenizer import doc_lengths, tokenize

DEFAULT_SHARD_SIZE = 4096
DEFAULT_BLOCK_SIZE = 128

BLOCK_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("shard", T.LongType()),
    T.StructField("block_seq", T.IntegerType()),
    T.StructField("n_docs", T.IntegerType()),
    T.StructField("first_docid", T.LongType()),
    T.StructField("last_docid", T.LongType()),
    T.StructField("max_tf", T.IntegerType()),
    T.StructField("sum_tf", T.LongType()),
    T.StructField("docids_bin", T.BinaryType()),
    T.StructField("tfs_bin", T.BinaryType()),
    T.StructField("pos_bin", T.BinaryType()),
])

NORMS_SCHEMA = T.StructType([
    T.StructField("shard", T.LongType()),
    T.StructField("n_docs", T.IntegerType()),
    T.StructField("min_dl", T.IntegerType()),
    T.StructField("sum_dl", T.LongType()),
    T.StructField("docids_bin", T.BinaryType()),
    T.StructField("doclens_bin", T.BinaryType()),
])


def _build_shard_blocks(block_size: int, store_positions: bool):
    """Kernel: all posting blocks for one shard, fully vectorized.

    Input pdf: (shard, doc_id, term, pos). The per-(term,doc) grouping,
    tf counting, block chunking and codec calls are numpy — no per-row
    Python (BASELINE input_hint mandate)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame([], columns=[f.name for f in BLOCK_SCHEMA.fields])
        shard = int(pdf["shard"].iloc[0])
        codes, uniques = pd.factorize(pdf["term"], sort=True)
        doc = pdf["doc_id"].to_numpy(np.int64)
        pos = pdf["pos"].to_numpy(np.int64)
        order = np.lexsort((pos, doc, codes))
        codes, doc, pos = codes[order], doc[order], pos[order]

        # (term, doc) run boundaries → tf per posting
        new_run = np.empty(len(doc), dtype=bool)
        new_run[0] = True
        np.logical_or(codes[1:] != codes[:-1], doc[1:] != doc[:-1], out=new_run[1:])
        run_starts = np.nonzero(new_run)[0]
        run_ends = np.append(run_starts[1:], len(doc))
        tf = (run_ends - run_starts).astype(np.int64)
        run_doc = doc[run_starts]
        run_code = codes[run_starts]

        # per-term slices over the run arrays
        term_change = np.empty(len(run_code), dtype=bool)
        term_change[0] = True
        term_change[1:] = run_code[1:] != run_code[:-1]
        term_starts = np.nonzero(term_change)[0]
        term_ends = np.append(term_starts[1:], len(run_code))

        # positions with per-run delta reset (decode via tf counts)
        if store_positions:
            pos_delta = np.empty(len(pos), dtype=np.uint64)
            pos_delta[1:] = (pos[1:] - pos[:-1]).astype(np.uint64)
            pos_delta[run_starts] = pos[run_starts].astype(np.uint64)

        rows = []
        for ti in range(len(term_starts)):
            s, e = term_starts[ti], term_ends[ti]
            term = uniques[run_code[s]]
            for bi, bs in enumerate(range(s, e, block_size)):
                be = min(bs + block_size, e)
                d = run_doc[bs:be]
                t = tf[bs:be]
                if store_positions:
                    lo, hi = run_starts[bs], run_ends[be - 1]
                    pbin = varint_encode(pos_delta[lo:hi])
                else:
                    pbin = b""
                rows.append((
                    term, shard, bi, int(be - bs), int(d[0]), int(d[-1]),
                    int(t.max()), int(t.sum()),
                    delta_varint_encode(d.astype(np.uint64)),
                    varint_encode(t.astype(np.uint64)),
                    pbin,
                ))
        return pd.DataFrame(
            rows, columns=[f.name for f in BLOCK_SCHEMA.fields]
        )

    return fn


def _build_norms(pdf: pd.DataFrame) -> pd.DataFrame:
    """Kernel: per-shard norms row. Input (shard, doc_id, doclen)."""
    if len(pdf) == 0:
        return pd.DataFrame([], columns=[f.name for f in NORMS_SCHEMA.fields])
    pdf = pdf.sort_values("doc_id")
    d = pdf["doc_id"].to_numpy(np.uint64)
    dl = pdf["doclen"].to_numpy(np.uint64)
    return pd.DataFrame(
        [(
            int(pdf["shard"].iloc[0]), len(d), int(dl.min()), int(dl.sum()),
            delta_varint_encode(d), varint_encode(dl),
        )],
        columns=[f.name for f in NORMS_SCHEMA.fields],
    )


def _lineage_path(path: str) -> str:
    return f"{path}/lineage"


def read_lineage(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(_lineage_path(path))
    except Exception:
        return None


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_size: int = DEFAULT_SHARD_SIZE,
    block_size: int = DEFAULT_BLOCK_SIZE,
    store_positions: bool = True,
    resume: bool = True,
    fail_after_shards: int | None = None,
    reindex_shards: list[int] | None = None,
) -> dict:
    """Build (or resume) the segment index at ``path``.

    ``fail_after_shards`` is a test hook: restrict this batch to the
    first N pending shards, simulating a crash/partial build that a
    subsequent resume call must complete without double counting.

    ``reindex_shards``: force-rebuild exactly these shards from the
    given corpus snapshot (shard-granular copy-on-write — the update
    path; readers resolve the latest build_seq per shard). A lineage
    tombstone row (docs_indexed=0) is written even for shards whose
    docs were all deleted, so the stale batch stops being visible.
    Returns build metrics for the batch.
    """
    lineage = read_lineage(spark, path)
    build_seq = 0
    done_shards = None
    if lineage is not None:
        build_seq = lineage.agg(F.max("build_seq")).collect()[0][0] + 1
        done_shards = lineage.select("shard").distinct()
    batch = f"b{build_seq:05d}"

    src = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).withColumn("shard", (F.col("doc_id") / shard_size).cast("long"))

    if reindex_shards is not None:
        src = src.where(F.col("shard").isin(list(reindex_shards)))
    elif resume and done_shards is not None:
        src = src.join(done_shards, "shard", "left_anti")
    if fail_after_shards is not None:
        keep = [
            r["shard"]
            for r in src.select("shard").distinct()
            .orderBy("shard").limit(fail_after_shards).collect()
        ]
        src = src.where(F.col("shard").isin(keep))

    if src.isEmpty() and not reindex_shards:
        return {"batch": None, "shards": 0, "docs": 0}

    src = src.cache()

    # doc_meta: per-row sha256 invariant + doclen
    meta = (
        src.select(
            "shard", "doc_id",
            F.sha2(F.col("text"), 256).alias("sha256"),
        )
        .join(doc_lengths(src), "doc_id")
        .select("shard", "doc_id", "doclen", "sha256")
    )
    meta.withColumn("batch", F.lit(batch)).write.mode("append").partitionBy(
        "batch"
    ).parquet(f"{path}/doc_meta")

    # norms per shard
    norms = (
        meta.select("shard", "doc_id", "doclen")
        .groupBy("shard")
        .applyInPandas(_build_norms, NORMS_SCHEMA)
    )
    norms.withColumn("batch", F.lit(batch)).write.mode("append").partitionBy(
        "batch"
    ).parquet(f"{path}/norms")

    # posting blocks: ONE balanced shuffle (by shard), then a single
    # vectorized kernel per shard. Written range-partitioned+sorted by
    # term so query-term predicates prune files via parquet stats.
    toks = tokenize(src, "text", "doc_id").withColumn(
        "shard", (F.col("doc_id") / shard_size).cast("long")
    )
    blocks = toks.groupBy("shard").applyInPandas(
        _build_shard_blocks(block_size, store_positions), BLOCK_SCHEMA
    )
    (
        blocks.withColumn("batch", F.lit(batch))
        .repartitionByRange(max(spark.sparkContext.defaultParallelism, 8), "term")
        .sortWithinPartitions("term", "shard", "block_seq")
        .write.mode("append")
        .partitionBy("batch")
        .parquet(f"{path}/blocks")
    )

    # read back what was written: validates readability and gives true
    # byte accounting for lineage metrics.
    written = spark.read.parquet(f"{path}/blocks").where(F.col("batch") == batch)

    # dictionary partial (second-stage merge happens at load/query time)
    (
        written.groupBy("term")
        .agg(
            F.sum("n_docs").alias("df"),
            F.sum("sum_tf").alias("cf"),
            F.max("max_tf").alias("max_tf"),
            F.count("*").alias("n_blocks"),
        )
        .withColumn("batch", F.lit(batch))
        .repartitionByRange(8, "term")
        .sortWithinPartitions("term")
        .write.mode("append")
        .partitionBy("batch")
        .parquet(f"{path}/dictionary")
    )

    # stats partial
    (
        meta.agg(
            F.count("*").alias("n_docs"),
            F.sum("doclen").alias("sum_dl"),
        )
        .crossJoin(written.agg(F.sum("sum_tf").alias("n_postings")))
        .withColumn("batch", F.lit(batch))
        .write.mode("append")
        .partitionBy("batch")
        .parquet(f"{path}/stats")
    )

    # lineage LAST = the commit record (shadow-page flip,
    # bfile/commit.c semantics). One row per shard with metrics.
    per_shard_blocks = written.groupBy("shard").agg(
        F.sum("sum_tf").alias("postings_emitted"),
        (
            F.sum(F.length("docids_bin"))
            + F.sum(F.length("tfs_bin"))
            + F.sum(F.length("pos_bin"))
        ).alias("bytes_compressed"),
    )
    doc_counts = meta.groupBy("shard").agg(F.count("*").alias("docs_indexed"))
    if reindex_shards is not None:
        # tombstones: every requested shard gets a lineage row, even if
        # all of its docs were deleted — otherwise the stale batch
        # would keep winning at read time
        requested = spark.createDataFrame(
            [(int(s),) for s in reindex_shards], "shard long"
        )
        doc_counts = requested.join(doc_counts, "shard", "left")
    lineage_rows = (
        doc_counts
        .join(per_shard_blocks, "shard", "left")
        .na.fill(0)
        .withColumn("batch", F.lit(batch))
        .withColumn("build_seq", F.lit(build_seq))
    ).cache()
    # Materialize metrics BEFORE the lineage append: lineage_rows'
    # plan (via `src`) anti-joins a lazy read of the lineage parquet,
    # so evaluating it after the append would see this very batch as
    # already done and produce empty output. The cache also pins the
    # rows the append writes.
    out = lineage_rows.agg(
        F.count("*").alias("shards"),
        F.sum("docs_indexed").alias("docs"),
        F.sum("postings_emitted").alias("postings"),
        F.sum("bytes_compressed").alias("bytes"),
    ).collect()[0]
    lineage_rows.write.mode("append").parquet(_lineage_path(path))
    lineage_rows.unpersist()
    src.unpersist()
    return {
        "batch": batch,
        "shards": out["shards"],
        "docs": out["docs"],
        "postings": out["postings"],
        "bytes": out["bytes"],
    }


def update_index(
    spark: SparkSession,
    new_corpus: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_size: int = DEFAULT_SHARD_SIZE,
    block_size: int = DEFAULT_BLOCK_SIZE,
    store_positions: bool = True,
) -> dict:
    """Incrementally sync the index to a new corpus snapshot.

    Zebra resolves updates per record: match → stored delete-keys +
    new insert-keys, netted during merge
    (/root/reference/index/extract.c:896-1100,
    /root/reference/index/kinput.c:449-494). The Spark-scale
    equivalent is shard-granular copy-on-write: diff the new snapshot
    against the indexed doc_meta by (doc_id, sha256); every shard
    containing an added/changed/deleted doc is rebuilt from the new
    snapshot in one batch (readers pick the latest build_seq per
    shard). Unchanged shards are untouched — no read, no write.
    """
    src = new_corpus.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
    ).withColumn("shard", (F.col("doc_id") / shard_size).cast("long"))

    lineage = read_lineage(spark, path)
    if lineage is None:
        m = build_index(
            spark, new_corpus, path, text_col=text_col, id_col=id_col,
            shard_size=shard_size, block_size=block_size,
            store_positions=store_positions,
        )
        m["changed_shards"] = m["shards"]
        return m

    w_latest = lineage.groupBy("shard").agg(F.max("build_seq").alias("build_seq"))
    latest = lineage.join(w_latest, ["shard", "build_seq"]).select("shard", "batch")
    old = (
        spark.read.parquet(f"{path}/doc_meta")
        .join(latest, ["shard", "batch"], "semi")
        .select("doc_id", F.col("sha256").alias("old_sha"),
                F.col("shard").alias("old_shard"))
    )
    diff = src.join(old, "doc_id", "full_outer")
    changed = diff.where(
        F.col("old_sha").isNull()                      # added
        | F.col("sha256").isNull()                     # deleted
        | (F.col("sha256") != F.col("old_sha"))        # modified
    ).select(F.coalesce(F.col("shard"), F.col("old_shard")).alias("shard"))
    shards = sorted(r["shard"] for r in changed.distinct().collect())
    if not shards:
        return {"batch": None, "shards": 0, "docs": 0, "changed_shards": 0}
    m = build_index(
        spark, new_corpus, path, text_col=text_col, id_col=id_col,
        shard_size=shard_size, block_size=block_size,
        store_positions=store_positions, reindex_shards=shards,
    )
    m["changed_shards"] = len(shards)
    return m
