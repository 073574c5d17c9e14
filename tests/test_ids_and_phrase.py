"""Dense docid assignment + segment-level phrase over stored positions
+ end-to-end index of the input_hint table shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from idzebra_spark.operators.ids import assign_doc_ids, index_source_files
from idzebra_spark.operators.wand import SegmentIndex
from idzebra_spark.sources.corpus import load_documents, synth_source_files


def test_assign_doc_ids_dense_and_ordered(spark):
    src = synth_source_files(spark, 500).drop("doc_id")
    out = assign_doc_ids(src, ["repo", "path", "commit"], num_partitions=7)
    rows = out.select("repo", "path", "commit", "doc_id").collect()
    assert len(rows) == 500
    ids = sorted(r.doc_id for r in rows)
    assert ids == list(range(500))  # dense 0..N-1
    by_key = sorted(rows, key=lambda r: (r.repo, r.path, r.commit))
    assert [r.doc_id for r in by_key] == list(range(500))  # key-ordered


def test_assign_doc_ids_deterministic(spark):
    src = synth_source_files(spark, 300).drop("doc_id")
    a = {(r.repo, r.path): r.doc_id
         for r in assign_doc_ids(src, ["repo", "path", "commit"]).collect()}
    b = {(r.repo, r.path): r.doc_id
         for r in assign_doc_ids(src, ["repo", "path", "commit"]).collect()}
    assert a == b


def test_index_source_files_end_to_end(spark, tmp_path_factory):
    """The north-rule input shape (repo,path,commit,lang,content) →
    built index; per-row sha256 invariant against the source."""
    path = str(tmp_path_factory.mktemp("srcidx") / "idx")
    src = synth_source_files(spark, 400).drop("doc_id")
    m = index_source_files(spark, src, path, shard_size=64, block_size=32)
    assert m["docs"] == 400
    idx = SegmentIndex(spark, path)
    assert idx.stats()[0] == 400
    # ubiquitous head term reaches ~every doc (skew path)
    assert idx.count(["int"], "or") > 300
    # '_' splits in the charmap: parse_buffer indexes as parse+buffer
    top = idx.topk(["parse", "buffer"], 10, "or").collect()
    assert len(top) > 0
    # sha256 invariant: doc_meta vs recomputed source hashes
    withids = assign_doc_ids(src, ["repo", "path", "commit"])
    srcsha = withids.select(
        "doc_id", F.sha2(F.col("content"), 256).alias("s"))
    j = idx.doc_meta().join(srcsha, "doc_id")
    assert j.where(F.col("sha256") != F.col("s")).count() == 0


def test_segment_phrase_matches_logical(spark, sf_dir, tmp_path_factory):
    from idzebra_spark.operators.boolean import PostingsOps
    from idzebra_spark.operators.segment import build_index

    docs = load_documents(spark, sf_dir)
    path = str(tmp_path_factory.mktemp("ph") / "idx")
    build_index(spark, docs, path, shard_size=64, block_size=32,
                store_positions=True)
    idx = SegmentIndex(spark, path)
    ops = PostingsOps(docs)
    for phrase in [["batch", "batch"], ["the", "data"], ["merge", "nosuch"]]:
        want = sorted(
            (r.doc_id, r.n_occ)
            for r in ops.phrase(phrase).collect()
        )[:10]
        got = sorted(
            (r.doc_id, r.n_occ)
            for r in idx.phrase(phrase, 10).collect()
        )
        assert got == want, phrase
