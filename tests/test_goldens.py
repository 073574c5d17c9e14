"""Golden-score tests on a hand-checkable 8-doc corpus — the analogue
of the reference's pinned-score API tests
(/root/reference/test/api/test_rank.c:55-67 pins scores like 936;
/root/reference/test/api/test_search.c:95-180 pins hit counts).
Both the brute-force plan AND the segment/WAND engine must reproduce
these exact frozen values."""

from __future__ import annotations

import pytest

from idzebra_spark.operators.bruteforce import bm25_topk
from idzebra_spark.operators.segment import build_index
from idzebra_spark.operators.wand import SegmentIndex

FX_TINY = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "int main(void) { return 0; }"),
    (2, "static void merge_sort(int *a, int n) { merge(a, n); }"),
    (3, "merge merge merge sort sort scan"),
    (4, "def parse_buffer(buf): return buf.split()"),
    (5, ""),
    (6, "the the the the the"),
    (7, "quick sort beats merge sort for small n"),
]

GOLDEN = {
    ("merge",): ("or", None, [(3, 15031), (2, 10786), (7, 8553)]),
    ("merge", "sort"): ("and", None, [(3, 28236), (7, 20670), (2, 18069)]),
    ("the", "quick"): ("or", None, [(0, 26748), (6, 23461), (7, 11600)]),
    ("sort",): ("or", ("merge",), []),  # every sort-doc also has merge
}

GOLDEN_RANK1 = [(3, 1000), (2, 895), (7, 895)]


@pytest.fixture(scope="module")
def tiny(spark, tmp_path_factory):
    docs = spark.createDataFrame(FX_TINY, ["doc_id", "text"])
    path = str(tmp_path_factory.mktemp("tiny") / "idx")
    build_index(spark, docs, path, shard_size=4, block_size=2)
    return docs, SegmentIndex(spark, path)


@pytest.mark.parametrize("terms", list(GOLDEN.keys()), ids=lambda t: "_".join(t))
def test_bruteforce_matches_goldens(tiny, terms):
    docs, _ = tiny
    mode, nt, want = GOLDEN[terms]
    got = [(r.doc_id, r.score_milli)
           for r in bm25_topk(docs, list(terms), 10, mode,
                              not_terms=list(nt) if nt else None).collect()]
    assert got == want


@pytest.mark.parametrize("terms", list(GOLDEN.keys()), ids=lambda t: "_".join(t))
def test_wand_matches_goldens(tiny, terms):
    _, idx = tiny
    mode, nt, want = GOLDEN[terms]
    got = [(r.doc_id, r.score_milli)
           for r in idx.topk(list(terms), 10, mode,
                             not_terms=list(nt) if nt else None).collect()]
    assert got == want


def test_wand_not_rank_identity(tiny):
    docs, idx = tiny
    want = [(r.doc_id, r.score_milli)
            for r in bm25_topk(docs, ["the", "sort"], 10, "or",
                               not_terms=["scan"]).collect()]
    got = [(r.doc_id, r.score_milli)
           for r in idx.topk(["the", "sort"], 10, "or",
                             not_terms=["scan"]).collect()]
    assert got == want and len(got) > 0


def test_hit_counts_pinned(tiny):
    _, idx = tiny
    assert idx.count(["merge"], "or") == 3
    assert idx.count(["merge", "sort"], "and") == 3
    assert idx.count(["the", "quick"], "or") == 3
    assert idx.count(["nosuchterm"], "or") == 0


def test_rank1_golden(tiny, spark):
    from pyspark.sql import functions as F

    from idzebra_spark.functions.scoring import log2i
    from idzebra_spark.functions.tokenizer import tokenize

    docs, _ = tiny
    p = tokenize(docs)
    dl = p.groupBy("doc_id").agg(F.count("*").alias("doclen"))
    tf = (p.where(F.col("term").isin(["merge", "sort"]))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dft = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (F.lit(8) + log2i(F.col("tf"))) * (
        F.lit(32) - log2i(F.col("df"))) * F.lit(34)
    sc = (tf.join(dft, "term").join(dl, "doc_id").groupBy("doc_id")
          .agg(F.sum(contrib).alias("s"), F.count("*").alias("nm"),
               F.first("doclen").alias("dlen")))
    div = F.col("nm") * (F.lit(8) + log2i(F.floor(F.col("dlen") / 2)))
    got = [(r.doc_id, r.score) for r in sc.select(
        "doc_id",
        F.least(F.lit(1000), F.floor(F.col("s") / div).cast("long")).alias("score"),
    ).orderBy(F.desc("score"), F.asc("doc_id")).collect()]
    assert got == GOLDEN_RANK1
