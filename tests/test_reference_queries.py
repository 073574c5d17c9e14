"""The reference query set (FIXTURES.md §3, q01-q10) over the seeded
synthetic source_files corpus, with FROZEN golden top-k docids+scores —
the rank-identical gate the north rule demands, in the pinned-golden
style of /root/reference/test/api/test_rank.c.

Both engines (brute-force plan and segment/WAND) must reproduce every
golden exactly. Corpus: synth_source_files(1000), seed 42,
deterministic forever.

Note: the charmap splits '_', so identifiers index as their word parts
(parse_buffer -> parse+buffer); q03's df=1 term is the token '199'
(appears only in doc 199's unique symbols).
"""

from __future__ import annotations

import pytest

from idzebra_spark.operators.boolean import PostingsOps
from idzebra_spark.operators.bruteforce import bm25_topk
from idzebra_spark.operators.segment import build_index
from idzebra_spark.operators.wand import SegmentIndex
from idzebra_spark.sources.corpus import synth_source_files

# (terms, mode, not_terms, golden top-10 [(doc_id, score_milli)])
GOLDEN_TOPK = {
    "q01_single_ubiquitous": (
        ["return"], "or", None,
        [(17, 1277), (713, 1266), (733, 1266), (808, 1259), (246, 1257),
         (512, 1257), (156, 1255), (113, 1254), (164, 1254), (426, 1253)],
    ),
    "q02_midfreq_and": (
        ["parse", "buffer"], "and", None,
        [(146, 8242), (456, 8222), (354, 8218), (13, 8119), (388, 8057),
         (716, 7991), (877, 7982), (158, 7980), (367, 7974), (777, 7970)],
    ),
    "q03_df1": (["199"], "or", None, [(199, 132129)]),
    "q04_highdf_and": (
        ["int", "return"], "and", None,
        [(686, 2559), (411, 2553), (360, 2516), (733, 2505), (506, 2494),
         (609, 2493), (915, 2486), (695, 2481), (894, 2475), (174, 2471)],
    ),
    "q05_selective_and": (
        ["heap", "rotate"], "and", None,
        [(603, 16181), (492, 14638), (646, 14481), (407, 14471),
         (765, 14419), (665, 14403), (654, 14353), (58, 14316),
         (894, 14241), (638, 14173)],
    ),
    "q06_or": (
        ["shift", "grow"], "or", None,
        [(689, 14723), (302, 14563), (854, 14481), (127, 14298),
         (323, 14080), (494, 13937), (408, 13880), (12, 13857),
         (549, 13781), (841, 13770)],
    ),
    "q07_and_not": (
        ["return"], "or", ["class"],
        [(219, 1233), (147, 1216), (795, 1206), (878, 1196), (58, 1174),
         (822, 1174), (841, 1172), (257, 1167), (643, 1165), (345, 1158)],
    ),
    "q10_empty": (["nosuchtoken"], "or", None, []),
}

GOLDEN_PHRASE_Q08 = [(1, 1), (21, 1), (23, 1), (54, 1), (61, 1), (64, 1),
                     (101, 1), (115, 1), (128, 1), (140, 1)]
GOLDEN_Q09_TRUNC_COUNT = 938   # docs matching any 'ret*' term
GOLDEN_HITS = {"q01": 938, "q04": 885}


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    docs = synth_source_files(spark, 1000).withColumnRenamed(
        "content", "text").cache()
    path = str(tmp_path_factory.mktemp("refq") / "idx")
    build_index(spark, docs, path, shard_size=128, block_size=64)
    return docs, SegmentIndex(spark, path), PostingsOps(docs)


@pytest.mark.parametrize("qid", list(GOLDEN_TOPK.keys()))
def test_bruteforce_reference_set(corpus, qid):
    docs, _, _ = corpus
    terms, mode, nt, want = GOLDEN_TOPK[qid]
    got = [(r.doc_id, r.score_milli)
           for r in bm25_topk(docs, terms, 10, mode, not_terms=nt).collect()]
    assert got == want


@pytest.mark.parametrize("qid", list(GOLDEN_TOPK.keys()))
def test_wand_reference_set(corpus, qid):
    _, idx, _ = corpus
    terms, mode, nt, want = GOLDEN_TOPK[qid]
    got = [(r.doc_id, r.score_milli)
           for r in idx.topk(terms, 10, mode, not_terms=nt).collect()]
    assert got == want


def test_q08_phrase_golden(corpus):
    _, idx, ops = corpus
    logical = sorted((r.doc_id, r.n_occ)
                     for r in ops.phrase(["static", "void"]).collect())[:10]
    assert logical == GOLDEN_PHRASE_Q08
    seg = [(r.doc_id, r.n_occ)
           for r in idx.phrase(["static", "void"], 10).collect()]
    assert seg == GOLDEN_PHRASE_Q08


def test_q09_truncation_golden(corpus):
    _, _, ops = corpus
    assert ops.trunc_docs(ops.expand_prefix("ret")).count() == \
        GOLDEN_Q09_TRUNC_COUNT


def test_hit_counts_golden(corpus):
    _, idx, _ = corpus
    assert idx.count(["return"], "or") == GOLDEN_HITS["q01"]
    assert idx.count(["int", "return"], "and") == GOLDEN_HITS["q04"]
