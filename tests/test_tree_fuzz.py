"""Randomized rset-DAG equivalence: the segment engine's eval_tree
must agree with the logical PostingsOps evaluation on arbitrary
boolean trees (seeded, reproducible) — the property-level version of
the reference's per-operator API tests (test/api/test_search.c)."""

from __future__ import annotations

import random
import tempfile

import pytest
from pyspark.sql import functions as F

from idzebra_spark.operators.boolean import PostingsOps
from idzebra_spark.operators.segment import build_index
from idzebra_spark.operators.wand import SegmentIndex

TERMS = ["merge", "sort", "scan", "batch", "data", "table", "the",
         "value", "window", "group", "line", "spark", "query"]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def seg(spark, docs):
    path = tempfile.mkdtemp(prefix="fuzz_") + "/idx"
    build_index(spark, docs, path, shard_size=64, block_size=32)
    return SegmentIndex(spark, path)


@pytest.fixture(scope="module")
def ops(docs):
    return PostingsOps(docs)


def random_tree(rng: random.Random, depth: int = 3):
    roll = rng.random()
    if depth == 0 or roll < 0.35:
        kind = rng.random()
        if kind < 0.6:
            return ("term", rng.choice(TERMS))
        if kind < 0.75:
            return ("prefix", rng.choice(["s", "me", "ba", "wi"]))
        if kind < 0.9:
            t1, t2 = rng.sample(TERMS, 2)
            return ("phrase", [t1, t2])
        t1, t2 = rng.sample(TERMS, 2)
        rel = rng.choice(["=", "<", "<=", ">", ">=", "<>"])
        return ("prox", [t1, t2], rel, rng.randint(1, 4),
                rng.random() < 0.5)
    if roll < 0.6:
        return ("and", [random_tree(rng, depth - 1)
                        for _ in range(rng.randint(2, 3))])
    if roll < 0.85:
        return ("or", [random_tree(rng, depth - 1)
                       for _ in range(rng.randint(2, 3))])
    return ("not", random_tree(rng, depth - 1), random_tree(rng, depth - 1))


def eval_logical(tree, ops: PostingsOps):
    op = tree[0]
    if op == "term":
        return ops.term_docs(tree[1])
    if op == "prefix":
        return ops.trunc_docs(ops.expand_prefix(tree[1]))
    if op == "phrase":
        return ops.phrase(list(tree[1])).select("doc_id")
    if op == "prox":
        return ops.prox(tree[1][0], tree[1][1], tree[2], tree[3], tree[4])
    if op == "and":
        return ops.and_([eval_logical(c, ops) for c in tree[1]])
    if op == "or":
        return ops.or_([eval_logical(c, ops) for c in tree[1]])
    if op == "not":
        return ops.not_(eval_logical(tree[1], ops),
                        eval_logical(tree[2], ops))
    raise ValueError(op)


@pytest.mark.parametrize("seed", range(12))
def test_random_tree_equivalence(seg, ops, seed):
    rng = random.Random(1000 + seed)
    tree = random_tree(rng)
    got = sorted(r["doc_id"] for r in seg.eval_tree(tree).collect())
    want = sorted(r["doc_id"]
                  for r in eval_logical(tree, ops).distinct().collect())
    assert got == want, tree


def test_random_tree_ranking_global_stats(seg, ops, docs):
    """search_tree scores == brute-force BM25 restricted to the tree's
    doc set with FULL-corpus stats, for a couple of random trees."""
    from idzebra_spark.operators.bruteforce import bm25_topk
    from idzebra_spark.operators.wand import tree_rank_terms

    rng = random.Random(7)
    for _ in range(3):
        tree = ("and", [("term", rng.choice(TERMS)),
                        ("or", [("term", rng.choice(TERMS)),
                                ("term", rng.choice(TERMS))])])
        rank_terms = sorted(set(tree_rank_terms(tree)))
        got = [(r["doc_id"], r["score_milli"])
               for r in seg.search_tree(tree, k=10).collect()]
        docset = eval_logical(tree, ops).distinct()
        # reference: score the whole corpus with global stats, then
        # restrict to the doc set (NOT subset stats)
        ref = (
            bm25_topk(docs, rank_terms, k=10_000_000, mode="or")
            .join(docset, "doc_id", "semi")
            .orderBy(F.desc("score_milli"), F.asc("doc_id")).limit(10)
        )
        want = [(r["doc_id"], r["score_milli"]) for r in ref.collect()]
        assert got == want, tree


def test_random_tree_batch_equals_singles(seg):
    """search_tree_many over a batch of RANDOM trees is rank-identical
    per query to the single-tree runs — the fuzz-level guarantee for
    the batched serving path (shared decode cache must not leak rank
    terms or positions across queries)."""
    rng = random.Random(4242)
    trees = {f"q{i}": random_tree(rng) for i in range(8)}
    batch = seg.search_tree_many(trees, 10).collect()
    got: dict = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score_milli"]))
    for qid, tree in trees.items():
        single = [(r["doc_id"], r["score_milli"])
                  for r in seg.search_tree(tree, 10).collect()]
        ordered = sorted(got.get(qid, []), key=lambda x: (-x[1], x[0]))
        assert ordered == single, (qid, tree)
