"""Round-6 optimization parity tests.

Every r6 change is a PHYSICAL rewrite that must leave results
bit-identical: the doc-array build kernel vs the explode+aggregate
pipeline, the numpy embedding-dedup kernel vs the bucket self-join,
and the restructured brute-force BM25 vs its original plan. These
tests pin each equivalence on adversarial inputs (empty docs,
boundary separators, duplicate-heavy text), not just the fixtures.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _block_digest(df):
    rows = df.collect()
    h = hashlib.sha256()
    for r in sorted(rows, key=lambda r: (r["term"], r["shard"],
                                         r["block_seq"])):
        h.update(repr((
            r["term"], r["shard"], r["block_seq"], r["n_docs"],
            r["first_docid"], r["last_docid"], r["max_tf"], r["sum_tf"],
            bytes(r["docids_bin"]), bytes(r["tfs_bin"]),
            bytes(r["pos_bin"]),
        )).encode())
    return len(rows), h.hexdigest()


@pytest.fixture()
def tricky_corpus(spark):
    rows = [
        (0, ""),                               # empty doc
        (1, "   ...   "),                      # separators only
        (2, "a"),                              # single token
        (3, ".lead and trail."),               # boundary separators
        (5, "dup dup dup dup other"),          # heavy tf
        (7, "x " * 300),                       # long doc, one term
        (8, "merge sort merge sort scan"),
        (12, "zz yy xx ww vv uu"),             # reverse-lex terms
        (13, "a1 b2 c3 " * 40),
        (200, "cross shard doc"),              # lands in another shard
        (513, "another far shard"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("store_positions", [True, False])
def test_doc_array_build_kernel_parity(spark, tricky_corpus,
                                       store_positions):
    """The r6 doc-array kernel must emit byte-identical blocks to the
    explode → groupBy(shard, term, doc_id) → collect_list pipeline."""
    from idzebra_spark.functions.tokenizer import tokenize, tokenize_array
    from idzebra_spark.operators import segment as seg

    ss, bs = 128, 4   # small blocks → many boundaries exercised
    src = tricky_corpus.select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"),
    ).withColumn("shard", seg.shard_expr(ss))

    toks = tokenize(src, "text", "doc_id").withColumn(
        "shard", seg.shard_expr(ss))
    toks = toks.where(F.col("term").isNotNull() & (F.col("term") != ""))
    aggs = [F.count("*").alias("tf")]
    if store_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    tf_rows = toks.groupBy("shard", "term", "doc_id").agg(*aggs)
    old = tf_rows.groupBy("shard").applyInPandas(
        seg._build_shard_blocks(bs, store_positions), seg.BLOCK_SCHEMA)

    doc_toks = src.select(
        "shard", "doc_id", tokenize_array(F.col("text")).alias("toks"))
    new = doc_toks.groupBy("shard").applyInPandas(
        seg._build_shard_blocks_from_docs(bs, store_positions),
        seg.BLOCK_SCHEMA)

    n_old, d_old = _block_digest(old)
    n_new, d_new = _block_digest(new)
    assert n_old == n_new and n_old > 0
    assert d_old == d_new


def test_embedding_dup_pairs_matches_join_form(spark):
    """The per-bucket numpy kernel must reproduce the join form's
    rounded similarities exactly (same IEEE fold order)."""
    from idzebra_spark.operators.similarity import (
        cosine, embedding_dup_pairs, lsh_bucket)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = sorted(map(tuple, embedding_dup_pairs(emb, 0.35, 4).collect()))

    vec = F.col("embedding").cast("array<double>")
    dim = emb.select(F.size("embedding").alias("d")).limit(1).collect()[0]["d"]
    b = emb.select(F.col("vec_id").alias("vid"), vec.alias("v"),
                   lsh_bucket(vec, dim, 4).alias("bucket"))
    want = sorted(map(tuple, (
        b.alias("a")
        .join(b.alias("b"),
              (F.col("a.bucket") == F.col("b.bucket"))
              & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")) * 1000000, 0)
            .cast("long").alias("sim_micro"))
        .where(F.col("sim_micro") >= 350000)
    ).collect()))
    assert got == want and len(got) > 0


def test_expand_memo(spark, tmp_path, tricky_corpus):
    """Truncation expansions are memoized per handle (dict-LRU
    discipline): a repeated wildcard leaf re-uses the first result,
    and the memo returns defensive copies."""
    from idzebra_spark.operators.segment import build_index
    from idzebra_spark.operators.wand import SegmentIndex

    path = str(tmp_path / "idx")
    build_index(spark, tricky_corpus, path, shard_size=128, block_size=64)
    idx = SegmentIndex(spark, path)
    a = idx.expand("prefix", "d")
    assert ("prefix", "d", None, 1, None) in idx._expand_memo
    b = idx.expand("prefix", "d")
    assert a == b and a is not b
    b.append("mutated")
    assert idx.expand("prefix", "d") == a
    # different pattern → separate entry
    idx.expand("suffix", "p")
    assert len(idx._expand_memo) == 2
    # search_tree with a wildcard goes through the memo too
    r1 = [tuple(r) for r in idx.search_tree(("prefix", "d"), 10).collect()]
    r2 = [tuple(r) for r in idx.search_tree(("prefix", "d"), 10).collect()]
    assert r1 == r2


def test_charmap_batched_guard_counterexamples(spark):
    """ADVICE r5: batching must refuse replace lists where a
    sequential pair consumes a batched src or a batched dst —
    the two verified counterexamples now stay sequential and match
    the documented in-order .chr semantics (JVM and driver twins)."""
    from idzebra_spark.functions.charmap import Charmap

    cm1 = Charmap("abcx", "", "", (("a", "b"), ("bc", "x")))
    cm2 = Charmap("abxy", "", "", (("a", "b"), ("a", "xy")))
    assert cm1.batched_replaces() is None
    assert cm2.batched_replaces() is None
    assert cm1.fold_str("ac") == "x"
    assert cm2.fold_str("a") == "b"
    df = spark.createDataFrame([("ac",), ("a",)], "t string")
    got1 = {r[0] for r in df.select(cm1.normalize_column(F.col("t"))).collect()}
    assert got1 == {"x", "b"}
    got2 = {r[0] for r in df.select(cm2.normalize_column(F.col("t"))).collect()}
    assert got2 == {"bc", "b"}
    # shipped-style independent maps still batch (fast path intact)
    indep = Charmap("abcdef", "", "", (("x", ""), ("y", ""), ("q", "k")))
    assert indep.batched_replaces() is not None


def test_matchkey_id_collision_raises(spark, tmp_path):
    """ADVICE r5: a NEW match key arriving under the recycled external
    id of a DIFFERENT live record must raise, not corrupt the shard;
    reuse of an id freed by a deletion in the same sync stays legal."""
    from idzebra_spark.operators.segment import build_index, update_index
    from idzebra_spark.operators.wand import SegmentIndex

    path = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(1, "alpha text", "k1"), (2, "beta text", "k2")],
        "doc_id long, text string, url string")
    build_index(spark, base, path, shard_size=128, block_size=64,
                match_cols=["url"])

    # new key k3 arrives under external id 2 == live sysno of k2
    clash = spark.createDataFrame(
        [(1, "alpha text", "k1"), (2, "beta text", "k2"),
         (2, "gamma text", "k3")],
        "doc_id long, text string, url string")
    with pytest.raises(ValueError, match="id collision"):
        update_index(spark, clash, path, match_cols=["url"])

    # k2 deleted AND its id recycled by new key k3 in one sync: legal
    recycle = spark.createDataFrame(
        [(1, "alpha text", "k1"), (2, "gamma text", "k3")],
        "doc_id long, text string, url string")
    m = update_index(spark, recycle, path, match_cols=["url"])
    assert m["changed_shards"] >= 1
    idx = SegmentIndex(spark, path)
    metas = {(r["doc_id"], r["match_key"]) for r in
             idx.doc_meta().select("doc_id", "match_key").collect()}
    assert len({d for d, _ in metas}) == len(metas) == 2


def test_q8_memo_lru_bound(spark):
    """The (N+1)-th distinct corpus evicts (and unpersists) the
    oldest q8 memo entry; a re-scored corpus moves to MRU."""
    from idzebra_spark.operators import similarity as S

    S.clear_q8_memo()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    frames = [emb.where(F.col("vec_id") % 7 != i) for i in range(S.Q8_MEMO_MAX + 1)]
    for f in frames:
        S.cosine_topk_q8(f, qv, 5).collect()
    assert len(S._Q8_MEMO) == S.Q8_MEMO_MAX
    entries = list(S._Q8_MEMO.values())
    # every retained entry is still persisted; evicting one more works
    assert all(e.storageLevel.useMemory or e.storageLevel.useDisk
               for e in entries)
    lru_key = next(iter(S._Q8_MEMO))  # frames[1]'s entry is oldest now
    S.cosine_topk_q8(frames[1], qv, 5).collect()  # re-score → MRU move
    assert next(iter(S._Q8_MEMO)) != lru_key
    assert list(S._Q8_MEMO)[-1] == lru_key
    assert len(S._Q8_MEMO) == S.Q8_MEMO_MAX  # hit, not a new entry
    S.clear_q8_memo()
    assert not S._Q8_MEMO


def test_bm25_topk_doclen_carry_parity(spark, tricky_corpus):
    """The r6 bm25_topk (doclen carried through the tf aggregate, term
    filter inside the array, exists-based NOT) must match the original
    exploded form row-for-row."""
    from idzebra_spark.functions.scoring import (
        K1, B, bm25_idf, bm25_term_score)
    from idzebra_spark.functions.tokenizer import tokenize
    from idzebra_spark.operators.bruteforce import bm25_topk, corpus_stats

    def old_bm25(corpus, terms, k=10, mode="or", not_terms=None):
        terms = sorted(set(t.lower() for t in terms))
        toks = tokenize(corpus, "text", "doc_id")
        doclen = toks.groupBy("doc_id").agg(F.count("*").alias("doclen"))
        stats = corpus_stats(corpus)
        tf = (toks.where(F.col("term").isin(terms))
              .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
        dft = tf.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df"))
        scored = (
            tf.join(F.broadcast(dft), "term")
            .join(doclen, "doc_id").crossJoin(F.broadcast(stats))
            .withColumn("idf", bm25_idf(F.col("df"), F.col("n_docs")))
            .withColumn("s", bm25_term_score(
                F.col("tf"), F.col("idf"), F.col("doclen"),
                F.col("avgdl"), k1=K1, b=B))
            .groupBy("doc_id")
            .agg(F.sum("s").alias("raw_score"),
                 F.count("*").alias("n_matched")))
        if mode == "and":
            scored = scored.where(F.col("n_matched") == len(terms))
        if not_terms:
            neg = sorted(set(t.lower() for t in not_terms))
            neg_docs = toks.where(F.col("term").isin(neg)) \
                .select("doc_id").distinct()
            scored = scored.join(neg_docs, "doc_id", "left_anti")
        return (scored.select(
            "doc_id",
            F.round(F.col("raw_score") * 10000, 0).cast("long")
            .alias("score_milli"))
            .orderBy(F.desc("score_milli"), F.asc("doc_id")).limit(k))

    for terms, mode, neg in [
        (["merge", "sort"], "or", None),
        (["merge", "sort"], "and", None),
        (["dup", "other"], "or", ["scan"]),
        (["x"], "or", None),
        (["nosuchterm"], "or", None),
    ]:
        got = [tuple(r) for r in
               bm25_topk(tricky_corpus, terms, 10, mode,
                         not_terms=neg).collect()]
        want = [tuple(r) for r in
                old_bm25(tricky_corpus, terms, 10, mode, neg).collect()]
        assert got == want, (terms, mode, neg)
