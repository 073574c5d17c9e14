"""Brute-force DataFrame BM25 — the engine's correctness oracle path.

This is SURVEY.md §7 step 3: the full scoring pipeline expressed in
plain declarative DataFrame ops so Catalyst owns the physical plan
(partial aggregation, broadcast of the 1-row stats dim, sort-limit
top-k). It mirrors what Zebra's ``resultSetRank`` computes
(/root/reference/index/zsets.c:1084-1191: stream keys, per-doc tf
accumulate, score, bounded top-k) — but as a logical plan, not an
iterator stack.

The segment/WAND engine (operators.segment / operators.wand) must be
rank-identical to this path; pytest enforces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idzebra_spark.functions.scoring import K1, B, bm25_idf, bm25_term_score
from idzebra_spark.functions.tokenizer import tokenize, tokenize_array

SCORE_DECIMALS = 4  # rounded for cross-engine (DuckDB oracle) hashing


def postings_with_tf(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf) — scope-2 aggregation of the logical postings
    (docid-level keys, include/rset.h:172-183 'same document' scope)."""
    return (
        tokenize(corpus, text_col, id_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def corpus_stats(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """1-row (n_docs, avgdl) — Zebra keeps these in the explain/zinfo
    registry (/root/reference/index/zinfo.c:1431-1456)."""
    return corpus.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokenize_array(F.col(text_col)))).alias("avgdl"),
    )


def bm25_topk(
    corpus: DataFrame,
    terms: list[str],
    k: int = 10,
    mode: str = "or",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    not_terms: list[str] | None = None,
) -> DataFrame:
    """Top-k BM25 over ``terms`` -> (doc_id, score) rounded, ordered
    (score desc, doc_id asc) — Zebra's tie discipline
    (/root/reference/index/zsets.c:716-736 keeps the earlier/lower doc).

    mode='or'  : any term matches (rsmulti_or + rank semantics)
    mode='and' : all terms must match (rsmulti_and scope-2 semantics)
    """
    terms = sorted(set(t.lower() for t in terms))
    # One tokenized projection feeds doclen AND the term filter
    # (r6 shape — was: full-token posexplode, corpus-wide doclen
    # groupBy shuffle, then a doc_id join to attach doclen):
    # - doclen = size(token array), identical to counting the exploded
    #   postings, with NO full-token Generate and NO corpus-wide
    #   groupBy; it rides through the tf aggregate as min(doclen)
    #   (constant per doc), so the doclen join disappears entirely.
    # - the term filter runs INSIDE the array before the explode, so
    #   the Generate emits only matching occurrences, not every token.
    # - df_per_term re-aggregates the same tf subtree — the identical
    #   exchange is shared (ReuseExchange), not recomputed.
    base = corpus.select(
        F.col(id_col).alias("doc_id"),
        tokenize_array(F.col(text_col)).alias("_toks"),
    )
    stats = corpus_stats(corpus, text_col, id_col)

    tf = (
        base.select(
            "doc_id",
            F.size("_toks").alias("doclen"),
            F.explode(
                F.filter("_toks", lambda t: t.isin(terms))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.min("doclen").alias("doclen"))
    )
    df_per_term = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    scored = (
        tf.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", bm25_idf(F.col("df"), F.col("n_docs")))
        .withColumn(
            "s",
            bm25_term_score(
                F.col("tf"), F.col("idf"), F.col("doclen"), F.col("avgdl"),
                k1=k1, b=b,
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("s").alias("raw_score"),
            F.count("*").alias("n_matched"),
        )
    )
    if mode == "and":
        scored = scored.where(F.col("n_matched") == len(terms))
    if not_terms:
        neg = sorted(set(t.lower() for t in not_terms))
        # array `exists` instead of explode+distinct: one boolean per
        # doc, same excluded-doc set, no Generate and no dedup shuffle
        neg_docs = base.where(
            F.exists("_toks", lambda t: t.isin(neg))
        ).select("doc_id")
        scored = scored.join(neg_docs, "doc_id", "left_anti")
    return (
        scored.select(
            "doc_id",
            F.round(F.col("raw_score") * 10000, 0).cast("long").alias("score_milli"),
        )
        .orderBy(F.desc("score_milli"), F.asc("doc_id"))
        .limit(k)
    )
