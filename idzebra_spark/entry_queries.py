"""Query registry wired into ``__spark_entry__``.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with the equivalent DuckDB oracle SQL (built in ``idzebra_spark.oracle``)
over the same parquet tables. Column names/aliases match exactly — the
driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idzebra_spark import oracle
from idzebra_spark.functions.tokenizer import tokenize
from idzebra_spark.operators.bruteforce import bm25_topk
from idzebra_spark.sources.corpus import load_documents


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir)


def _posting(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenize(_docs(spark, sf_dir))


# ---------------------------------------------------------------- BM25

def q_bm25_single(spark, sf_dir):
    return bm25_topk(_docs(spark, sf_dir), ["merge"], k=10, mode="or")


def q_bm25_or(spark, sf_dir):
    return bm25_topk(_docs(spark, sf_dir), ["merge", "sort"], k=10, mode="or")


def q_bm25_and(spark, sf_dir):
    return bm25_topk(_docs(spark, sf_dir), ["spark", "query"], k=10, mode="and")


# ------------------------------------------------------- boolean counts

def _hits(spark, sf_dir, terms: list[str], mode: str) -> DataFrame:
    terms = sorted(set(terms))
    p = _posting(spark, sf_dir).where(F.col("term").isin(terms))
    g = p.groupBy("doc_id").agg(F.countDistinct("term").alias("nt"))
    if mode == "and":
        g = g.where(F.col("nt") == len(terms))
    return g.select(F.count("*").alias("hits"))


def q_hits_or(spark, sf_dir):
    return _hits(spark, sf_dir, ["merge", "sort"], "or")


def q_hits_and(spark, sf_dir):
    return _hits(spark, sf_dir, ["merge", "sort"], "and")


# ---------------------------------------------------------- dictionary

def q_dictionary_prefix(spark, sf_dir):
    p = _posting(spark, sf_dir).where(F.col("term").startswith("s"))
    return (
        p.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf"))
        .orderBy(F.asc("term"))
        .limit(100)
    )


def q_scan(spark, sf_dir):
    p = _posting(spark, sf_dir)
    return (
        p.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("term") >= "merge")
        .orderBy(F.asc("term"))
        .limit(10)
    )


# -------------------------------------------------------------- phrase

def q_phrase(spark, sf_dir):
    """Adjacent phrase "batch batch" (present in the synthetic docs)."""
    p = _posting(spark, sf_dir)
    p0 = p.where(F.col("term") == "batch").alias("p0")
    p1 = p.where(F.col("term") == "batch").alias("p1")
    m = p0.join(
        p1,
        (F.col("p0.doc_id") == F.col("p1.doc_id"))
        & (F.col("p1.pos") == F.col("p0.pos") + 1),
    )
    return (
        m.groupBy(F.col("p0.doc_id").alias("doc_id"))
        .agg(F.count("*").alias("n_occ"))
        .orderBy(F.asc("doc_id"))
        .limit(10)
    )


REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "bm25_single": (q_bm25_single, oracle.bm25_topk_sql(["merge"], 10, "or")),
    "bm25_or": (q_bm25_or, oracle.bm25_topk_sql(["merge", "sort"], 10, "or")),
    "bm25_and": (q_bm25_and, oracle.bm25_topk_sql(["spark", "query"], 10, "and")),
    "hits_or": (q_hits_or, oracle.hit_count_sql(["merge", "sort"], "or")),
    "hits_and": (q_hits_and, oracle.hit_count_sql(["merge", "sort"], "and")),
    "dictionary_prefix": (q_dictionary_prefix, oracle.dictionary_sql("s", 100)),
    "scan": (q_scan, oracle.scan_sql("merge", 10)),
    "phrase": (q_phrase, oracle.phrase_sql(["batch", "batch"], 10)),
}
