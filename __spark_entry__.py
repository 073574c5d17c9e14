"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (see idzebra_spark.entry_queries).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for 'merge sort' over sf0.001 documents."""
    from idzebra_spark.operators.bruteforce import bm25_topk
    from idzebra_spark.sources.corpus import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    return bm25_topk(docs, ["merge", "sort"], k=10, mode="or")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from idzebra_spark.entry_queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from idzebra_spark.entry_queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
