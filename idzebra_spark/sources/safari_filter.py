"""Safari record filter — Spark analog of Zebra's ``safari`` filter.

Reference: ``/root/reference/index/mod_safari.c:118-190``
(filter_extract): records arrive PRE-TOKENIZED — line 1 is the match
criteria (record key), every further line is
``[type]record_id section_id seqno field term`` where the leading
index-type char is optional (defaults to '0'/raw when the line starts
with a digit) and the term is the rest of the line. No tokenizer runs;
the producer supplies document ids, positions and index names.

Spark-first shape: the whole parse is JVM expressions — split lines,
posexplode, one regexp per line — and the resulting posting stream
feeds ``build_index(..., pretokenized=True)``, which derives
doclen/norms from posting counts and composite ``field\\x1fterm``
dictionary keys from the supplied index names. A safari corpus and a
text corpus with identical token streams build IDENTICAL indexes
(same BM25 stats), which is what the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINE_RE = r"^([^0-9 ])?(\d+) (\d+) (\d+) (\S+) (.*)$"


def parse_safari(df: DataFrame, text_col: str = "safari") -> DataFrame:
    """Safari record strings → posting stream ``(doc_id, section_id,
    pos, field, index_type, term)``. Line 1 (match criteria) is
    skipped; malformed lines are dropped like mod_safari's
    RECCTRL_EXTRACT_ERROR path rejects them."""
    lines = df.select(
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_n", "line")
    ).where((F.col("_n") > 0) & (F.col("line") != ""))
    g = lambda i: F.regexp_extract("line", _LINE_RE, i)  # noqa: E731
    parsed = lines.select(
        g(2).alias("_rid"), g(3).alias("_sid"), g(4).alias("_seq"),
        g(5).alias("field"),
        F.when(g(1) == "", "0").otherwise(g(1)).alias("index_type"),
        g(6).alias("term"),
    ).where(F.col("_rid") != "")
    return parsed.select(
        F.col("_rid").cast("long").alias("doc_id"),
        F.col("_sid").cast("long").alias("section_id"),
        F.col("_seq").cast("int").alias("pos"),
        "field", "index_type", "term",
    )


def synth_safari(docs: DataFrame, field: str = "body") -> DataFrame:
    """documents → safari record strings: the tokenizer's own posting
    stream rendered in the line format (type 'w', section 1), so
    ``parse_safari`` inverts it exactly and a pretokenized build
    matches a regular text build posting-for-posting."""
    from idzebra_spark.functions.tokenizer import tokenize

    toks = tokenize(docs)
    line = F.concat_ws(
        " ",
        F.concat(F.lit("w"), F.col("doc_id").cast("string")),
        F.lit("1"), F.col("pos").cast("string"), F.lit(field), "term",
    )
    per_doc = (
        toks.select("doc_id", "pos", line.alias("line"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "line")))
             .alias("_ls"))
    )
    return per_doc.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("doc"), F.col("doc_id").cast("string")),
            F.array_join(F.transform("_ls", lambda s: s["line"]), "\n"),
        ).alias("safari"),
    )


def safari_postings(df: DataFrame, text_col: str = "safari",
                    body_field: str = "body") -> DataFrame:
    """Parsed stream shaped for ``build_index(pretokenized=True)``:
    the designated body field becomes bare terms (rankable, BM25
    doclen), every other field keeps its composite key."""
    p = parse_safari(df, text_col)
    return p.select(
        "doc_id", "term", "pos",
        F.when(F.col("field") == body_field, F.lit(None).cast("string"))
        .otherwise(F.col("field")).alias("field"),
    )
