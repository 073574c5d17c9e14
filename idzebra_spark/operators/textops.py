"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All pure JVM column expressions (whole-stage codegen; no Python in the
hot path) so they run at 100 TB scan speed. Each has an exact DuckDB
oracle twin in ``idzebra_spark.oracle_textops``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from idzebra_spark.functions.tokenizer import tokenize_array

# tiny deterministic stopword lists (shared with the SQL oracles)
STOPWORDS_EN = ["the", "and", "of", "to", "in", "is", "it", "for", "on", "with"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"]
STOPWORDS_FR = ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"]

# BPE-ish subtoken pattern: letter runs, digit runs, single punct runs
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"


def _stop_hits(toks: Column, stopwords: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(stopwords)))


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_index_tokens) — whitespace
    split, BPE-ish regex subtokens, and the engine tokenizer count."""
    t = F.col(text_col)
    ws = F.filter(F.split(t, "\\s+"), lambda x: x != F.lit(""))
    bpe = F.regexp_extract_all(F.lower(t), F.lit(BPE_RE), 0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(tokenize_array(t)).alias("n_index_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality: doc length, punctuation ratio, stopword
    ratio, mean word length — milli-scaled ints for stable hashing."""
    # staged projections: the token array and each ratio materialize
    # ONCE per row — higher-order functions are interpreted (no
    # codegen CSE), so a single flat expression tree would re-tokenize
    # per reference
    t = F.col(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("n_chars_"),
        (F.length(t)
         - F.length(F.regexp_replace(t, "[^0-9a-zA-Z\\s]", ""))
         ).alias("_n_punct"),
        tokenize_array(t).alias("_toks"),
    )
    toks, n_toks = F.col("_toks"), F.size(F.col("_toks"))
    ratios = base.select(
        "doc_id", "n_chars_",
        F.when(F.col("n_chars_") > 0,
               F.col("_n_punct") / F.col("n_chars_"))
        .otherwise(F.lit(0.0)).alias("_punct_r"),
        F.when(n_toks > 0, _stop_hits(toks, STOPWORDS_EN) / n_toks)
        .otherwise(F.lit(0.0)).alias("_stop_r"),
        F.when(
            n_toks > 0,
            F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, x: acc + F.length(x)) / n_toks,
        ).otherwise(F.lit(0.0)).alias("_mean_wl"),
    )
    # quality = stopword presence, low punctuation, sane word length
    q = (
        F.lit(0.5) * F.col("_stop_r")
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.col("_punct_r") * 4,
                                             F.lit(1.0)))
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.abs(F.col("_mean_wl") - 5) / 5,
                                             F.lit(1.0)))
    )
    return ratios.select(
        "doc_id", "n_chars_",
        F.round(F.col("_punct_r") * 10000, 0).cast("long").alias("punct_milli"),
        F.round(F.col("_stop_r") * 10000, 0).cast("long").alias("stop_milli"),
        F.round(q * 10000, 0).cast("long").alias("quality_milli"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID over {en,de,fr}; 'unk' when no
    stopword hits. Ties break en > de > fr (fixed order)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize_array(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    hits = base.select(
        "doc_id",
        _stop_hits(toks, STOPWORDS_EN).alias("en_hits"),
        _stop_hits(toks, STOPWORDS_DE).alias("de_hits"),
        _stop_hits(toks, STOPWORDS_FR).alias("fr_hits"),
    )
    en, de, fr = F.col("en_hits"), F.col("de_hits"), F.col("fr_hits")
    best = F.greatest(en, de, fr)
    lang = (
        F.when(best == 0, F.lit("unk"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return hits.select(
        "doc_id", lang.alias("lang_pred"), "en_hits", "de_hits", "fr_hits",
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 over the normalized token stream —
    robust to whitespace/punctuation-only edits (the match-dict
    identity idea, /root/reference/index/extract.c:927-1000, keyed on
    normalized content instead of a user spec)."""
    toks = tokenize_array(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(toks, " ")).alias("fp"),
    )
