"""Corpus sources.

Two corpora feed the engine:

1. the driver-generated ``documents`` parquet table
   ``(doc_id, text, lang, source, n_chars)`` under
   ``/root/testdata/sf*/`` — used by ``__spark_entry__`` queries and
   their DuckDB oracles;

2. a deterministic synthetic ``source_files`` table matching
   BASELINE.json's ``input_hint`` shape
   ``(repo, path, commit, lang, content)`` — generated fully
   distributed (``spark.range`` + JVM hash expressions, zero
   driver-side loops, zero Python UDFs) so the same generator would
   synthesize a 10^12-row corpus on a real cluster. Rows are a seeded
   mix of Zipf-head keywords, mid-frequency identifiers and per-doc
   unique symbols (FIXTURES.md §2), which exercises the skew paths the
   north rule calls out ('int', 'return' in ~every doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Zipf head: near-ubiquitous tokens (FIXTURES.md §2 pool 1).
UBIQUITOUS = [
    "int", "return", "if", "for", "while", "def",
    "class", "import", "void", "static",
]
# Mid-frequency identifiers (pool 2) — 64 templated stems expanded x8.
_STEMS = [
    "parse", "open", "close", "read", "write", "merge", "split", "scan",
    "key", "block", "buffer", "index", "term", "dict", "isam", "rec",
    "sort", "heap", "hash", "tree", "node", "page", "file", "seek",
    "flush", "commit", "begin", "end", "init", "free", "alloc", "copy",
    "find", "insert", "delete", "update", "count", "first", "next", "prev",
    "get", "put", "set", "add", "remove", "check", "verify", "encode",
    "decode", "pack", "unpack", "grow", "shrink", "lock", "unlock", "sync",
    "load", "store", "map", "unmap", "push", "pop", "shift", "rotate",
]
_SUFFIXES = ["buffer", "block", "entry", "item", "list", "ptr", "len", "pos"]
MID_FREQ = [f"{s}_{x}" for s in _STEMS for x in _SUFFIXES]  # 512 tokens

LANGS = ["c", "py", "java", "go"]  # weighted 40/30/20/10 (FIXTURES.md §1)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver `documents` table: (doc_id, text, lang, source, n_chars)."""
    return load_table(spark, sf_dir, "documents")


def with_sha256(df: DataFrame, text_col: str = "content") -> DataFrame:
    """Append the per-row content invariant column (BASELINE input_hint:
    'per-row invariant vs the reference: content sha256 equality')."""
    return df.withColumn("sha256", F.sha2(F.col(text_col), 256))


def _pick(arr: list[str], h) :
    """Pick arr[h % len(arr)] as a column expression (JVM-side)."""
    lit = F.array(*[F.lit(x) for x in arr])
    return F.element_at(lit, (F.pmod(h, F.lit(len(arr))) + 1).cast("int"))


def synth_source_files(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    min_tokens: int = 40,
    max_tokens: int = 200,
) -> DataFrame:
    """Deterministic synthetic source-code corpus (input_hint shape).

    Token counts are uniform over [min_tokens, max_tokens) — the upper
    bound is exclusive (kept as-is: the FIXTURES goldens are frozen on
    this distribution).

    Content of row ``i``, token ``j`` is a pure function of
    ``xxhash64(i, j, seed)``: 30% Zipf-head keyword, 60% mid-frequency
    identifier, 10% unique ``sym_{i}_{j}``. Separators (space/newline/
    punctuation) are hash-chosen too, so the tokenizer sees realistic
    code-ish text. Entirely column expressions — scales to any n_rows.
    """
    if max_tokens <= min_tokens:
        raise ValueError("max_tokens must be > min_tokens "
                         "(exclusive upper bound)")
    df = spark.range(n_rows).withColumnRenamed("id", "i")
    h0 = F.xxhash64(F.col("i"), F.lit(seed))

    lang_r = F.pmod(h0, F.lit(10))
    lang = (
        F.when(lang_r < 4, F.lit("c"))
        .when(lang_r < 7, F.lit("py"))
        .when(lang_r < 9, F.lit("java"))
        .otherwise(F.lit("go"))
    )
    repo = F.concat(
        F.lit("org"), F.pmod(h0, F.lit(4)).cast("string"),
        F.lit("/repo"), F.pmod(F.xxhash64(h0), F.lit(97)).cast("string"),
    )
    path = F.concat(
        F.lit("src/pkg"), F.pmod(F.xxhash64(h0, F.lit(1)), F.lit(31)).cast("string"),
        F.lit("/file"), F.col("i").cast("string"), F.lit("."), lang,
    )

    ntok = (
        F.pmod(F.xxhash64(F.col("i"), F.lit(seed + 1)), F.lit(max_tokens - min_tokens))
        + F.lit(min_tokens)
    ).cast("int")

    def token_at(j):
        h = F.xxhash64(F.col("i"), j, F.lit(seed + 2))
        h2 = F.xxhash64(h)
        pool = F.pmod(h, F.lit(10))
        word = (
            F.when(pool < 3, _pick(UBIQUITOUS, h2))
            .when(pool < 9, _pick(MID_FREQ, h2))
            .otherwise(
                F.concat(
                    F.lit("sym_"), F.col("i").cast("string"),
                    F.lit("_"), j.cast("string"),
                )
            )
        )
        sep = _pick([" ", " ", " ", "\n", "(", ") ", "; ", " = "], F.xxhash64(h, F.lit(3)))
        return F.concat(word, sep)

    content = F.array_join(
        F.transform(F.sequence(F.lit(0), ntok - 1), token_at), ""
    )

    out = df.select(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(
            F.sha2(F.concat(repo, F.lit(":"), path), 256), 1, 40
        ).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        F.col("i").alias("doc_id"),
    )
    return out
