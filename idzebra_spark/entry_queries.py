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
from idzebra_spark.functions.scoring import log2i
from idzebra_spark.functions.tokenizer import tokenize
from idzebra_spark.operators.boolean import PostingsOps
from idzebra_spark.operators.bruteforce import bm25_topk
from idzebra_spark.sources.corpus import load_documents

_OPS_CACHE: dict[str, PostingsOps] = {}
_IDX_CACHE: dict[str, object] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir)


def _posting(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenize(_docs(spark, sf_dir))


def _ops(spark: SparkSession, sf_dir: str) -> PostingsOps:
    if sf_dir not in _OPS_CACHE:
        _OPS_CACHE[sf_dir] = PostingsOps(_docs(spark, sf_dir))
    return _OPS_CACHE[sf_dir]


def _index(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) a segment index in a temp dir and return
    the SegmentIndex handle — the WAND-backed query entries run on it."""
    if sf_dir not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.segment import build_index
        from idzebra_spark.operators.wand import SegmentIndex

        path = tempfile.mkdtemp(prefix="idzebra_entry_") + "/idx"
        build_index(spark, _docs(spark, sf_dir), path,
                    shard_size=512, block_size=128)
        _IDX_CACHE[sf_dir] = SegmentIndex(spark, path)
    return _IDX_CACHE[sf_dir]


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
    """Adjacent phrase "batch batch" — the PostingsOps positional
    join (the logical/oracle path; the segment twin is wand_phrase)."""
    return (
        _ops(spark, sf_dir).phrase(["batch", "batch"])
        .orderBy(F.asc("doc_id"))
        .limit(10)
    )


# ------------------------------------------------- WAND segment engine

def q_wand_bm25_or(spark, sf_dir):
    return _index(spark, sf_dir).topk(["merge", "sort"], 10, "or")


def q_wand_bm25_and(spark, sf_dir):
    return _index(spark, sf_dir).topk(["spark", "query"], 10, "and")


def q_wand_bm25_highdf(spark, sf_dir):
    return _index(spark, sf_dir).topk(["the", "data", "key"], 10, "or")


def q_wand_bm25_not(spark, sf_dir):
    return _index(spark, sf_dir).topk(["merge", "sort"], 10, "or",
                                      not_terms=["slow"])


def q_wand_phrase(spark, sf_dir):
    return _index(spark, sf_dir).phrase(["batch", "batch"], 10)


def q_wand_bm25_batch(spark, sf_dir):
    """Batched multi-query kernel: four heterogeneous BM25 queries
    (OR / AND / high-df OR / AND-NOT) scored in ONE cogrouped pass —
    each query's rows are rank-identical to its single-query twin
    (the per-query oracles below are literally the single-query SQL
    with a query_id tag)."""
    return _index(spark, sf_dir).topk_many({
        "q_and": {"terms": ["spark", "query"], "mode": "and"},
        "q_hi": {"terms": ["the", "data", "key"], "mode": "or"},
        "q_not": {"terms": ["merge", "sort"], "mode": "or",
                  "not_terms": ["slow"]},
        "q_or": {"terms": ["merge", "sort"], "mode": "or"},
    }, k=10).orderBy("query_id", F.desc("score_milli"), F.asc("doc_id"))


def _tagged(qid: str, sql: str) -> str:
    return (f"SELECT '{qid}' AS query_id, doc_id, score_milli "
            f"FROM ({sql}) _{qid}")


_WAND_BATCH_SQL = "\nUNION ALL\n".join([
    _tagged("q_and", oracle.bm25_topk_sql(["spark", "query"], 10, "and")),
    _tagged("q_hi", oracle.bm25_topk_sql(["the", "data", "key"], 10, "or")),
]) + "\nUNION ALL\n"  # q_not appended below (needs _WAND_NOT_SQL)


# BM25 over the POST-UPDATE corpus: same text modification the
# match-key entry applies in Spark, as a distinctly-named CTE (DuckDB
# treats a CTE that names the view it reads as a circular reference)
# — ids stay the ORIGINAL ones because the match-key update preserves
# the internal id
_MATCHKEY_SQL = oracle.bm25_topk_sql(["merge", "sort"], 10, "or").replace(
    "WITH ",
    "WITH docs_mod AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
    "THEN text || ' zzupdated' ELSE text END AS text FROM documents), ",
    1,
).replace("FROM documents\n", "FROM docs_mod\n")

_WAND_NOT_SQL = oracle.bm25_topk_sql(["merge", "sort"], 10, "or").replace(
    "FROM scored",
    """FROM scored
WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM posting WHERE term = 'slow')""",
)

_WAND_BATCH_SQL = (
    _WAND_BATCH_SQL
    + _tagged("q_not", _WAND_NOT_SQL)
    + "\nUNION ALL\n"
    + _tagged("q_or", oracle.bm25_topk_sql(["merge", "sort"], 10, "or"))
    + "\nORDER BY query_id ASC, score_milli DESC, doc_id ASC"
)

# (_TREE_BATCH_SQL is composed further down, after the single-tree
# SQLs it unions are defined)


# ------------------------------------------------------- boolean layer

def q_bool_not(spark, sf_dir):
    o = _ops(spark, sf_dir)
    return (
        o.not_(o.term_docs("merge"), o.term_docs("sort"))
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_prox(spark, sf_dir):
    o = _ops(spark, sf_dir)
    return (
        o.prox("merge", "sort", "<=", 3, ordered=False)
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_trunc_prefix(spark, sf_dir):
    o = _ops(spark, sf_dir)
    return (
        o.trunc_docs(o.expand_prefix("sc"))
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_regex_terms(spark, sf_dir):
    o = _ops(spark, sf_dir)
    return (
        o.dictionary().where(F.col("term").rlike("^s[a-z]*t$"))
        .select("term", "df").orderBy(F.asc("term")).limit(100)
    )


def q_facets(spark, sf_dir):
    o = _ops(spark, sf_dir)
    hits = o.or_([o.term_docs("merge"), o.term_docs("sort")])
    return o.facets(hits, "source", 10)


def q_snippets(spark, sf_dir):
    o = _ops(spark, sf_dir)
    hits = o.term_docs("merge")
    return (
        o.snippets("merge", hits, window=2)
        .orderBy(F.asc("doc_id")).limit(10)
    )


def q_sort_by_field(spark, sf_dir):
    o = _ops(spark, sf_dir)
    hits = o.term_docs("merge")
    src = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return (
        src.join(hits, "doc_id", "semi")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(10)
    )


def _rank1_score_col(spark, sf_dir, terms: list[str]):
    """Shared rank-1 plan (rank1.c:192-218): (doc_id, rank1 score
    column) — the ONE place the integer formula lives; rank-1 and
    rank-2 both build on it."""
    p = _posting(spark, sf_dir)
    toks = p.groupBy("doc_id").agg(F.count("*").alias("doclen"))
    tf = (
        p.where(F.col("term").isin(terms))
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    nq = len(terms)
    contrib = (F.lit(8) + log2i(F.col("tf"))) * (
        F.lit(32) - log2i(F.col("df"))
    ) * F.lit(34)
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(toks, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(contrib).alias("s"),
            F.count("*").alias("nm"),
            F.first("doclen").alias("dl"),
        )
    )
    divisor = F.col("nm") * (F.lit(8) + log2i(F.floor(F.col("dl") / nq)))
    rank1 = F.least(F.lit(1000), F.floor(F.col("s") / divisor).cast("long"))
    return scored, rank1


def q_rank1(spark, sf_dir):
    """Zebra rank-1 reference scorer (rank1.c:192-218), integer exact."""
    scored, rank1 = _rank1_score_col(spark, sf_dir, ["merge", "sort"])
    return (
        scored.select("doc_id", rank1.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_parsed_bool(spark, sf_dir):
    """Query-language end-to-end: parse → rset DAG → doc set."""
    from idzebra_spark.plans.query import parse

    q = parse('(merge OR sort) AND scan NOT "batch batch"')
    return q.eval(_ops(spark, sf_dir)).orderBy(F.asc("doc_id")).limit(100)


_PARSED_BOOL_SQL = f"""
WITH {oracle.TOKS_CTE},
a AS (SELECT DISTINCT doc_id FROM posting WHERE term IN ('merge','sort')),
b AS (SELECT DISTINCT doc_id FROM posting WHERE term = 'scan'),
ph AS (
  SELECT DISTINCT p0.doc_id
  FROM posting p0 JOIN posting p1
    ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
  WHERE p0.term = 'batch' AND p1.term = 'batch'
)
SELECT doc_id FROM a
INTERSECT SELECT doc_id FROM b
EXCEPT SELECT doc_id FROM ph
ORDER BY doc_id ASC LIMIT 100
"""


def q_charmap_fold(spark, sf_dir):
    """Charmap equivalence classes (util/charmap.c:614-668,
    extract.c:1733-1749): diacritics fold to their ASCII base at
    tokenize time, so 'café' and 'cafe' share a register. Runs the
    fold tokenizer over a deterministic literal corpus (both engines
    inline the same mapping)."""
    df = spark.createDataFrame(oracle.FOLD_DEMO_ROWS, ["sid", "t"])
    return (
        tokenize(df, text_col="t", id_col="sid", alphabet="fold")
        .select(F.col("doc_id").alias("sid"), "term", "pos")
        .orderBy("sid", "pos")
    )


def q_sim_cosine_q8(spark, sf_dir):
    """Brute cosine top-k over int8-QUANTIZED embeddings — the 4×
    memory cut for a 100-TB embedding store. Scales cancel out of the
    cosine, so the kernel is integer dot products: associative →
    cross-engine parity is structural, not summation-order luck."""
    from idzebra_spark.operators.similarity import cosine_topk_q8

    emb, qv = _query_vec(spark, sf_dir, 0)
    return cosine_topk_q8(emb, qv, k=10, exclude_id=0)


def q_icu_chain(spark, sf_dir):
    """ICU-chain tokenization (zebra.cfg `icuchain words-icu.xml`,
    util/zebramap.c:232-266/:665-716): the chain XML — control
    removal, break-iterator tokenize, punctuation Remove (word-
    internal joiners delete, boundaries split), Latin-ASCII fold,
    casemap — COMPILES to a Charmap (functions/icu.py), so the whole
    pipeline stays pure-JVM expressions, and the oracle SQL is
    generated from the same compiled object. Demo rows exercise every
    compiled element ("Don't"→dont, "l'été"→lete, ÆØÅ→aeoa,
    control-join, em-dash boundary)."""
    from idzebra_spark.functions.icu import icu_chain_to_charmap

    cm = icu_chain_to_charmap(oracle.ICU_DEMO_XML)
    df = spark.createDataFrame(oracle.ICU_DEMO_ROWS, ["sid", "t"])
    return (
        tokenize(df, text_col="t", id_col="sid", alphabet=cm)
        .select(F.col("doc_id").alias("sid"), "term", "pos")
        .orderBy("sid", "pos")
    )


def q_charmap_chr(spark, sf_dir):
    """Full .chr charmap-FILE support (tab/string.chr syntax →
    util/charmap.c:743-823): the demo spec exercises every directive
    — lowercase/uppercase value sets with {a-z} ranges, space, entity
    `map` lines, diacritic maps, and `equivalent` classes with (..)
    multi-char members. The parsed Charmap compiles to pure JVM
    translate/replace/split expressions; the oracle SQL is generated
    FROM the same parsed object."""
    from idzebra_spark.functions.charmap import charmap_from_chr

    cm = charmap_from_chr(oracle.CHR_DEMO_SPEC)
    df = spark.createDataFrame(oracle.CHR_DEMO_ROWS, ["sid", "t"])
    return (
        tokenize(df, text_col="t", id_col="sid", alphabet=cm)
        .select(F.col("doc_id").alias("sid"), "term", "pos")
        .orderBy("sid", "pos")
    )


# --------------------------------------- training-data pipeline ops

def q_text_token_stats(spark, sf_dir):
    from idzebra_spark.operators.textops import token_stats

    return token_stats(_docs(spark, sf_dir)).orderBy("doc_id").limit(200)


def q_text_quality(spark, sf_dir):
    from idzebra_spark.operators.textops import quality_score

    return quality_score(_docs(spark, sf_dir)).orderBy("doc_id").limit(200)


def q_text_langid(spark, sf_dir):
    from idzebra_spark.operators.textops import lang_id

    return lang_id(_docs(spark, sf_dir)).orderBy("doc_id").limit(200)


def q_text_fingerprint(spark, sf_dir):
    from idzebra_spark.operators.textops import fingerprint

    return fingerprint(_docs(spark, sf_dir)).orderBy("doc_id").limit(200)


def q_dedup_contamination(spark, sf_dir):
    """Train/test n-gram contamination (decontamination pass): test
    docs = doc_id % 5 == 0, train = the rest; 5-gram containment ≥
    0.3 flags leakage. The containment metric is asymmetric by design
    — a test doc fully quoted in a longer train doc scores 1.0."""
    from idzebra_spark.operators.dedup import cross_contamination

    docs = _docs(spark, sf_dir)
    test = docs.where(F.col("doc_id") % 5 == 0)
    train = docs.where(F.col("doc_id") % 5 != 0)
    return (
        cross_contamination(test, train, n=5, threshold=0.3)
        .orderBy("test_id", "train_id").limit(500)
    )


def q_dedup_exact(spark, sf_dir):
    from idzebra_spark.operators.dedup import exact_dup_groups

    return exact_dup_groups(_docs(spark, sf_dir)).orderBy("sha256")


def q_dedup_jaccard(spark, sf_dir):
    from idzebra_spark.operators.dedup import jaccard_pairs

    return (
        jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.5)
        .orderBy("doc_a", "doc_b").limit(500)
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    from idzebra_spark.operators.dedup import minhash_lsh_pairs

    return (
        minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)
        .orderBy("doc_a", "doc_b").limit(500)
    )


def q_dedup_simhash(spark, sf_dir):
    from idzebra_spark.operators.dedup import simhash_dup_groups

    return simhash_dup_groups(_docs(spark, sf_dir), n_bits=32).orderBy("simhash")


def q_dedup_simhash_hamming(spark, sf_dir):
    """Banded SimHash: near-dups at Hamming distance ≤ 3 (exact-bucket
    grouping only ever finds distance 0) — band candidates + exact
    xor/bit_count verify, 100% recall within the distance budget by
    pigeonhole (4 bands, ≤ 3 differing bits)."""
    from idzebra_spark.operators.dedup import simhash_near_pairs

    return (
        simhash_near_pairs(_docs(spark, sf_dir), n_bits=32, n_bands=4,
                           max_hamming=3)
        .orderBy("doc_a", "doc_b").limit(500)
    )


def _query_vec(spark, sf_dir, vec_id=0):
    from idzebra_spark.sources.corpus import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.where(F.col("vec_id") == vec_id).select("embedding").collect()[0]
    return emb, [float(x) for x in row["embedding"]]


def q_sim_cosine_topk(spark, sf_dir):
    from idzebra_spark.operators.similarity import cosine_topk

    emb, qv = _query_vec(spark, sf_dir, 0)
    return cosine_topk(emb, qv, k=10, exclude_id=0)


_LSH_CACHE: dict[str, str] = {}


def q_sim_lsh_topk(spark, sf_dir):
    """ANN over the PERSISTED bucket-partitioned LSH index: the probe
    reads only the probed buckets' files (partition pruning), then
    exact cosine re-rank — the 100 TB shape."""
    from idzebra_spark.operators.similarity import (
        build_lsh_index,
        lsh_topk_indexed,
    )

    emb, qv = _query_vec(spark, sf_dir, 0)
    if sf_dir not in _LSH_CACHE:
        import tempfile

        path = tempfile.mkdtemp(prefix="idzebra_lsh_") + "/lsh"
        build_lsh_index(emb, path, n_planes=6)
        _LSH_CACHE[sf_dir] = path
    return lsh_topk_indexed(spark, _LSH_CACHE[sf_dir], qv, k=10,
                            n_planes=6, multiprobe_bits=1, exclude_id=0)


def q_sim_q8_indexed(spark, sf_dir):
    """Integer-cosine top-k over the PERSISTED int8 index: the q8
    codes + stored norms are a build product (build_q8_index), so the
    query scans ~1/4 the bytes of the float corpus and does zero
    quantization work. Deterministic quantization makes the result
    identical to the live `sim_cosine_q8` path — same oracle."""
    from idzebra_spark.operators.similarity import (
        build_q8_index, cosine_topk_q8_indexed)

    emb, qv = _query_vec(spark, sf_dir, 0)
    key = sf_dir + "#q8"
    if key not in _LSH_CACHE:
        import tempfile

        path = tempfile.mkdtemp(prefix="idzebra_q8_") + "/q8"
        build_q8_index(emb, path)
        _LSH_CACHE[key] = path
    return cosine_topk_q8_indexed(spark, _LSH_CACHE[key], qv, k=10,
                                  exclude_id=0)


def q_sim_ivf_topk(spark, sf_dir):
    from idzebra_spark.operators.similarity import ivf_topk

    emb, qv = _query_vec(spark, sf_dir, 0)
    return ivf_topk(emb, qv, k=10, n_probe=2, exclude_id=0)


def q_sim_ivf_kmeans(spark, sf_dir):
    """IVF with LEARNED coarse quantizer: deterministic Lloyd k-means
    labels replace the given label column, then the standard probe.
    The fixed iteration count makes the loop SQL-expressible — the
    oracle (oracle_ml.kmeans_ivf_topk_sql) unrolls the 3 Lloyd
    iterations into CTEs and must match exactly."""
    from idzebra_spark.operators.similarity import ivf_topk, kmeans_labels

    emb, qv = _query_vec(spark, sf_dir, 0)
    labels = kmeans_labels(emb, k=8, n_iter=3)
    relabeled = emb.drop("label").join(labels, "vec_id")
    return ivf_topk(relabeled, qv, k=10, n_probe=3, exclude_id=0)


def q_sim_ivf_indexed(spark, sf_dir):
    """PERSISTED IVF index probe — the scale path: vectors live in
    label-partitioned parquet (one directory per cluster), centroids
    in a k-row table computed once at build. The probe reads ONLY the
    probed clusters' partitions (PartitionFilters pruning, the IVF
    twin of build_lsh_index). Deterministic k-means labels make the
    result identical to the live `sim_ivf_kmeans` path, so the same
    unrolled-Lloyd oracle applies."""
    import tempfile

    from idzebra_spark.operators.similarity import (
        build_ivf_index, ivf_topk_indexed)

    emb, qv = _query_vec(spark, sf_dir, 0)
    key = sf_dir + "#ivf"
    if key not in _LSH_CACHE:
        path = tempfile.mkdtemp(prefix="idzebra_ivf_") + "/ivf"
        build_ivf_index(emb, path, k=8, n_iter=3)
        _LSH_CACHE[key] = path
    return ivf_topk_indexed(spark, _LSH_CACHE[key], qv, k=10,
                            n_probe=3, exclude_id=0)


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs: LSH-bucket candidates, exact
    cosine verify — the vector-space dedup op of the pipeline brief."""
    from idzebra_spark.operators.similarity import embedding_dup_pairs
    from idzebra_spark.sources.corpus import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        embedding_dup_pairs(emb, threshold=0.4, n_planes=6)
        .orderBy("vec_a", "vec_b").limit(500)
    )


def q_scan_around(spark, sf_dir):
    o = _ops(spark, sf_dir)
    return o.scan("merge", n_after=7, n_before=5)


_SCAN_AROUND_SQL = f"""
WITH {oracle.TOKS_CTE},
d AS (SELECT term, count(DISTINCT doc_id) AS df FROM posting GROUP BY term),
be4 AS (SELECT term, df FROM d WHERE term < 'merge' ORDER BY term DESC LIMIT 5),
aft AS (SELECT term, df FROM d WHERE term >= 'merge' ORDER BY term ASC LIMIT 7)
SELECT term, df FROM (SELECT * FROM be4 UNION ALL SELECT * FROM aft)
ORDER BY term ASC
"""


def q_edit_distance(spark, sf_dir):
    o = _ops(spark, sf_dir)
    return (
        o.dictionary()
        .where(F.levenshtein(F.col("term"), F.lit("mergf")) <= 1)
        .select("term", "df").orderBy(F.asc("term")).limit(50)
    )


_EDIT_DIST_SQL = f"""
WITH {oracle.TOKS_CTE},
d AS (SELECT term, count(DISTINCT doc_id) AS df FROM posting GROUP BY term)
SELECT term, df FROM d WHERE levenshtein(term, 'mergf') <= 1
ORDER BY term ASC LIMIT 50
"""


def q_numeric_relation(spark, sf_dir):
    """Numeric range over a typed column — Zebra's numeric index type
    (/root/reference/index/rpnsearch.c:1731-1828) is just a range
    predicate in SQL."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.where((F.col("value") >= 50) & (F.col("value") <= 100))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value") * 100, 0).cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


_NUMERIC_SQL = """
SELECT event_type, count(*) AS n,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_cents
FROM events WHERE value >= 50 AND value <= 100
GROUP BY event_type ORDER BY event_type ASC
"""


def q_date_relation(spark, sf_dir):
    """Date/year index types (tab/default.idx:40-52) — typed timestamp
    predicates + hourly rollup (epoch-hour ints for stable hashing)."""
    # ts is TIMESTAMP_NTZ: comparisons against an NTZ literal and
    # date-part extraction (datediff/hour) are timezone-FREE, so the
    # result is identical whatever spark.sql.session.timeZone the
    # grading driver's session uses (unix_timestamp would not be).
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    epoch_hour = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long") * 24 + F.hour("ts")
    )
    return (
        ev.where(F.col("ts")
                 < F.lit("2024-01-02 00:00:00").cast("timestamp_ntz"))
        .groupBy(epoch_hour.alias("epoch_hour"))
        .agg(F.count("*").alias("n"))
        .orderBy("epoch_hour")
    )


_DATE_SQL = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS epoch_hour, count(*) AS n
FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
GROUP BY epoch_hour ORDER BY epoch_hour ASC
"""


def q_resultset_reuse(spark, sf_dir):
    """Named result-set reference: store hits of one query, AND a new
    term against the stored set (rpnsearch.c:2743-2755)."""
    o = _ops(spark, sf_dir)
    base = o.store_set("s1", o.or_([o.term_docs("merge"), o.term_docs("sort")]))
    return (
        o.and_([o.get_set("s1"), o.term_docs("scan")])
        .orderBy(F.asc("doc_id")).limit(100)
    )


_RESULTSET_SQL = f"""
WITH {oracle.TOKS_CTE},
s1 AS (SELECT DISTINCT doc_id FROM posting WHERE term IN ('merge','sort')),
s2 AS (SELECT DISTINCT doc_id FROM posting WHERE term = 'scan')
SELECT doc_id FROM s1 INTERSECT SELECT doc_id FROM s2
ORDER BY doc_id ASC LIMIT 100
"""


def q_first_in_field(spark, sf_dir):
    """'First in field' position attribute — Zebra ANDs with a
    sentinel token at seqno=1 (/root/reference/index/rpnsearch.c:
    1465-1525); with explicit positions it is just ``pos = 1``."""
    p = _posting(spark, sf_dir)
    return (
        p.where((F.col("term") == "the") & (F.col("pos") == 1))
        .select("doc_id").distinct()
        .orderBy(F.asc("doc_id")).limit(100)
    )


_FIRST_IN_FIELD_SQL = f"""
WITH {oracle.TOKS_CTE}
SELECT DISTINCT doc_id FROM posting WHERE term = 'the' AND pos = 1
ORDER BY doc_id ASC LIMIT 100
"""


def q_fielded_search(spark, sf_dir):
    """Multi-field (ordinal) search: word-indexed `source`, complete-
    field `lang`, plus a body term — Zebra's @attr 1=<field> scoping."""
    from idzebra_spark.operators.boolean import PostingsOps, fielded_term

    o = PostingsOps(_docs(spark, sf_dir),
                    fields={"w": ["source"], "p": ["lang"]})
    hits = o.and_([
        o.term_docs(fielded_term("source", "src3")),
        o.term_docs(fielded_term("lang", "en")),
        o.term_docs("merge"),
    ])
    return hits.orderBy(F.asc("doc_id")).limit(100)


_FIELDED_SQL = f"""
WITH {oracle.TOKS_CTE}
SELECT DISTINCT doc_id FROM posting
WHERE term = 'merge'
  AND doc_id IN (SELECT doc_id FROM documents WHERE lower(source) = 'src3')
  AND doc_id IN (SELECT doc_id FROM documents WHERE lower(lang) = 'en')
ORDER BY doc_id ASC LIMIT 100
"""


# ------------------------------------------- segment-engine round 2:
# structured queries, fielded index, truncation forms, and segment-
# backed twins of the logical-layer entries (no corpus re-tokenize).

def _fielded_index(spark, sf_dir):
    """Segment index with composite field\\x1fterm keys for `source`
    (word type) and `lang` (complete-field type)."""
    key = sf_dir + "#fielded"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.segment import build_index
        from idzebra_spark.operators.wand import SegmentIndex

        path = tempfile.mkdtemp(prefix="idzebra_entry_f_") + "/idx"
        build_index(spark, _docs(spark, sf_dir), path,
                    shard_size=512, block_size=128,
                    fields={"w": ["source"], "p": ["lang"]})
        _IDX_CACHE[key] = SegmentIndex(spark, path)
    return _IDX_CACHE[key]


def q_wand_parsed_bool(spark, sf_dir):
    """Structured query evaluated as an rset DAG over SEGMENT leaves,
    ranked with corpus-GLOBAL stats (rpnsearch.c:2567-2772 over ISAMB
    leaves + resultSetRank) — no subset statistics, no re-tokenize."""
    from idzebra_spark.plans.query import parse

    q = parse('(merge OR sort) AND scan NOT "batch batch"')
    return _index(spark, sf_dir).search_tree(q.root.to_rset_tree(), 10)


_WAND_PARSED_SQL = f"""
WITH {oracle.TOKS_CTE},
a AS (SELECT DISTINCT doc_id FROM posting WHERE term IN ('merge','sort')),
b AS (SELECT DISTINCT doc_id FROM posting WHERE term = 'scan'),
ph AS (
  SELECT DISTINCT p0.doc_id
  FROM posting p0 JOIN posting p1
    ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
  WHERE p0.term = 'batch' AND p1.term = 'batch'
),
docset AS (
  SELECT doc_id FROM a INTERSECT SELECT doc_id FROM b
  EXCEPT SELECT doc_id FROM ph
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM posting WHERE term IN ('merge','scan','sort')
  GROUP BY doc_id, term
),
dft AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM posting WHERE term IN ('merge','scan','sort') GROUP BY term
),
scored AS (
  SELECT ds.doc_id,
         sum( ln(1 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf * {oracle.K1 + 1.0}
              / (tf.tf + {oracle.K1} * ({1.0 - oracle.B}
                  + {oracle.B} * doclen.doclen / stats.avgdl)) ) AS raw
  FROM docset ds
  JOIN tf ON tf.doc_id = ds.doc_id
  JOIN dft USING (term)
  JOIN doclen ON doclen.doc_id = ds.doc_id
  CROSS JOIN stats
  GROUP BY ds.doc_id
)
SELECT doc_id, CAST(round(raw * 10000) AS BIGINT) AS score_milli
FROM scored ORDER BY score_milli DESC, doc_id ASC LIMIT 10
"""


def q_wand_tree_batch(spark, sf_dir):
    """Batched STRUCTURED queries: a boolean+phrase DAG, a
    truncation-AND tree, and a proximity tree — all evaluated in ONE
    cogrouped pass (`search_tree_many`, the rset-DAG twin of
    `topk_many`). Each query's rows are rank-identical to its
    single-tree run; the oracle is the tagged union of the
    single-query SQLs."""
    from idzebra_spark.plans.query import parse

    trees = {
        "pb": parse('(merge OR sort) AND scan NOT "batch batch"')
        .root.to_rset_tree(),
        "pf": ("and", [("prefix", "sc"), ("term", "window")]),
        "pp": parse("merge NEAR/3 sort").root.to_rset_tree(),
    }
    return (
        _index(spark, sf_dir).search_tree_many(trees, 10)
        .orderBy("query_id", F.desc("score_milli"), F.asc("doc_id"))
    )


def _score_cte(terms: list[str]) -> str:
    """``score_of(doc_id, term, s)``: per-(doc, term) BM25 partial,
    restricted to the ranked term set (never the whole posting
    table — the oracle must stay O(queried terms) like
    oracle.bm25_topk_sql)."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM posting WHERE term IN ({inlist}) GROUP BY doc_id, term
),
dft AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM posting WHERE term IN ({inlist}) GROUP BY term
),
score_of AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
         * tf.tf * {oracle.K1 + 1.0}
         / (tf.tf + {oracle.K1} * ({1.0 - oracle.B}
             + {oracle.B} * doclen.doclen / stats.avgdl)) AS s
  FROM tf JOIN dft USING (term)
  JOIN doclen ON doclen.doc_id = tf.doc_id
  CROSS JOIN stats
)
"""


_TREE_PF_SQL = f"""
WITH {oracle.TOKS_CTE},
{_score_cte(["window"])},
docset AS (
  SELECT DISTINCT doc_id FROM posting WHERE term LIKE 'sc%'
  INTERSECT SELECT DISTINCT doc_id FROM posting WHERE term = 'window'
)
SELECT ds.doc_id, CAST(round(sum(s) * 10000) AS BIGINT) AS score_milli
FROM docset ds JOIN score_of sc
  ON sc.doc_id = ds.doc_id AND sc.term = 'window'
GROUP BY ds.doc_id
ORDER BY score_milli DESC, ds.doc_id ASC LIMIT 10
"""

_TREE_PP_SQL = f"""
WITH {oracle.TOKS_CTE},
{_score_cte(["merge", "sort"])},
docset AS (
  SELECT DISTINCT p1.doc_id
  FROM posting p1 JOIN posting p2
    ON p2.doc_id = p1.doc_id
   AND abs(p2.pos - p1.pos) <= 3 AND p2.pos <> p1.pos
  WHERE p1.term = 'merge' AND p2.term = 'sort'
)
SELECT ds.doc_id, CAST(round(sum(s) * 10000) AS BIGINT) AS score_milli
FROM docset ds JOIN score_of sc
  ON sc.doc_id = ds.doc_id AND sc.term IN ('merge', 'sort')
GROUP BY ds.doc_id
ORDER BY score_milli DESC, ds.doc_id ASC LIMIT 10
"""

_TREE_BATCH_SQL = (
    "\nUNION ALL\n".join([
        _tagged("pb", _WAND_PARSED_SQL),
        _tagged("pf", _TREE_PF_SQL),
        _tagged("pp", _TREE_PP_SQL),
    ])
    + "\nORDER BY query_id ASC, score_milli DESC, doc_id ASC"
)


def q_wand_fielded_search(spark, sf_dir):
    """Fielded (multi-ordinal) search on the SEGMENT engine: composite
    field\\x1fterm dictionary keys, AND-composed leaf streams."""
    from idzebra_spark.operators.boolean import fielded_term

    idx = _fielded_index(spark, sf_dir)
    tree = ("and", [
        ("term", fielded_term("source", "src3")),
        ("term", fielded_term("lang", "en")),
        ("term", "merge"),
    ])
    return idx.eval_tree(tree).orderBy(F.asc("doc_id")).limit(100)


def q_wand_phrase_highdf(spark, sf_dir):
    """Phrase of two HIGH-df terms — exercises the vectorized position
    intersection (rsprox.c:162-213 fast path) where the candidate set
    is ~every doc in the shard."""
    return _index(spark, sf_dir).phrase(["value", "table"], 10)


def q_seg_trunc_prefix(spark, sf_dir):
    return (
        _index(spark, sf_dir).eval_tree(("prefix", "sc"))
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_trunc_suffix(spark, sf_dir):
    """Left truncation (attr 5=2, rpnsearch.c:1174-1184: '(.*term)')."""
    return (
        _index(spark, sf_dir).eval_tree(("suffix", "am"))
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_trunc_both(spark, sf_dir):
    """Left+right truncation (attr 5=3: '(.*term.*)')."""
    return (
        _index(spark, sf_dir).eval_tree(("contains", "or"))
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_trunc_z3958(spark, sf_dir):
    """Z39.58 masking (attr 5=104, term_104: '?n', '*', '#')."""
    return (
        _index(spark, sf_dir).eval_tree(("z3958", "b*ch"))
        .orderBy(F.asc("doc_id")).limit(100)
    )


def _trunc_docs_sql(like: str, k: int = 100) -> str:
    return f"""
WITH {oracle.TOKS_CTE}
SELECT DISTINCT doc_id FROM posting WHERE term LIKE '{like}'
ORDER BY doc_id ASC LIMIT {k}
"""


def _z3958_docs_sql(pattern: str, k: int = 100) -> str:
    from idzebra_spark.operators.wand import z3958_to_regex

    return f"""
WITH {oracle.TOKS_CTE}
SELECT DISTINCT doc_id FROM posting
WHERE regexp_matches(term, '{z3958_to_regex(pattern)}')
ORDER BY doc_id ASC LIMIT {k}
"""


def q_seg_regex_terms(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return (
        idx.dictionary()
        .where(F.col("term").rlike("^s[a-z]*t$"))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.asc("term")).limit(100)
    )


def q_seg_scan_around(spark, sf_dir):
    d = _index(spark, sf_dir).dictionary().select(
        "term", F.col("df").cast("long").alias("df"))
    after = d.where(F.col("term") >= "merge").orderBy(F.asc("term")).limit(7)
    before = d.where(F.col("term") < "merge").orderBy(F.desc("term")).limit(5)
    return before.unionByName(after).orderBy(F.asc("term"))


def q_seg_first_in_field(spark, sf_dir):
    """First-in-field position attribute served from pos_bin."""
    idx = _index(spark, sf_dir)
    return (
        idx.term_postings(["the"])
        .where(F.element_at("positions", 1) == 1)
        .select("doc_id")
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_seg_prox(spark, sf_dir):
    """Unordered proximity over segment-decoded positions."""
    idx = _index(spark, sf_dir)
    tp = idx.term_postings(["merge", "sort"])
    p1 = (
        tp.where(F.col("term") == "merge")
        .select("doc_id", F.explode("positions").alias("pos")).alias("a")
    )
    p2 = (
        tp.where(F.col("term") == "sort")
        .select("doc_id", F.explode("positions").alias("pos")).alias("b")
    )
    m = p1.join(
        p2,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.abs(F.col("b.pos") - F.col("a.pos")) <= 3)
        & (F.col("a.pos") != F.col("b.pos")),
    )
    return (
        m.select(F.col("a.doc_id").alias("doc_id")).distinct()
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_seg_prox_ordered(spark, sf_dir):
    """Ordered proximity as an rset-tree leaf — evaluated inside the
    per-shard kernel (vectorized window search over packed position
    keys), composable with the boolean DAG."""
    idx = _index(spark, sf_dir)
    return (
        idx.eval_tree(("prox", ["merge", "sort"], "=", 2, True))
        .orderBy(F.asc("doc_id")).limit(100)
    )


# rsprox ordered path compares the RAW difference (seqno2 - seqno1
# REL distance, rsprox.c:162-213) — '= 2' means 'sort' exactly two
# positions after 'merge'.
_SEG_PROX_ORDERED_SQL = f"""
WITH {oracle.TOKS_CTE}
SELECT DISTINCT a.doc_id AS doc_id
FROM posting a JOIN posting b
  ON a.doc_id = b.doc_id AND a.term = 'merge' AND b.term = 'sort'
 AND b.pos - a.pos = 2
ORDER BY doc_id ASC LIMIT 100
"""


def q_seg_facets(spark, sf_dir):
    idx = _index(spark, sf_dir)
    hits = idx.eval_tree(("or", [("term", "merge"), ("term", "sort")]))
    src = _docs(spark, sf_dir).select("doc_id", "source")
    return (
        src.join(hits, "doc_id", "semi")
        .groupBy("source").agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("source")).limit(10)
    )


def q_seg_snippets(spark, sf_dir):
    from idzebra_spark.functions.tokenizer import tokenize_array

    idx = _index(spark, sf_dir)
    fp = idx.term_postings(["merge"]).select(
        "doc_id", F.element_at("positions", 1).alias("pos"))
    toks = _docs(spark, sf_dir).select(
        "doc_id", tokenize_array(F.col("text")).alias("toks"))
    start = F.greatest(F.col("pos") - 2, F.lit(1))
    length = F.least(F.col("pos") + 2, F.size(F.col("toks"))) - start + 1
    return (
        fp.join(toks, "doc_id")
        .select(
            "doc_id",
            F.array_join(
                F.slice(F.col("toks"), start.cast("int"),
                        length.cast("int")), " ").alias("snippet"),
        )
        .orderBy(F.asc("doc_id")).limit(10)
    )


def q_seg_scan_limited(spark, sf_dir):
    """Scan with a limiting result set (rpnscan.c:200-283): per-term
    df restricted to docs containing 'sort'; zero-count terms are
    skipped when filling the ±N window."""
    idx = _index(spark, sf_dir)
    lim = idx.eval_tree(("term", "sort"))
    return (
        idx.scan("merge", n_after=7, n_before=5, limit_set=lim)
        .orderBy(F.asc("term"))
    )


_SCAN_LIMITED_SQL = f"""
WITH {oracle.TOKS_CTE},
lim AS (SELECT DISTINCT doc_id FROM posting WHERE term = 'sort'),
d AS (
  SELECT term, count(DISTINCT p.doc_id) AS df
  FROM posting p JOIN lim USING (doc_id) GROUP BY term
),
be4 AS (SELECT term, df FROM d WHERE term < 'merge' ORDER BY term DESC LIMIT 5),
aft AS (SELECT term, df FROM d WHERE term >= 'merge' ORDER BY term ASC LIMIT 7)
SELECT term, df FROM (SELECT * FROM be4 UNION ALL SELECT * FROM aft)
ORDER BY term ASC
"""


_SCAN_LIMFIELD_SQL = """
WITH fdocs AS (
  SELECT doc_id, 's' || CAST(doc_id % 7 AS VARCHAR) AS srcterm
  FROM documents
),
lim AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
d AS (
  SELECT srcterm AS term, CAST(count(*) AS BIGINT) AS df
  FROM fdocs JOIN lim USING (doc_id) GROUP BY srcterm
),
be4 AS (SELECT term, df FROM d WHERE term < 's4' ORDER BY term DESC LIMIT 2),
aft AS (SELECT term, df FROM d WHERE term >= 's4' ORDER BY term ASC LIMIT 3)
SELECT term, df FROM (SELECT * FROM be4 UNION ALL SELECT * FROM aft)
ORDER BY term ASC
"""


def q_scan_limited_fielded(spark, sf_dir):
    """Scan with a LIMITING result set inside a FIELD register — the
    combined rpnscan path (rpnscan.c:200-283 limit probing + :285-480
    multi-ordinal scoping) that the hypothesis fuzz exercises, now
    under the driver's hard oracle: browse the `src` register around
    's4' with the window ±(3,2), counting each term only within the
    doc_id%3==0 hit set."""
    key = sf_dir + "#scanfield"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.segment import build_index
        from idzebra_spark.operators.wand import SegmentIndex

        docs = _docs(spark, sf_dir).withColumn(
            "src", F.concat(F.lit("s"), F.col("doc_id") % 7))
        path = tempfile.mkdtemp(prefix="idzebra_entry_sf_") + "/idx"
        build_index(spark, docs, path, shard_size=512, block_size=128,
                    fields={"w": ["src"]})
        _IDX_CACHE[key] = SegmentIndex(spark, path)
    idx = _IDX_CACHE[key]
    lim = _docs(spark, sf_dir).where(F.col("doc_id") % 3 == 0) \
        .select("doc_id")
    return idx.scan("s4", 3, 2, limit_set=lim, field="src")


_APPROX_COUNT_SQL = f"""
WITH {oracle.TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM posting
      WHERE term IN ('merge', 'sort')),
tot AS (SELECT count(*) AS t FROM documents),
pick AS (SELECT doc_id FROM documents WHERE (doc_id // 512) % 4 = 0),
g AS (SELECT count(*) AS g FROM pick),
sh AS (SELECT count(*) AS s FROM m JOIN pick USING (doc_id))
SELECT CAST((s * t + g // 2) // g AS BIGINT) AS approx_hits
FROM sh, tot, g
"""


def q_approx_count(spark, sf_dir):
    """Approximate hit count (zsets.c:1498-1522 estimatehits): count
    exactly on a deterministic 1/4 systematic shard sample and scale
    by the sampled document fraction with integer half-up arithmetic
    — with the 'stride' picker the estimate is a pure function of the
    corpus, so the DuckDB oracle reproduces it EXACTLY (shard =
    doc_id div 512, every 4th shard)."""
    idx = _index(spark, sf_dir)
    n = idx.approx_count(["merge", "sort"], "or",
                         sample=0.25, picker="stride")
    return spark.createDataFrame([(n,)], "approx_hits long")


def q_regex_fuzzy(spark, sf_dir):
    """Regexp-2 with embedded error budget (attr 5=103,
    rpnsearch.c:1211-1254 + dict/lookgrep.c): regex match OR ≤1 edit
    from the stem, expanded on the segment dictionary."""
    idx = _index(spark, sf_dir)
    return (
        idx.eval_tree(("fuzzy", "^s[ck]an$", "scan", 1))
        .orderBy(F.asc("doc_id")).limit(100)
    )


_REGEX_FUZZY_SQL = f"""
WITH {oracle.TOKS_CTE}
SELECT DISTINCT doc_id FROM posting
WHERE regexp_matches(term, '^s[ck]an$') OR levenshtein(term, 'scan') <= 1
ORDER BY doc_id ASC LIMIT 100
"""


def q_sort_multivalue(spark, sf_dir):
    """Multi-valued sort key: order 'merge' hits by the MIN of the
    doc's token set — resultSetSortSingle picks min/max of a
    multi-valued sort field (/root/reference/index/zsets.c:826-1073)."""
    p = _posting(spark, sf_dir)
    hits = (
        p.where(F.col("term") == "merge").select("doc_id").distinct()
    )
    keys = (
        p.join(hits, "doc_id", "semi")
        .groupBy("doc_id").agg(F.min("term").alias("sort_key"))
    )
    return keys.orderBy(F.asc("sort_key"), F.asc("doc_id")).limit(10)


_SORT_MULTI_SQL = f"""
WITH {oracle.TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM posting WHERE term = 'merge')
SELECT p.doc_id, min(p.term) AS sort_key
FROM posting p JOIN hits USING (doc_id)
GROUP BY p.doc_id ORDER BY sort_key ASC, doc_id ASC LIMIT 10
"""


def q_record_fetch_index(spark, sf_dir):
    """'zebra::index' display element set (retrieve.c:159-345,
    untrans.c): dump the indexed (term, pos) keys of fetched records
    — scoped to the first 5 'merge' hits."""
    p = _posting(spark, sf_dir)
    ids = (
        p.where(F.col("term") == "merge").select("doc_id").distinct()
        .orderBy(F.asc("doc_id")).limit(5)
    )
    return (
        p.join(ids, "doc_id", "semi")
        .select("doc_id", "term", "pos")
        .orderBy(F.asc("doc_id"), F.asc("pos")).limit(300)
    )


_FETCH_INDEX_SQL = f"""
WITH {oracle.TOKS_CTE},
ids AS (
  SELECT DISTINCT doc_id FROM posting WHERE term = 'merge'
  ORDER BY doc_id ASC LIMIT 5
)
SELECT p.doc_id, p.term, p.pos FROM posting p JOIN ids USING (doc_id)
ORDER BY doc_id ASC, pos ASC LIMIT 300
"""


def q_rank2(spark, sf_dir):
    """Zebra rank-2 (/root/reference/index/rank1.c:220-225): the
    rank-1 score MINUS the document's static rank (written as the
    first key component, /root/reference/index/key_block.c:291-295).
    Static rank here is the deterministic doc attribute pmod(doc_id,
    16) (Zebra reads it from record metadata)."""
    scored, rank1 = _rank1_score_col(spark, sf_dir, ["merge", "sort"])
    return (
        scored.select(
            "doc_id",
            (rank1 - F.pmod(F.col("doc_id"), F.lit(16))).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_RANK2_SQL = oracle.rank1_sql(["merge", "sort"], 10).replace(
    "AS score\nFROM scored",
    "- (doc_id % 16) AS score\nFROM scored",
)


def q_seg_between(spark, sf_dir):
    """rsbetween on the SEGMENT engine: marker positions decoded from
    pos_bin (term_postings), depth-counting filter — same math as the
    logical twin, no corpus re-tokenize."""
    idx = _index(spark, sf_dir)
    tp = idx.term_postings(["merge", "window", "group"])
    marks = (
        tp.where(F.col("term").isin(["window", "group"]))
        .groupBy("doc_id")
        .agg(
            F.flatten(F.collect_list(
                F.when(F.col("term") == "window", F.col("positions"))
            )).alias("starts"),
            F.flatten(F.collect_list(
                F.when(F.col("term") == "group", F.col("positions"))
            )).alias("ends"),
        )
    )
    mid = (
        tp.where(F.col("term") == "merge")
        .select("doc_id", F.explode("positions").alias("pos"))
    )
    empty = F.array().cast("array<bigint>")
    depth = (
        F.size(F.filter(F.coalesce(F.col("starts"), empty),
                        lambda s: s <= F.col("pos")))
        - F.size(F.filter(F.coalesce(F.col("ends"), empty),
                          lambda e: e < F.col("pos")))
    )
    return (
        mid.join(marks, "doc_id")
        .where(depth > 0)
        .select("doc_id").distinct()
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_seg_within_unit(spark, sf_dir):
    """search_group unit scoping on the SEGMENT engine: unit ids from
    decoded boundary-marker positions."""
    idx = _index(spark, sf_dir)
    tp = idx.term_postings(["merge", "sort", "line"])
    b = (
        tp.where(F.col("term") == "line")
        .select("doc_id", F.col("positions").alias("barr"))
    )
    empty = F.array().cast("array<bigint>")

    def units(term):
        p = (
            tp.where(F.col("term") == term)
            .select("doc_id", F.explode("positions").alias("pos"))
        )
        return p.join(b, "doc_id", "left").select(
            "doc_id",
            F.size(F.filter(F.coalesce(F.col("barr"), empty),
                            lambda x: x < F.col("pos"))).alias("unit"),
        ).distinct()

    return (
        units("merge").join(units("sort"), ["doc_id", "unit"])
        .select("doc_id").distinct()
        .orderBy(F.asc("doc_id")).limit(100)
    )


def q_record_fetch(spark, sf_dir):
    """Record retrieval with the 'meta' element set — hits resolved on
    the segment engine, records joined from the corpus
    (retrieve.c:1026-1119 element-set rendering)."""
    idx = _index(spark, sf_dir)
    hits = idx.eval_tree(("term", "merge"))
    return (
        _docs(spark, sf_dir).join(hits, "doc_id", "semi")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy(F.asc("doc_id")).limit(20)
    )


_RECORD_FETCH_SQL = f"""
WITH {oracle.TOKS_CTE}
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM posting WHERE term = 'merge')
ORDER BY doc_id ASC LIMIT 20
"""


def q_index_stats(spark, sf_dir):
    """Explain/zinfo register statistics: the segment dictionary+norms
    must agree exactly with a raw re-tokenization of the corpus — the
    index-consistency invariant (zinfo.c:1431-1456)."""
    idx = _index(spark, sf_dir)
    n_docs, _ = idx.stats()
    d = idx.dictionary().agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum("cf").cast("long").alias("n_occurrences"),
    )
    return d.select(F.lit(int(n_docs)).cast("long").alias("n_docs"),
                    "n_terms", "n_postings", "n_occurrences")


_INDEX_STATS_SQL = f"""
WITH {oracle.TOKS_CTE},
p AS (SELECT doc_id, term FROM posting)
SELECT (SELECT count(*) FROM documents) AS n_docs,
       count(DISTINCT term) AS n_terms,
       count(DISTINCT (doc_id, term)) AS n_postings,
       count(*) AS n_occurrences
FROM p
"""


def q_between_scope(spark, sf_dir):
    """rsbetween element scoping: 'merge' hits between a 'window'
    start marker and a 'group' end marker."""
    o = _ops(spark, sf_dir)
    return (
        o.between("merge", "window", "group")
        .orderBy(F.asc("doc_id")).limit(100)
    )


_BETWEEN_SQL = f"""
WITH {oracle.TOKS_CTE},
marks AS (
  SELECT doc_id,
         list_sort(list(pos) FILTER (WHERE term = 'window')) AS starts,
         list_sort(list(pos) FILTER (WHERE term = 'group'))  AS ends
  FROM posting WHERE term IN ('window','group') GROUP BY doc_id
),
mid AS (SELECT doc_id, pos FROM posting WHERE term = 'merge')
SELECT DISTINCT m.doc_id AS doc_id
FROM mid m JOIN marks USING (doc_id)
WHERE coalesce(len(list_filter(starts, s -> s <= m.pos)), 0)
    - coalesce(len(list_filter(ends, e -> e < m.pos)), 0) > 0
ORDER BY doc_id ASC LIMIT 100
"""


def q_within_unit(spark, sf_dir):
    """search_group unit scoping: 'merge' and 'sort' within the same
    unit, units delimited by the 'line' marker token."""
    o = _ops(spark, sf_dir)
    return (
        o.within_unit("merge", "sort", "line")
        .orderBy(F.asc("doc_id")).limit(100)
    )


_WITHIN_UNIT_SQL = f"""
WITH {oracle.TOKS_CTE},
b AS (
  SELECT doc_id, list_sort(list(pos)) AS barr
  FROM posting WHERE term = 'line' GROUP BY doc_id
),
u1 AS (
  SELECT DISTINCT p.doc_id,
         coalesce(len(list_filter(b.barr, x -> x < p.pos)), 0) AS unit
  FROM posting p LEFT JOIN b USING (doc_id) WHERE p.term = 'merge'
),
u2 AS (
  SELECT DISTINCT p.doc_id,
         coalesce(len(list_filter(b.barr, x -> x < p.pos)), 0) AS unit
  FROM posting p LEFT JOIN b USING (doc_id) WHERE p.term = 'sort'
)
SELECT DISTINCT doc_id FROM u1 JOIN u2 USING (doc_id, unit)
ORDER BY doc_id ASC LIMIT 100
"""


# ------------------------------------------- round-3 record filters:
# XML (mod_dom.c / mod_grs_xml.c analog, JVM xpath extraction) and
# MARC ISO2709 (mod_grs_marc.c analog, Arrow-batched binary parse).
# Both entries prove an EXACT round trip documents → records → parsed
# corpus (md5 of the body text pins byte equality), so the oracle can
# search/compare the raw `documents` table directly.

def q_xml_record_filter(spark, sf_dir):
    """XML record filter parity: documents → entity-escaped XML →
    JVM ``xpath_*`` extraction (scalar paths + a node-set path) back
    to columns. md5(text) pins the exact body round trip
    (/root/reference/index/mod_dom.c, mod_grs_xml.c)."""
    from idzebra_spark.sources.xml_filter import xml_corpus

    c = xml_corpus(_docs(spark, sf_dir))
    return (
        c.select("doc_id", "source", "lang", "tags",
                 F.md5(F.col("text")).alias("body_md5"))
        .orderBy(F.asc("doc_id")).limit(200)
    )


_XML_FILTER_SQL = """
SELECT doc_id, source, lang,
       source || ' ' || lang || ' d' || (doc_id % 7)::VARCHAR AS tags,
       md5(text) AS body_md5
FROM documents ORDER BY doc_id ASC LIMIT 200
"""


def q_marc_record_filter(spark, sf_dir):
    """MARC ISO2709 filter parity: documents → binary MARC records
    (leader + directory + 0x1E/0x1F-delimited fields) → Arrow-batched
    parse → pivoted corpus columns (mod_grs_marc.c:41-263)."""
    from idzebra_spark.sources.marc_filter import marc_corpus, synth_marc

    c = marc_corpus(synth_marc(_docs(spark, sf_dir)))
    return (
        c.select("doc_id", "source", "lang",
                 F.md5(F.col("text")).alias("body_md5"))
        .orderBy(F.asc("doc_id")).limit(200)
    )


_MARC_FILTER_SQL = """
SELECT doc_id, source, lang, md5(text) AS body_md5
FROM documents ORDER BY doc_id ASC LIMIT 200
"""


def _xml_index(spark, sf_dir):
    """Segment index built from the XML-extracted corpus — fielded
    composite keys for the xpath-derived columns (word-indexed
    `source` and node-set `tags`, complete-field `lang`)."""
    key = sf_dir + "#xml"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.segment import build_index
        from idzebra_spark.operators.wand import SegmentIndex
        from idzebra_spark.sources.xml_filter import xml_corpus

        path = tempfile.mkdtemp(prefix="idzebra_entry_x_") + "/idx"
        build_index(spark, xml_corpus(_docs(spark, sf_dir)), path,
                    shard_size=512, block_size=128,
                    fields={"w": ["source", "tags"], "p": ["lang"]})
        _IDX_CACHE[key] = SegmentIndex(spark, path)
    return _IDX_CACHE[key]


def q_incremental_compact_search(spark, sf_dir):
    """End-to-end incremental lifecycle under the driver's oracle:
    BUILD on a partial snapshot (docs with id % 3 != 0), UPDATE to
    the full corpus (the diff inserts the missing third and leaves
    untouched shards alone — extract.c:896-1100 record resolution as
    shard copy-on-write), COMPACT the two batches into one
    (compact.c), then serve BM25 top-k. The oracle is the ordinary
    whole-corpus BM25 SQL: scores must be IDENTICAL to a fresh build
    of the final snapshot, proving update+compact converge to the
    canonical register, not just a working one."""
    key = sf_dir + "#lifecycle"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.segment import (
            build_index, compact_index, update_index)
        from idzebra_spark.operators.wand import SegmentIndex

        docs = _docs(spark, sf_dir)
        path = tempfile.mkdtemp(prefix="idzebra_entry_lc_") + "/idx"
        build_index(spark, docs.where(F.col("doc_id") % 3 != 0), path,
                    shard_size=512, block_size=128)
        update_index(spark, docs, path, shard_size=512, block_size=128)
        compact_index(spark, path)
        _IDX_CACHE[key] = SegmentIndex(spark, path)
    return _IDX_CACHE[key].topk(["merge", "sort"], 10, "or")


def q_multi_db_search(spark, sf_dir):
    """Multi-DATABASE search (zebra_search_RPN_x database lists,
    zebraapi.c:1079-1112): the corpus is split across TWO separately
    built segment indexes (interleaved doc_id % 2 halves — every
    shard range exists in both members), then one BM25 top-k runs
    over the union facade. Global N / avgdl / df are re-derived by
    summing the members' per-shard rows, so scores — and therefore
    ranks and the tie discipline — are IDENTICAL to a single index
    built over the whole corpus: the oracle is the ordinary
    whole-corpus BM25 oracle, unchanged."""
    key = sf_dir + "#multidb"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.multidb import open_databases
        from idzebra_spark.operators.segment import build_index

        docs = _docs(spark, sf_dir)
        paths = []
        for i in range(2):
            p = tempfile.mkdtemp(prefix=f"idzebra_entry_db{i}_") + "/idx"
            build_index(spark, docs.where(F.col("doc_id") % 2 == i), p,
                        shard_size=512, block_size=128)
            paths.append(p)
        _IDX_CACHE[key] = open_databases(spark, paths)
    return _IDX_CACHE[key].topk(["merge", "sort"], 10, "or")


def q_update_by_matchkey(spark, sf_dir):
    """Match-spec record identity (extract.c:405-556
    get_match_from_spec, matchDict :927-1000): the index is built with
    ``match_cols=["mkey"]``, then the corpus is RE-KEYED — every doc
    comes back with a new external doc_id (crawl-style), the same
    logical key, and modified content for the id%3==0 third.
    ``update_index`` resolves each record to its existing internal id
    by match key (the preserved sysno), rebuilds only the shards whose
    content actually changed, and serving returns the ORIGINAL doc_ids
    with post-update scores. The oracle is a whole-corpus BM25 over
    the documents table with the same text modification applied in
    SQL — score- and id-identical iff identity resolution, the netted
    delete+insert, and the copy-on-write rebuild all converged to the
    canonical register."""
    key = sf_dir + "#matchkey"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.segment import build_index, update_index
        from idzebra_spark.operators.wand import SegmentIndex

        docs = _docs(spark, sf_dir).withColumn(
            "mkey", F.concat(F.lit("k"), F.col("doc_id")))
        path = tempfile.mkdtemp(prefix="idzebra_entry_mk_") + "/idx"
        build_index(spark, docs, path, shard_size=512, block_size=128,
                    match_cols=["mkey"])
        rekeyed = docs.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.col("text"), F.lit(" zzupdated")))
            .otherwise(F.col("text")).alias("text"),
            "mkey",
        )
        update_index(spark, rekeyed, path)
        _IDX_CACHE[key] = SegmentIndex(spark, path)
    return _IDX_CACHE[key].topk(["merge", "sort"], 10, "or")


def q_streaming_incremental_search(spark, sf_dir):
    """Structured-Streaming ingest under the driver's oracle: the
    corpus arrives as three file WAVES in a watched directory; each
    ``stream_build`` drain (availableNow) mirrors the new files into
    the doc_store and folds only the touched shards into the register
    (foreachBatch → update_index, the zebraidx-update daemon loop,
    SURVEY.md §3.2). The served BM25 top-k must be IDENTICAL to a
    batch build of the whole corpus — the ordinary whole-corpus
    oracle, so the micro-batch path is under the same hard signal as
    the batch lifecycle entry."""
    key = sf_dir + "#stream"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.wand import SegmentIndex
        from idzebra_spark.streaming.ingest import stream_build

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        base = tempfile.mkdtemp(prefix="idzebra_entry_st_")
        inp, ckpt, path = base + "/in", base + "/ck", base + "/idx"
        for wave in range(3):
            docs.where(F.col("doc_id") % 3 == wave).coalesce(4) \
                .write.mode("append").parquet(inp)
            stream_build(spark, inp, path, ckpt,
                         shard_size=512, block_size=128)
        _IDX_CACHE[key] = SegmentIndex(spark, path)
    return _IDX_CACHE[key].topk(["merge", "sort"], 10, "or")


def q_xml_mapped_fields(spark, sf_dir):
    """Config-DRIVEN XML indexing (the mod_dom gap): a user-supplied
    ``{index_type: {field: xpath}}`` mapping — not code — declares
    which XML nodes land in which named indexes. The mapping here
    renames fields freely (`creator` from /record/source, node-set
    `kind` from /record/tag) and the composite-key search runs over
    BOTH mapped fields (mod_dom.c processes z:index name="field:type"
    routes the same way)."""
    from idzebra_spark.operators.boolean import fielded_term

    key = sf_dir + "#xmlmap"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.segment import build_index
        from idzebra_spark.operators.wand import SegmentIndex
        from idzebra_spark.sources.xml_filter import mapped_corpus, synth_xml

        mapping = {"w": {"creator": "/record/source",
                         "kind": ("/record/tag/text()", "nodes")}}
        corpus, fields = mapped_corpus(
            synth_xml(_docs(spark, sf_dir)), mapping)
        path = tempfile.mkdtemp(prefix="idzebra_entry_xm_") + "/idx"
        build_index(spark, corpus, path, shard_size=512, block_size=128,
                    fields=fields)
        _IDX_CACHE[key] = SegmentIndex(spark, path)
    idx = _IDX_CACHE[key]
    tree = ("and", [
        ("term", fielded_term("creator", "src13")),
        ("term", fielded_term("kind", "d5")),
    ])
    return idx.eval_tree(tree).orderBy(F.asc("doc_id")).limit(100)


_XML_MAPPED_SQL = """
SELECT doc_id FROM documents
WHERE lower(source) = 'src13' AND doc_id % 7 = 5
ORDER BY doc_id ASC LIMIT 100
"""


def q_xml_fielded_search(spark, sf_dir):
    """End-to-end XML pipeline: synthesized XML records, xpath field
    extraction, fielded segment index, composite-key search — the
    `tags` leaf hits a node-set-derived field that only exists after
    XML parsing (d<doc_id%7> never occurs in the body text)."""
    from idzebra_spark.operators.boolean import fielded_term

    idx = _xml_index(spark, sf_dir)
    tree = ("and", [
        ("term", fielded_term("tags", "d3")),
        ("term", "merge"),
    ])
    return idx.eval_tree(tree).orderBy(F.asc("doc_id")).limit(100)


_XML_FIELDED_SQL = f"""
WITH {oracle.TOKS_CTE}
SELECT DISTINCT doc_id FROM posting
WHERE term = 'merge' AND doc_id % 7 = 3
ORDER BY doc_id ASC LIMIT 100
"""


def q_safari_record_filter(spark, sf_dir):
    """Safari filter parity: documents rendered as safari line records
    (pre-tokenized ``[type]id section seqno field term`` lines,
    mod_safari.c:118-190), parsed back JVM-side — the stream must be
    position-for-position the tokenizer's own posting stream."""
    from idzebra_spark.sources.safari_filter import parse_safari, synth_safari

    p = parse_safari(synth_safari(_docs(spark, sf_dir)))
    return (
        p.where(F.col("doc_id") < 20)
        .select("doc_id", "term", F.col("pos").cast("int").alias("pos"))
        .orderBy("doc_id", "pos")
    )


_SAFARI_FILTER_SQL = f"""
WITH {oracle.TOKS_CTE}
SELECT doc_id, term, pos::INTEGER AS pos FROM posting
WHERE doc_id < 20 ORDER BY doc_id, pos
"""


def _safari_index(spark, sf_dir):
    """Segment index built from the parsed safari stream via
    ``build_index(pretokenized=True)`` — no tokenizer anywhere on the
    build path; BM25 stats derive from posting counts."""
    key = sf_dir + "#safari"
    if key not in _IDX_CACHE:
        import tempfile

        from idzebra_spark.operators.segment import build_index
        from idzebra_spark.operators.wand import SegmentIndex
        from idzebra_spark.sources.safari_filter import (
            safari_postings, synth_safari)

        path = tempfile.mkdtemp(prefix="idzebra_entry_s_") + "/idx"
        build_index(spark, safari_postings(synth_safari(_docs(spark, sf_dir))),
                    path, shard_size=512, block_size=128, pretokenized=True)
        _IDX_CACHE[key] = SegmentIndex(spark, path)
    return _IDX_CACHE[key]


def q_safari_search(spark, sf_dir):
    """BM25 top-k over the PRETOKENIZED (safari-built) index — scores
    must equal the text-built index's, so the shared BM25 oracle
    applies unchanged."""
    return _safari_index(spark, sf_dir).topk(["merge", "sort"], 10, "or")


from idzebra_spark import oracle_ml  # noqa: E402

# Ordered by re-verification priority: the grading driver checks the
# FIRST 50 keys.  Round-4 rotation (VERDICT r3 item 1): the 30 entries
# whose last driver row is CORRECTNESS_r02 lead, followed by entries
# new in round 4 and entries whose shared code paths changed this
# round.  The tail is entries with a fresh green row in r03.
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # Ordering contract: the driver samples the FIRST 50 entries each
    # round, so the head rotates to whatever most needs a fresh
    # CORRECTNESS row. Round 5: (a) the 34 entries whose last driver
    # row is round 3 (they share kernel code touched since — _pin,
    # _norms_side), (b) the two NEW round-5 entries, (c) the 14
    # entries over code paths modified this round (norms pinning,
    # q8 memo, segment match_cols / build_meta swap).
    # -- (a) last driver-checked in round 3
    "safari_search": (q_safari_search,
                      oracle.bm25_topk_sql(["merge", "sort"], 10, "or")),
    "safari_record_filter": (q_safari_record_filter, _SAFARI_FILTER_SQL),
    "dedup_simhash_hamming": (
        q_dedup_simhash_hamming, oracle_ml.simhash_near_pairs_sql(32, 4, 3, 500)),
    "dedup_contamination": (
        q_dedup_contamination, oracle_ml.contamination_sql(5, 0.3, 5, 500)),
    "sim_ivf_indexed": (
        q_sim_ivf_indexed, oracle_ml.kmeans_ivf_topk_sql(0, 10, 8, 3, 3)),
    "sim_ivf_kmeans": (
        q_sim_ivf_kmeans, oracle_ml.kmeans_ivf_topk_sql(0, 10, 8, 3, 3)),
    "regex_fuzzy": (q_regex_fuzzy, _REGEX_FUZZY_SQL),
    "sort_multivalue": (q_sort_multivalue, _SORT_MULTI_SQL),
    "bm25_single": (q_bm25_single, oracle.bm25_topk_sql(["merge"], 10, "or")),
    "bm25_or": (q_bm25_or, oracle.bm25_topk_sql(["merge", "sort"], 10, "or")),
    "bm25_and": (q_bm25_and, oracle.bm25_topk_sql(["spark", "query"], 10, "and")),
    "hits_or": (q_hits_or, oracle.hit_count_sql(["merge", "sort"], "or")),
    "hits_and": (q_hits_and, oracle.hit_count_sql(["merge", "sort"], "and")),
    "dictionary_prefix": (q_dictionary_prefix, oracle.dictionary_sql("s", 100)),
    "scan": (q_scan, oracle.scan_sql("merge", 10)),
    "phrase": (q_phrase, oracle.phrase_sql(["batch", "batch"], 10)),
    "numeric_relation": (q_numeric_relation, _NUMERIC_SQL),
    "date_relation": (q_date_relation, _DATE_SQL),
    "resultset_reuse": (q_resultset_reuse, _RESULTSET_SQL),
    "fielded_search": (q_fielded_search, _FIELDED_SQL),
    "first_in_field": (q_first_in_field, _FIRST_IN_FIELD_SQL),
    "sim_lsh_topk": (q_sim_lsh_topk, oracle_ml.lsh_topk_sql(0, 10, 6, 1, 64)),
    "dedup_embedding": (q_dedup_embedding, oracle_ml.embedding_dup_pairs_sql(0.4, 6, 64, 500)),
    "dedup_simhash": (q_dedup_simhash, oracle_ml.simhash_groups_sql(32)),
    "wand_phrase_highdf": (q_wand_phrase_highdf, oracle.phrase_sql(["value", "table"], 10)),
    "wand_fielded_search": (q_wand_fielded_search, _FIELDED_SQL),
    "seg_trunc_prefix": (q_seg_trunc_prefix, oracle.trunc_prefix_sql("sc", 100)),
    "trunc_suffix": (q_trunc_suffix, _trunc_docs_sql("%am", 100)),
    "trunc_both": (q_trunc_both, _trunc_docs_sql("%or%", 100)),
    "trunc_z3958": (q_trunc_z3958, _z3958_docs_sql("b*ch", 100)),
    "seg_regex_terms": (q_seg_regex_terms, oracle.regex_terms_sql("^s[a-z]*t$", 100)),
    "seg_scan_around": (q_seg_scan_around, _SCAN_AROUND_SQL),
    "seg_first_in_field": (q_seg_first_in_field, _FIRST_IN_FIELD_SQL),
    "seg_prox_unordered": (q_seg_prox, oracle.prox_sql("merge", "sort", 3, 100)),
    # -- (b) new in round 5
    "update_by_matchkey": (q_update_by_matchkey, _MATCHKEY_SQL),
    "streaming_incremental_search": (q_streaming_incremental_search,
     oracle.bm25_topk_sql(["merge", "sort"], 10, "or")),
    "icu_chain": (q_icu_chain, oracle.icu_chain_sql()),
    "scan_limited_fielded": (q_scan_limited_fielded, _SCAN_LIMFIELD_SQL),
    "approx_hit_count": (q_approx_count, _APPROX_COUNT_SQL),
    # -- (c) code paths touched in round 5
    "wand_bm25_or": (q_wand_bm25_or, oracle.bm25_topk_sql(["merge", "sort"], 10, "or")),
    "wand_bm25_and": (q_wand_bm25_and, oracle.bm25_topk_sql(["spark", "query"], 10, "and")),
    "wand_bm25_highdf": (q_wand_bm25_highdf, oracle.bm25_topk_sql(["the", "data", "key"], 10, "or")),
    "wand_bm25_not": (q_wand_bm25_not, _WAND_NOT_SQL),
    "wand_phrase": (q_wand_phrase, oracle.phrase_sql(["batch", "batch"], 10)),
    "wand_parsed_bool": (q_wand_parsed_bool, _WAND_PARSED_SQL),
    "wand_bm25_batch": (q_wand_bm25_batch, _WAND_BATCH_SQL),
    "wand_tree_batch": (q_wand_tree_batch, _TREE_BATCH_SQL),
    "sim_cosine_q8": (q_sim_cosine_q8, oracle_ml.cosine_topk_q8_sql(0, 10)),
    "sim_q8_indexed": (q_sim_q8_indexed, oracle_ml.cosine_topk_q8_sql(0, 10)),
    "seg_scan_limited": (q_seg_scan_limited, _SCAN_LIMITED_SQL),
    # -- fresh green row in CORRECTNESS_r04; unchanged this round
    "incremental_compact_search": (
        q_incremental_compact_search,
        oracle.bm25_topk_sql(["merge", "sort"], 10, "or")),
    "scan_around": (q_scan_around, _SCAN_AROUND_SQL),
    "multi_db_search": (q_multi_db_search,
                        oracle.bm25_topk_sql(["merge", "sort"], 10, "or")),
    "text_token_stats": (q_text_token_stats, oracle_ml.token_stats_sql(200)),
    "text_quality": (q_text_quality, oracle_ml.quality_sql(200)),
    "text_langid": (q_text_langid, oracle_ml.lang_id_sql(200)),
    "text_fingerprint": (q_text_fingerprint, oracle_ml.fingerprint_sql(200)),
    "dedup_exact": (q_dedup_exact, oracle_ml.dedup_exact_sql()),
    "dedup_jaccard": (q_dedup_jaccard, oracle_ml.jaccard_pairs_sql(0.5, 500)),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, oracle_ml.minhash_lsh_pairs_sql(0.5, 16, 4, 500)),
    "sim_cosine_topk": (q_sim_cosine_topk, oracle_ml.cosine_topk_sql(0, 10)),
    "sim_ivf_topk": (q_sim_ivf_topk, oracle_ml.ivf_topk_sql(0, 10, 2)),
    "seg_prox_ordered": (q_seg_prox_ordered, _SEG_PROX_ORDERED_SQL),
    "seg_facets": (q_seg_facets, oracle.facet_sql(["merge", "sort"], "source", 10)),
    "seg_snippets": (q_seg_snippets, oracle.snippet_sql("merge", 2, 10)),
    "rank1": (q_rank1, oracle.rank1_sql(["merge", "sort"], 10)),
    "rank2": (q_rank2, _RANK2_SQL),
    "record_fetch": (q_record_fetch, _RECORD_FETCH_SQL),
    "index_stats": (q_index_stats, _INDEX_STATS_SQL),
    "between_scope": (q_between_scope, _BETWEEN_SQL),
    "within_unit": (q_within_unit, _WITHIN_UNIT_SQL),
    "seg_between": (q_seg_between, _BETWEEN_SQL),
    "seg_within_unit": (q_seg_within_unit, _WITHIN_UNIT_SQL),
    "bool_not": (q_bool_not, oracle.bool_not_sql("merge", "sort", 100)),
    "prox_unordered": (q_prox, oracle.prox_sql("merge", "sort", 3, 100)),
    "trunc_prefix": (q_trunc_prefix, oracle.trunc_prefix_sql("sc", 100)),
    "regex_terms": (q_regex_terms, oracle.regex_terms_sql("^s[a-z]*t$", 100)),
    "facets": (q_facets, oracle.facet_sql(["merge", "sort"], "source", 10)),
    "snippets": (q_snippets, oracle.snippet_sql("merge", 2, 10)),
    "sort_by_field": (q_sort_by_field, oracle.sort_by_field_sql("merge", "n_chars", 10)),
    "parsed_bool": (q_parsed_bool, _PARSED_BOOL_SQL),
    "edit_distance": (q_edit_distance, _EDIT_DIST_SQL),
    "xml_mapped_fields": (q_xml_mapped_fields, _XML_MAPPED_SQL),
    "record_fetch_index": (q_record_fetch_index, _FETCH_INDEX_SQL),
    "charmap_fold": (q_charmap_fold, oracle.charmap_fold_sql()),
    "charmap_chr": (q_charmap_chr, oracle.charmap_chr_sql()),
    "xml_record_filter": (q_xml_record_filter, _XML_FILTER_SQL),
    "xml_fielded_search": (q_xml_fielded_search, _XML_FIELDED_SQL),
    "marc_record_filter": (q_marc_record_filter, _MARC_FILTER_SQL),
}

# Round-6 rotation (the driver samples the FIRST 50 entries): lead
# with (a) every entry whose latest driver row is round 4 — nothing
# may go two rounds unsampled (tests/test_registry_freshness.py
# enforces this mechanically) — then (b) the r5-checked entries whose
# code paths round 6 rewrote (numpy embedding-dedup kernel, brute
# BM25 restructure, doc-array build kernel feeding every index-backed
# entry, serving-layout pinning, q8 memo LRU). Rotation only reorders
# the dict; every entry's query fn and oracle SQL text are unchanged.
_R6_HEAD = [
    # (a) latest row = CORRECTNESS_r04
    "incremental_compact_search", "scan_around", "multi_db_search",
    "text_token_stats", "text_quality", "text_langid", "text_fingerprint",
    "dedup_exact", "dedup_jaccard", "dedup_minhash_lsh",
    "sim_cosine_topk", "sim_ivf_topk", "seg_prox_ordered", "seg_facets",
    "seg_snippets", "rank1", "rank2", "record_fetch", "index_stats",
    "between_scope", "within_unit", "seg_between", "seg_within_unit",
    "bool_not", "prox_unordered", "trunc_prefix", "regex_terms",
    "facets", "snippets", "sort_by_field", "parsed_bool",
    "edit_distance", "xml_mapped_fields", "record_fetch_index",
    "charmap_fold", "charmap_chr", "xml_record_filter",
    "xml_fielded_search", "marc_record_filter",
    # (b) r5-checked, code rewritten in round 6
    "dedup_embedding", "dedup_contamination", "bm25_single", "bm25_or",
    "bm25_and", "sim_lsh_topk", "sim_cosine_q8", "sim_q8_indexed",
    "wand_bm25_or", "wand_tree_batch", "streaming_incremental_search",
]
assert set(_R6_HEAD) <= set(REGISTRY), sorted(set(_R6_HEAD) - set(REGISTRY))
REGISTRY = {
    **{name: REGISTRY[name] for name in _R6_HEAD},
    **{name: fn_sql for name, fn_sql in REGISTRY.items()
       if name not in _R6_HEAD},
}

