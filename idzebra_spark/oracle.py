"""DuckDB oracle SQL builders.

Each builder returns SQL that is semantically identical to the
corresponding Spark plan in ``idzebra_spark.entry_queries`` — same
tokenizer contract, same BM25 constants, same rounding, same ordering
and aliases (the driver hashes values after sorting columns by name,
so aliases must match exactly).

Scores are emitted as ``score_milli BIGINT`` = round(score * 10^4):
integer hashing is stable across engines, while raw float64 sums can
differ in the last ulp due to summation order.
"""

from __future__ import annotations

from idzebra_spark.functions.scoring import K1, B

# tokenize CTEs over the `documents` view (doc_id, text, ...)
TOKS_CTE = """
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                     x -> x <> '') AS arr
  FROM documents
),
posting AS (
  SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS pos
  FROM toks
),
doclen AS (SELECT doc_id, len(arr) AS doclen FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(len(arr)) AS avgdl FROM toks)
"""


def _terms_in(terms: list[str]) -> str:
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"({quoted})"


def bm25_topk_sql(terms: list[str], k: int = 10, mode: str = "or") -> str:
    terms = sorted(set(t.lower() for t in terms))
    and_filter = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    return f"""
WITH {TOKS_CTE},
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM posting WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * ({1.0 - B} + {B} * doclen.doclen / stats.avgdl))
            ) AS raw
  FROM tf
  JOIN dft USING (term)
  JOIN doclen USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
  {and_filter}
)
SELECT doc_id, CAST(round(raw * 10000) AS BIGINT) AS score_milli
FROM scored
ORDER BY score_milli DESC, doc_id ASC
LIMIT {k}
"""


def hit_count_sql(terms: list[str], mode: str = "or") -> str:
    """Total hit count for a boolean term set — Zebra's tl_query hit
    assertion analogue."""
    terms = sorted(set(t.lower() for t in terms))
    having = f"HAVING count(DISTINCT term) = {len(terms)}" if mode == "and" else ""
    return f"""
WITH {TOKS_CTE},
m AS (
  SELECT doc_id FROM posting WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id {having}
)
SELECT count(*) AS hits FROM m
"""


def dictionary_sql(prefix: str | None = None, limit: int = 100) -> str:
    """Per-term (df, cf) — the dictionary/zinfo stats surface."""
    where = f"WHERE term LIKE '{prefix}%'" if prefix else ""
    return f"""
WITH {TOKS_CTE},
d AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
  FROM posting {where}
  GROUP BY term
)
SELECT term, df, cf FROM d ORDER BY term ASC LIMIT {limit}
"""


def scan_sql(seed_term: str, n_after: int = 10) -> str:
    """Alphabetic dictionary walk from a seed — zebra_scan
    (/root/reference/index/rpnscan.c:285-480) browse semantics."""
    return f"""
WITH {TOKS_CTE},
d AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM posting GROUP BY term
)
SELECT term, df FROM d WHERE term >= '{seed_term}'
ORDER BY term ASC LIMIT {n_after}
"""


def phrase_sql(phrase_terms: list[str], k: int = 10) -> str:
    """Exact adjacent-phrase hit list (ordered, distance=1 — the
    rsprox relation==3/distance==1 fast path,
    /root/reference/rset/rsprox.c:162-213). Returns matching doc_ids
    with occurrence counts."""
    n = len(phrase_terms)
    assert n >= 2
    joins = []
    for i in range(1, n):
        joins.append(
            f"JOIN posting p{i} ON p{i}.doc_id = p0.doc_id "
            f"AND p{i}.term = '{phrase_terms[i]}' AND p{i}.pos = p0.pos + {i}"
        )
    return f"""
WITH {TOKS_CTE}
SELECT p0.doc_id, count(*) AS n_occ
FROM posting p0 {' '.join(joins)}
WHERE p0.term = '{phrase_terms[0]}'
GROUP BY p0.doc_id
ORDER BY p0.doc_id ASC
LIMIT {k}
"""
