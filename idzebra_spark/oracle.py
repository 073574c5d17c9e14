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
         list_transform(
           list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'),
                       x -> x <> ''),
           x -> x[1:512]) AS arr
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


def bool_not_sql(pos_term: str, neg_term: str, k: int = 100) -> str:
    """AND-NOT — rsbool difference (/root/reference/rset/rsbool.c)."""
    return f"""
WITH {TOKS_CTE}
SELECT DISTINCT doc_id FROM posting WHERE term = '{pos_term}'
AND doc_id NOT IN (SELECT doc_id FROM posting WHERE term = '{neg_term}')
ORDER BY doc_id ASC LIMIT {k}
"""


def prox_sql(t1: str, t2: str, distance: int, k: int = 100) -> str:
    """Unordered proximity |pos2-pos1| <= distance — rsprox generic
    path (/root/reference/rset/rsprox.c:215-297)."""
    return f"""
WITH {TOKS_CTE}
SELECT DISTINCT a.doc_id AS doc_id
FROM posting a JOIN posting b
  ON a.doc_id = b.doc_id AND a.term = '{t1}' AND b.term = '{t2}'
 AND abs(b.pos - a.pos) <= {distance} AND a.pos <> b.pos
ORDER BY doc_id ASC LIMIT {k}
"""


def trunc_prefix_sql(prefix: str, k: int = 100) -> str:
    """Right truncation: docs matching any term with the prefix,
    deduped across expanded lists (/root/reference/index/trunc.c)."""
    return f"""
WITH {TOKS_CTE}
SELECT DISTINCT doc_id FROM posting WHERE term LIKE '{prefix}%'
ORDER BY doc_id ASC LIMIT {k}
"""


def regex_terms_sql(pattern: str, k: int = 100) -> str:
    """Regexp term match over the dictionary (attr 5=102,
    /root/reference/index/rpnsearch.c:1186-1210)."""
    return f"""
WITH {TOKS_CTE},
d AS (SELECT term, count(DISTINCT doc_id) AS df FROM posting GROUP BY term)
SELECT term, df FROM d WHERE regexp_matches(term, '{pattern}')
ORDER BY term ASC LIMIT {k}
"""


def facet_sql(terms: list[str], facet_col: str, n: int = 10) -> str:
    """Facet counts over an OR hit set
    (/root/reference/index/retrieve.c:698-840)."""
    return f"""
WITH {TOKS_CTE},
hits AS (
  SELECT DISTINCT doc_id FROM posting WHERE term IN {_terms_in(terms)}
)
SELECT d.{facet_col} AS {facet_col}, count(*) AS count
FROM documents d JOIN hits USING (doc_id)
GROUP BY d.{facet_col}
ORDER BY count DESC, {facet_col} ASC
LIMIT {n}
"""


def snippet_sql(term: str, window: int = 2, k: int = 10) -> str:
    """±window-token snippet around the first occurrence
    (/root/reference/util/snippet.c)."""
    return f"""
WITH {TOKS_CTE},
firstpos AS (
  SELECT doc_id, min(pos) AS pos FROM posting
  WHERE term = '{term}' GROUP BY doc_id
)
SELECT f.doc_id,
       array_to_string(
         t.arr[greatest(f.pos - {window}, 1):least(f.pos + {window}, len(t.arr))],
         ' ') AS snippet
FROM firstpos f JOIN toks t USING (doc_id)
ORDER BY f.doc_id ASC LIMIT {k}
"""


def sort_by_field_sql(term: str, field: str, k: int = 10) -> str:
    """Field sort of a hit set — resultSetSortSingle
    (/root/reference/index/zsets.c:868-1073)."""
    return f"""
WITH {TOKS_CTE},
hits AS (SELECT DISTINCT doc_id FROM posting WHERE term = '{term}')
SELECT d.doc_id, d.{field} AS {field}
FROM documents d JOIN hits USING (doc_id)
ORDER BY d.{field} DESC, d.doc_id ASC
LIMIT {k}
"""


_LOG2I = "CASE WHEN {x} <= 0 THEN 0 ELSE length(format('{{:b}}', CAST({x} AS BIGINT))) - 1 END"


def rank1_sql(terms: list[str], k: int = 10, weight: int = 34) -> str:
    """Zebra rank-1 integer formula
    (/root/reference/index/rank1.c:192-218): per matched term
    (8+log2i(tf))*(32-log2i(df))*w, normalized by
    n_matched*(8+log2i(doclen/n_query_terms)), clamped at 1000."""
    terms = sorted(set(t.lower() for t in terms))
    nq = len(terms)
    l2_tf = _LOG2I.format(x="tf.tf")
    l2_df = _LOG2I.format(x="dft.df")
    l2_dl = _LOG2I.format(x=f"doclen.doclen // {nq}")
    return f"""
WITH {TOKS_CTE},
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM posting WHERE term IN {_terms_in(terms)}
  GROUP BY doc_id, term
),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum((8 + {l2_tf}) * (32 - {l2_df}) * {weight}) AS s,
         count(*) AS nm,
         any_value(doclen.doclen) AS dl
  FROM tf JOIN dft USING (term) JOIN doclen USING (doc_id)
  GROUP BY tf.doc_id
)
SELECT doc_id,
       least(1000, CAST(floor(s / (nm * (8 + {_LOG2I.format(x=f'dl // {nq}')}))) AS BIGINT)) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


FOLD_DEMO_ROWS = [
    (0, "Café crème — naïve Zürich"),
    (1, "Œuvre æther Straße API"),
    (2, "plain ascii_text 42"),
]

# A .chr charmap file body (tab/string.chr syntax) + demo corpus for
# the charmap_chr entry: entity map lines, diacritic maps, equivalent
# classes with a (..) multi-char member — every directive form the
# parser handles (util/charmap.c:743-823 map, :614-668 equivalent).
CHR_DEMO_SPEC = """
encoding utf-8
lowercase {0-9}{a-z}
uppercase {0-9}{A-Z}
space {\\001-\\040}!"#$%&'()*+,-./:;?
map (&eacute;) é
map é e
map ü u
map ß (ss)
equivalent aä
equivalent (oe)ø
"""

CHR_DEMO_ROWS = [
    (0, "Café &eacute;clair CAFE"),
    (1, "Grün über Ärger"),
    (2, "Økonomi for Straße?"),
    (3, "x9 Ärä päivää"),
]


def _slit(s: str) -> str:
    r"""Render a string as a DuckDB literal, including the quotes.
    Strings holding control characters use an e'' escape string with
    \xHH escapes (a raw C0 byte inside a plain literal breaks the
    parser); everything else is a plain quoted literal."""
    if any(ord(c) < 0x20 or 0x7F <= ord(c) < 0xA0 for c in s):
        # C0 + DEL go through \xHH escapes; C1 (0x80-0x9F) would be
        # invalid UTF-8 as a \x byte and DuckDB has no \u escape, so
        # those splice in as chr(n) concatenations
        parts: list[str] = []
        buf: list[str] = []

        def flush():
            if buf:
                parts.append("e'" + "".join(buf) + "'")
                buf.clear()

        for c in s:
            o = ord(c)
            if 0x80 <= o < 0xA0:
                flush()
                parts.append(f"chr({o})")
            elif c == "\\":
                buf.append("\\\\")
            elif c == "'":
                buf.append("''")
            elif o < 0x20 or o == 0x7F:
                buf.append(f"\\x{o:02X}")
            else:
                buf.append(c)
        flush()
        expr = " || ".join(parts)
        return f"({expr})" if len(parts) > 1 else expr
    return "'" + s.replace("'", "''") + "'"


def charmap_tok_sql(cm, rows) -> str:
    """Tokenization oracle for ANY compiled Charmap (a parsed .chr
    file or a compiled ICU chain): DuckDB applies the SAME normalize
    pipeline the Spark tokenizer does — the Charmap object itself
    generates the SQL, so the two engines cannot drift. Uses the same
    batched-translate fast path as normalize_column when the map
    qualifies (DuckDB translate drops the tail src chars exactly like
    the JVM one)."""
    expr = "t"
    if cm.case_src:  # case pairs BEFORE lower(), as normalize_column
        expr = (f"translate({expr}, {_slit(cm.case_src)}, "
                f"{_slit(cm.case_dst)})")
    expr = f"lower({expr})"
    b = cm.batched_replaces()
    if b is not None:
        seq, tr_src, tr_dst = b
        for src, dst in seq:
            expr = f"replace({expr}, {_slit(src)}, {_slit(dst)})"
        if tr_src:
            expr = (f"translate({expr}, {_slit(tr_src)}, "
                    f"{_slit(tr_dst)})")
    else:
        for src, dst in cm.replaces:
            expr = f"replace({expr}, {_slit(src)}, {_slit(dst)})"
    import re as _re

    neg = "[^" + _re.escape(cm.value_set) + "]+"
    vals = ", ".join(f"({i}, {_slit(s)})" for i, s in rows)
    return f"""
WITH src(sid, t) AS (VALUES {vals}),
arr AS (
  SELECT sid,
         list_transform(
           list_filter(regexp_split_to_array({expr}, '{neg}'),
                       x -> x <> ''),
           x -> x[1:512]) AS a
  FROM src
)
SELECT sid, unnest(a) AS term,
       CAST(unnest(range(1, len(a) + 1)) AS INT) AS pos
FROM arr ORDER BY sid ASC, pos ASC
"""


def charmap_chr_sql() -> str:
    """.chr-spec tokenization oracle (see charmap_tok_sql)."""
    from idzebra_spark.functions.charmap import charmap_from_chr

    return charmap_tok_sql(charmap_from_chr(CHR_DEMO_SPEC),
                           CHR_DEMO_ROWS)


ICU_DEMO_XML = """
<icu_chain locale="en">
  <transform rule="[:Control:] Any-Remove"/>
  <tokenize rule="l"/>
  <transform rule="[[:WhiteSpace:][:Punctuation:]] Remove"/>
  <transform rule="Any-Latin; Latin-ASCII"/>
  <display/>
  <casemap rule="l"/>
</icu_chain>
"""

# exercises every compiled element: control-join, apostrophe-join,
# boundary punctuation, NFD accent strip, non-decomposing letters and
# ligatures, casemap
ICU_DEMO_ROWS = [
    (0, "Don't STOP\u2014now! Caf\u00e9 BR\u00dbL\u00c9E"),
    (1, "l'\u00e9t\u00e9, c'est \u00c7A (vraiment)"),
    (2, "Stra\u00dfe \u0001ok \u00c6\u00d8\u00c5 sm\u00f8rrebr\u00f8d"),
    (3, "x9 na\u00efve fa\u00e7ade \u2019tis"),
]


def icu_chain_sql() -> str:
    """ICU-chain tokenization oracle: the chain is COMPILED to a
    Charmap (functions/icu.py — zebramap.c:232-266 icuchain configs)
    and the same object emits the DuckDB pipeline."""
    from idzebra_spark.functions.icu import icu_chain_to_charmap

    return charmap_tok_sql(icu_chain_to_charmap(ICU_DEMO_XML),
                           ICU_DEMO_ROWS)


def charmap_fold_sql() -> str:
    """Charmap equivalence folding (alphabet='fold') over a literal
    accented corpus — the SAME explicit fold map (tokenizer.FOLD_SRC/
    FOLD_DST/FOLD_MULTI) inlined as translate + replace, so both
    engines normalize 'café'→'cafe', 'œuvre'→'oeuvre', 'Straße'→
    'strasse' identically (charmap.c equivalent classes)."""
    from idzebra_spark.functions.tokenizer import (
        FOLD_DST,
        FOLD_MULTI,
        FOLD_SRC,
    )

    expr = "lower(t)"
    for mk, mv in sorted(FOLD_MULTI.items()):
        expr = f"replace({expr}, '{mk}', '{mv}')"
    expr = f"translate({expr}, '{FOLD_SRC}', '{FOLD_DST}')"
    vals = ", ".join(f"({i}, '{s}')" for i, s in FOLD_DEMO_ROWS)
    return f"""
WITH src(sid, t) AS (VALUES {vals}),
arr AS (
  SELECT sid,
         list_transform(
           list_filter(regexp_split_to_array({expr}, '[^0-9a-z]+'),
                       x -> x <> ''),
           x -> x[1:512]) AS a
  FROM src
)
SELECT sid, unnest(a) AS term,
       CAST(unnest(range(1, len(a) + 1)) AS INT) AS pos
FROM arr ORDER BY sid ASC, pos ASC
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
