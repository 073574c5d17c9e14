"""Charmap-equivalent tokenizer, expressed with JVM built-ins only.

Zebra's default "word" index type (`w`) normalizes through the charmap
pipeline — lowercase, split on any character not in the mapped
alphabet, emit one token per word with an incrementing ``seqno``
(reference: /root/reference/tab/string.chr:8-14 defines lowercase
a-z0-9 as the alphabet and everything else as space;
/root/reference/index/extract.c:1666-1721 is the incomplete-field
token loop that assigns positions). Tokens are capped at
``IT_MAX_WORD`` = 512 bytes (/root/reference/include/it_key.h:27).

Spark-first: the whole pipeline is ``lower`` → ``split`` (regex) →
``filter`` → ``posexplode`` — all JVM/whole-stage-codegen, zero Python
in the hot path. Positions are 1-based over *non-empty* tokens, which
matches Zebra (separator runs produce no token, no position gap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Zebra charmap: alphabet = [0-9a-z] after lowercasing; all else splits.
# (tab/string.chr:8-14 — `lowercase {0-9}{a-z}`, `space {\001-\055 ...}`)
# This is the DEFAULT — it matches the reference's shipped string.chr
# and the DuckDB oracle contract, and it DROPS all non-Latin text
# (documented limitation, pinned by tests/test_tokenizer.py).
TOKEN_SPLIT_RE = "[^0-9a-z]+"

# Unicode charmap: alphabet = any letter or decimal digit (the ICU
# analogue of Zebra's icu.chr / charmap.c equivalence classes,
# /root/reference/util/charmap.c, /root/reference/index/extract.c:
# 1733-1749). Java regex classes run JVM-side like the ASCII one.
TOKEN_SPLIT_RE_UNICODE = r"[^\p{L}\p{Nd}]+"

MAX_TOKEN_LEN = 512  # IT_MAX_WORD, include/it_key.h:27


def _build_fold_map() -> tuple[str, str, dict[str, str]]:
    """Diacritic equivalence classes — Zebra's charmap ``equivalent``
    lines / ICU transforms (/root/reference/util/charmap.c:614-668,
    applied at /root/reference/index/extract.c:1733-1749): 'é' indexes
    and queries as 'e'. Built ONCE from NFD decomposition (strip
    combining marks) over the Latin-1 Supplement + Latin Extended
    ranges, plus the non-decomposing letters and ligatures Zebra's
    shipped charmaps map by hand. Returns (from, to) 1:1 translate
    strings and the multi-char replacement table — explicit literals
    so the DuckDB oracle can inline the SAME mapping."""
    import unicodedata

    src, dst = [], []
    for cp in range(0x00C0, 0x0250):
        ch = chr(cp)
        if not ch.islower():     # applied after lower(); map lowercase only
            continue
        base = "".join(c for c in unicodedata.normalize("NFD", ch)
                       if not unicodedata.combining(c))
        if base != ch and len(base) == 1 and base.isascii() and base.isalpha():
            src.append(ch)
            dst.append(base)
    # non-decomposing single letters
    for ch, base in (("ø", "o"), ("đ", "d"), ("ħ", "h"), ("ł", "l"),
                     ("ŧ", "t"), ("ð", "d")):
        if ch not in src:
            src.append(ch)
            dst.append(base)
    multi = {"æ": "ae", "œ": "oe", "ß": "ss", "þ": "th"}
    return "".join(src), "".join(dst), multi


FOLD_SRC, FOLD_DST, FOLD_MULTI = _build_fold_map()


def fold_column(col: Column) -> Column:
    """Apply the charmap equivalence fold to a LOWERCASED column —
    multi-char ligatures first (1:n), then the 1:1 translate. Pure
    JVM expressions."""
    for k, v in sorted(FOLD_MULTI.items()):
        col = F.replace(col, F.lit(k), F.lit(v))
    return F.translate(col, FOLD_SRC, FOLD_DST)


def fold_str(s: str) -> str:
    """Driver-side twin of :func:`fold_column` — fold a query term the
    same way the index folded its tokens."""
    s = s.lower()
    for k, v in sorted(FOLD_MULTI.items()):
        s = s.replace(k, v)
    return s.translate(str.maketrans(FOLD_SRC, FOLD_DST))


def tokenize_array(text: Column, alphabet: str = "ascii") -> Column:
    """Return an ``array<string>`` of normalized tokens for ``text``.

    Pure column expression (JVM-side): lowercase, regex split, drop
    empties, truncate to MAX_TOKEN_LEN. ``alphabet='unicode'`` keeps
    any letter/digit (ICU-style); ``alphabet='fold'`` maps diacritic
    equivalence classes to their ASCII base ('café' → 'cafe' — the
    charmap.c equivalent-class behavior) before the ASCII split; the
    default keeps [0-9a-z] only — the reference's default charmap and
    the oracle contract.

    (r6 note: a boundary-empty ``slice`` + per-row-guarded truncation
    variant was built and measured SLOWER — the extra references to
    the split result re-evaluate the regex split per reference (no CSE
    across interpreted HOF boundaries), 1.09 s → 3.41 s on the sf1.0
    corpus scan. The single filter+transform chain keeps one split.)
    """
    if not isinstance(alphabet, str):
        # a parsed .chr Charmap (functions/charmap.py): custom value
        # set, case pairs and map/equivalent replaces — still pure JVM
        lowered = alphabet.normalize_column(text)
        regex = alphabet.split_regex
        arr = F.split(lowered, regex)
        arr = F.filter(arr, lambda t: t != F.lit(""))
        return F.transform(arr, lambda t: F.substring(t, 1, MAX_TOKEN_LEN))
    lowered = F.lower(text)
    if alphabet == "fold":
        lowered = fold_column(lowered)
    regex = (TOKEN_SPLIT_RE_UNICODE if alphabet == "unicode"
             else TOKEN_SPLIT_RE)
    arr = F.split(lowered, regex)
    arr = F.filter(arr, lambda t: t != F.lit(""))
    return F.transform(arr, lambda t: F.substring(t, 1, MAX_TOKEN_LEN))


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alphabet: str = "ascii",
) -> DataFrame:
    """Explode a corpus into logical postings ``(doc_id, term, pos)``.

    ``pos`` is 1-based token position within the document — the Spark
    column equivalent of ``it_key.mem[seqno]``
    (/root/reference/index/extract.c:1580-1588).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokenize_array(F.col(text_col), alphabet).alias("_toks"),
    )
    return toks.select(
        "doc_id",
        F.posexplode("_toks").alias("_p", "term"),
    ).select(
        "doc_id",
        "term",
        (F.col("_p") + 1).cast("int").alias("pos"),
    )


def doc_lengths(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token counts ``(doc_id, doclen)`` — BM25's |d|."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenize_array(F.col(text_col))).alias("doclen"),
    )
