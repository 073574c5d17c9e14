"""ICU chain configs (`icuchain words-icu.xml`) as tokenizer alphabets.

Zebra routes an index type through YAZ's ICU chain when zebra.cfg says
``icuchain <file>`` (/root/reference/util/zebramap.c:232-266 loads the
XML via icu_chain_xml_config; :665-716 runs tokens through it). The
chain is an ordered list of elements, e.g. the shipped
/root/reference/tab/words-icu.xml:

    <icu_chain locale="en">
      <transform rule="[:Control:] Any-Remove"/>
      <tokenize rule="l"/>
      <transform rule="[[:WhiteSpace:][:Punctuation:]] Remove"/>
      <display/>
      <casemap rule="l"/>
    </icu_chain>

This module compiles the COMMON SUBSET of that config language into
the engine's :class:`~idzebra_spark.functions.charmap.Charmap` — so an
ICU-configured index reuses the whole existing pipeline unchanged:
JVM-only normalize+split expressions in the tokenizer, build_meta
persistence (the compiled pieces serialize like any .chr map), query-
side folding, and Charmap-generated oracle SQL.

Supported elements / rules (everything else raises — a chain that
would silently tokenize differently from the user's ICU intent is
worse than a loud error):

- ``<casemap rule="l|f"/>``  — lowercase / simple case-fold.
- ``<tokenize rule="l|w"/>`` — line/word break iteration; combined
  with the Remove transforms below this is whitespace-boundary
  tokenization, which is what the compiled split regex does.
- ``<transform rule="...">`` with:
  - ``[:Control:] (Any-)Remove``        — C0/C1 controls deleted
    (deleted, not split: ICU Remove joins the surrounding text).
  - ``[:Punctuation:] (Any-)Remove``    — in the chain this runs
    AFTER the break iterator, so word-internal joiners (apostrophes:
    ICU word-break MidLetter) are deleted in place ("don't" → "dont",
    "l'été" → "lete" — NOT what a plain charmap split would produce),
    while boundary punctuation (dashes, brackets, terminals) stays a
    token boundary exactly as the break iterator already made it.
  - ``[[:WhiteSpace:][:Punctuation:]] Remove`` — ditto; the
    whitespace half is the token boundary itself.
  - ``NFD; [:Nonspacing Mark:] Remove; NFC`` — accent strip via NFD
    decomposition (1:1 pairs computed at compile time).
  - ``(Any-Latin; )?Latin-ASCII``       — the fuller fold: NFD strip
    plus the non-decomposing letters and ligatures (ø→o, æ→ae, ß→ss),
    reusing the tokenizer's explicit fold tables. KNOWN GAP: only the
    Latin-ASCII half is implemented — the Any-Latin script
    TRANSLITERATION (Greek/Cyrillic/… → Latin) is not, so non-Latin
    text tokenizes to nothing (dropped by the [0-9a-z] value set)
    instead of transliterated terms. The rule stays accepted because
    it appears in real chains whose corpora are Latin-script; for a
    non-Latin corpus this chain does NOT match ICU intent — use
    ``alphabet='unicode'`` or a custom .chr map instead.
  - ``Any-Lower`` / ``Lower``           — same as casemap l.
- ``<display/>``, ``<index/>``, ``<sortkey/>`` — display/sort forks
  are not materialized (the engine serves display terms from the
  stored corpus); accepted and ignored.

Scope cut (documented in README): ICU's full transliteration-rule
language and locale-tailored collation are NOT parsed — only the
chain elements above, which cover Zebra's shipped chains
(tab/words-icu.xml, tab/phrases-icu.xml, tab/words-icu-da.xml).
"""

from __future__ import annotations

import unicodedata
import xml.etree.ElementTree as ET

from idzebra_spark.functions.charmap import Charmap

# the Latin repertoire the compiled chains cover (value-set chars that
# survive normalization + may appear in unfolded chains)
_ASCII_ALNUM = "0123456789abcdefghijklmnopqrstuvwxyz"

# C0 + DEL + C1 controls (ICU [:Control:]). NUL is excluded from the
# delete set — SQL varchar cannot carry it, so it stays a SPLIT
# boundary (absent from the value set) in both engines; the only
# divergence from ICU is 'a\x00b' splitting instead of joining.
_CONTROLS = "".join(chr(c) for c in (*range(0x01, 0x20), 0x7F,
                                     *range(0x80, 0xA0)))

# Word-internal joiner punctuation: ICU's word-break property
# MidLetter/MidNumLet — the characters the break iterator keeps INSIDE
# a word, which the post-tokenize Remove transform then deletes
# ("don't" -> "dont"). All other punctuation is a break-iterator
# boundary and therefore compiles to a SPLIT (absent from the value
# set), not a join.
_JOIN_PUNCT = "'\u2019\u02bc\u00b7\u2027"


def _nfd_strip_pairs() -> list[tuple[str, str]]:
    """1:1 lowercase accent→base pairs from NFD decomposition (the
    `NFD; [:Nonspacing Mark:] Remove; NFC` transform), Latin-1
    Supplement through Latin Extended-B."""
    out = []
    for cp in range(0x00C0, 0x0250):
        ch = chr(cp)
        if not ch.islower():
            continue
        base = "".join(c for c in unicodedata.normalize("NFD", ch)
                       if not unicodedata.combining(c))
        if base != ch and len(base) == 1 and base.isascii() and base.isalpha():
            out.append((ch, base))
    return out


def _latin_ascii_pairs() -> list[tuple[str, str]]:
    """The Latin-ASCII transliterator subset: NFD strip + the
    non-decomposing letters/ligatures (same explicit tables the
    'fold' alphabet uses, so both spellings agree)."""
    from idzebra_spark.functions.tokenizer import (
        FOLD_DST,
        FOLD_MULTI,
        FOLD_SRC,
    )

    pairs = [(k, v) for k, v in sorted(FOLD_MULTI.items())]
    pairs += list(zip(FOLD_SRC, FOLD_DST))
    return pairs


def _norm_rule(rule: str) -> str:
    return " ".join(rule.split()).lower()


def icu_chain_to_charmap(xml_spec: str) -> Charmap:
    """Compile an icu_chain XML document to a :class:`Charmap`."""
    root = ET.fromstring(xml_spec)
    if root.tag != "icu_chain":
        raise ValueError(f"expected <icu_chain>, got <{root.tag}>")

    replaces: list[tuple[str, str]] = []
    folded_to_ascii = False
    strip_accents = False
    saw_casemap = False

    for el in root:
        if el.tag in ("display", "index", "sortkey"):
            continue
        rule = _norm_rule(el.get("rule", ""))
        if el.tag == "casemap":
            if rule not in ("l", "f"):
                raise ValueError(f"unsupported casemap rule {rule!r} "
                                 "(supported: l, f)")
            saw_casemap = True
        elif el.tag == "tokenize":
            if rule not in ("l", "w"):
                raise ValueError(f"unsupported tokenize rule {rule!r} "
                                 "(supported: l, w)")
        elif el.tag == "transform":
            if rule in ("[:control:] any-remove", "[:control:] remove"):
                replaces += [(c, "") for c in _CONTROLS]
            elif rule in ("[:punctuation:] any-remove",
                          "[:punctuation:] remove",
                          "[[:whitespace:][:punctuation:]] remove",
                          "[[:whitespace:][:punctuation:]] any-remove"):
                # boundary punctuation splits via the value set (the
                # break iterator ran before the Remove in ICU); only
                # the word-internal joiners compile to deletions
                replaces += [(c, "") for c in _JOIN_PUNCT]
            elif rule == "nfd; [:nonspacing mark:] remove; nfc":
                replaces += _nfd_strip_pairs()
                strip_accents = True
            elif rule in ("latin-ascii", "any-latin; latin-ascii"):
                replaces += _latin_ascii_pairs()
                folded_to_ascii = True
            elif rule in ("any-lower", "lower"):
                saw_casemap = True
            else:
                raise ValueError(
                    f"unsupported ICU transform rule {rule!r} — see "
                    "functions/icu.py for the compiled subset")
        else:
            raise ValueError(f"unsupported icu_chain element <{el.tag}>")

    if not saw_casemap:
        # Charmap.normalize_column always lowercases; a chain without
        # any casemap would index case-sensitively, which the compile
        # cannot express — refuse rather than silently diverge.
        raise ValueError("icu_chain without casemap/Any-Lower is not "
                         "supported (the compiled pipeline lowercases)")

    # alphabet: ascii after a full fold; otherwise keep the lowercase
    # accented range so unfolded chains don't split 'café' at 'é'
    value_set = _ASCII_ALNUM
    if not folded_to_ascii:
        extra = [chr(c) for c in range(0x00C0, 0x0250)
                 if chr(c).islower()]
        if strip_accents:
            # decomposables are already mapped away; keep only the
            # non-decomposing survivors (ø, æ, ß, ...)
            stripped = {s for s, _ in _nfd_strip_pairs()}
            extra = [c for c in extra if c not in stripped]
        value_set = _ASCII_ALNUM + "".join(extra)

    # dedupe while preserving first occurrence (a chain may name
    # overlapping transforms, e.g. NFD-strip then Latin-ASCII)
    seen: set[str] = set()
    uniq: list[tuple[str, str]] = []
    for src, dst in replaces:
        if src not in seen:
            seen.add(src)
            uniq.append((src, dst))
    return Charmap(value_set=value_set, replaces=tuple(uniq))
