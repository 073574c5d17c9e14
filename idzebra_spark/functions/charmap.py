"""Zebra ``.chr`` charmap files as first-class tokenizer alphabets.

Reference: ``/root/reference/util/charmap.c`` (chrmaptab_create parses
the directives; read_charmap applies them at index and query time) and
the shipped ``/root/reference/tab/string.chr``. Directives handled:

- ``encoding`` — only utf-8 specs are accepted (the container has no
  iconv); anything else raises.
- ``lowercase`` / ``uppercase`` — the value set, in parallel order:
  position i of the uppercase line case-folds to position i of the
  lowercase line (charmap.c:1023-1061). ``{a-y}`` range syntax and
  ``\\ooo`` octal escapes are the tab-file forms.
- ``space`` — breaking characters. As in string.chr's own comment,
  everything OUTSIDE the lowercase value set splits anyway; the
  directive is parsed and validated but adds nothing beyond that.
- ``map X Y`` — supplemental string mapping applied after case
  folding (``(..)`` groups multi-char sequences, charmap.c:743-823).
- ``equivalent abc(xy)`` — an equivalence class: every member maps to
  the FIRST member (charmap.c:614-668), so all of them share one
  dictionary register.

The parsed :class:`Charmap` compiles to pure JVM column expressions
(``translate`` for 1:1 case/equivalence, ``replace`` chains for
multi-char maps, one regex split on the value-set complement) — the
hot path stays whole-stage-codegen, exactly like the built-in
alphabets. Pass the object anywhere ``alphabet=`` is accepted.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


def _unescape(tok: str) -> str:
    """Tab-file escapes: ``\\ooo`` octal, ``\\x`` literal."""
    out = []
    i = 0
    while i < len(tok):
        c = tok[i]
        if c == "\\" and i + 1 < len(tok):
            m = re.match(r"\\([0-7]{1,3})", tok[i:])
            if m:
                out.append(chr(int(m.group(1), 8)))
                i += 1 + len(m.group(1))
                continue
            out.append(tok[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _expand_set(spec: str) -> list[str]:
    """``{0-9}{a-y}üz`` → list of single chars, ranges expanded."""
    spec = _unescape(spec)
    out: list[str] = []
    i = 0
    while i < len(spec):
        m = re.match(r"\{(.)-(.)\}", spec[i:])
        if m:
            lo, hi = ord(m.group(1)), ord(m.group(2))
            if hi < lo:
                raise ValueError(f"bad range in charmap set: {spec[i:i+5]}")
            out.extend(chr(c) for c in range(lo, hi + 1))
            i += 5
        else:
            out.append(spec[i])
            i += 1
    return out


def _split_members(spec: str) -> list[str]:
    """``aä(ae)`` → ['a', 'ä', 'ae'] — parenthesized groups are
    multi-char members (charmap.c's (..) sequences)."""
    spec = _unescape(spec)
    out: list[str] = []
    i = 0
    while i < len(spec):
        if spec[i] == "(":
            j = spec.index(")", i)
            out.append(spec[i + 1:j])
            i = j + 1
        else:
            out.append(spec[i])
            i += 1
    return out


@dataclass(frozen=True)
class Charmap:
    """Compiled charmap: value set + case pairs + string mappings."""

    value_set: str                       # lowercase alphabet chars
    case_src: str = ""                   # uppercase chars, parallel to
    case_dst: str = ""                   # ...their lowercase partners
    replaces: tuple[tuple[str, str], ...] = field(default=())

    @property
    def split_regex(self) -> str:
        return "[^" + re.escape(self.value_set) + "]+"

    def batched_replaces(self):
        """Partition ``replaces`` into (sequential, translate) parts
        when that is provably order-equivalent, so a map with many
        single-char pairs (an ICU chain compiles to ~80 deletions)
        becomes ONE JVM translate() instead of 80 chained replaces.

        Batching a pair into the translate is safe iff the whole list
        is independent: every batched src is a single char with a
        ≤1-char dst, batched srcs are distinct, and no batched src
        char appears in ANY pair's src-beyond-itself or dst (so no
        pair can produce or consume a batched char — application
        order then cannot matter). Otherwise returns None and callers
        keep the in-order sequential semantics."""
        seq, mapped, deleted = [], [], []
        for src, dst in self.replaces:
            if len(src) == 1 and len(dst) == 1:
                mapped.append((src, dst))
            elif len(src) == 1 and dst == "":
                deleted.append(src)
            else:
                seq.append((src, dst))
        b_src = [s for s, _ in mapped] + deleted
        if len(set(b_src)) != len(b_src):
            return None
        batched = set(b_src)
        mapped_dst = {d for _, d in mapped}
        for src, dst in self.replaces:
            if batched & set(dst):
                return None
        for src, dst in seq:
            # a sequential pair that CONSUMES a batched src (order
            # decides whether the batched rule fires first: replaces
            # [(a,b),(a,xy)] on 'a' is 'b' in-order, 'xy' batched) or
            # a batched DST (a batched rule can feed it: [(a,b),
            # (bc,x)] on 'ac' is 'x' in-order, 'bc' batched) makes
            # application order observable — keep sequential semantics
            if set(src) & (batched | mapped_dst):
                return None
        # mapped pairs first, deletions after: translate() deletes the
        # src chars that have no dst counterpart (the tail)
        return (tuple(seq), "".join(b_src),
                "".join(d for _, d in mapped))

    def normalize_column(self, col: Column) -> Column:
        """Case-fold + apply mappings, all JVM expressions. The
        spec's parallel-position case pairs run BEFORE the generic
        lower(): pairs whose uppercase form lower() would mangle
        (e.g. İ → 'i'+combining-dot in java.lang) must see the
        original character."""
        if self.case_src:
            col = F.translate(col, self.case_src, self.case_dst)
        col = F.lower(col)
        b = self.batched_replaces()
        if b is not None:
            seq, tr_src, tr_dst = b
            for src, dst in seq:
                col = F.replace(col, F.lit(src), F.lit(dst))
            if tr_src:
                col = F.translate(col, tr_src, tr_dst)
            return col
        for src, dst in self.replaces:
            col = F.replace(col, F.lit(src), F.lit(dst))
        return col

    def fold_str(self, s: str) -> str:
        """Driver-side twin — normalize a query term identically."""
        if self.case_src:
            s = s.translate(str.maketrans(self.case_src, self.case_dst))
        s = s.lower()
        b = self.batched_replaces()
        if b is not None:
            seq, tr_src, tr_dst = b
            for src, dst in seq:
                s = s.replace(src, dst)
            return s.translate({
                ord(c): (tr_dst[i] if i < len(tr_dst) else None)
                for i, c in enumerate(tr_src)})
        for src, dst in self.replaces:
            s = s.replace(src, dst)
        return s


def charmap_from_chr(spec: str) -> Charmap:
    """Parse a ``.chr`` charmap file body into a :class:`Charmap`."""
    lower: list[str] = []
    upper: list[str] = []
    replaces: list[tuple[str, str]] = []
    for raw in spec.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(None, 1)
        directive, rest = parts[0], (parts[1].strip() if len(parts) > 1
                                     else "")
        if directive == "encoding":
            if rest.lower().replace("-", "") not in ("utf8", "ascii"):
                raise ValueError(f"unsupported charmap encoding {rest!r}")
        elif directive == "lowercase":
            lower = _expand_set(rest)
        elif directive == "uppercase":
            upper = _expand_set(rest)
        elif directive == "space":
            _expand_set(rest)  # validated; complement-split covers it
        elif directive == "map":
            src, dst = rest.split(None, 1)
            replaces.append((_split_members(src)[0] if "(" in src
                             else _unescape(src),
                             _split_members(dst)[0] if "(" in dst
                             else _unescape(dst)))
        elif directive == "equivalent":
            members = _split_members(rest)
            canon = members[0]
            for m in members[1:]:
                replaces.append((m, canon))
        else:
            raise ValueError(f"unknown charmap directive {directive!r}")
    if not lower:
        raise ValueError("charmap defines no lowercase value set")
    case_src = case_dst = ""
    if upper:
        if len(upper) != len(lower):
            raise ValueError("uppercase/lowercase sets differ in length")
        # parallel-position case fold beyond what lower() already does
        pairs = [(u, l) for u, l in zip(upper, lower) if u.lower() != l]
        case_src = "".join(u for u, _ in pairs)
        case_dst = "".join(l for _, l in pairs)
    return Charmap("".join(lower), case_src, case_dst, tuple(replaces))
