"""Property-based round trips for the record-filter parsers — the
binary/line/spec formats must invert exactly for arbitrary content,
not just the synthetic corpus."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from idzebra_spark.functions.charmap import charmap_from_chr
from idzebra_spark.sources.marc_filter import encode_marc, parse_marc_record

# ---------------------------------------------------------------- MARC

_value = st.text(
    alphabet=st.characters(blacklist_characters="\x1d\x1e\x1f",
                           blacklist_categories=("Cs",)),
    min_size=0, max_size=80)
_tag_ctrl = st.sampled_from(["001", "003", "005", "008"])
_tag_var = st.text(alphabet=string.digits, min_size=3, max_size=3).filter(
    lambda t: t >= "010")
_sub = st.sampled_from(list(string.ascii_lowercase + string.digits))


@st.composite
def marc_fields(draw):
    n = draw(st.integers(1, 8))
    out = []
    for _ in range(n):
        if draw(st.booleans()):
            out.append((draw(_tag_ctrl), draw(_value)))
        else:
            subs = draw(st.lists(st.tuples(_sub, _value), min_size=1,
                                 max_size=4))
            out.append((draw(_tag_var), subs))
    return out


@settings(max_examples=150, deadline=None)
@given(marc_fields())
def test_marc_roundtrip_fuzz(fields):
    rows = parse_marc_record(encode_marc(fields))
    occ: dict = {}
    expect = []
    for tag, data in fields:
        occ[tag] = occ.get(tag, 0) + 1
        if tag < "010":
            expect.append((tag, "", "", data, occ[tag]))
        else:
            for code, val in data:
                # empty-value subfields survive; a subfield whose value
                # is empty AND is followed immediately by another marker
                # still parses as its own (code, "") pair
                expect.append((tag, "  ", code, val, occ[tag]))
    assert rows == expect


# ------------------------------------------------------------- charmap

@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .,;éüäøß",
               max_size=60))
def test_chr_fold_idempotent_and_in_valueset(s):
    """fold_str is idempotent for specs whose map targets lie inside
    the value set, and its output contains no mapped-away chars."""
    cm = charmap_from_chr(
        "lowercase {0-9}{a-z}\nmap é e\nmap ü u\nmap ß (ss)\n"
        "equivalent aä\nequivalent (oe)ø")
    once = cm.fold_str(s)
    assert cm.fold_str(once) == once
    assert not set(once) & set("éüäøß")


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from("abcdefgh"), st.sampled_from("stuvwxyz")),
    min_size=1, max_size=8, unique_by=lambda p: p[0]))
def test_chr_map_lines_apply_in_order(pairs):
    spec = "lowercase {a-z}\n" + "\n".join(
        f"map {a} {b}" for a, b in pairs)
    cm = charmap_from_chr(spec)
    s = "".join(a for a, _ in pairs)
    out = cm.fold_str(s)
    # sequential replace semantics: apply the same chain in python
    ref = s
    for a, b in pairs:
        ref = ref.replace(a, b)
    assert out == ref
