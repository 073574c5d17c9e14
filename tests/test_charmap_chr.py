"""Parsed .chr charmap files as tokenizer alphabets
(util/charmap.c directives → JVM translate/replace/split)."""

import pytest
from pyspark.sql import functions as F

from idzebra_spark.functions.charmap import (
    Charmap, _expand_set, _split_members, charmap_from_chr)
from idzebra_spark.functions.tokenizer import tokenize
from idzebra_spark.oracle import CHR_DEMO_ROWS, CHR_DEMO_SPEC


def test_spec_parsing_forms():
    cm = charmap_from_chr(CHR_DEMO_SPEC)
    assert len(cm.value_set) == 36  # {0-9}{a-z}
    # file-order replaces: entity → accent → base, then equivalents
    assert cm.replaces[0] == ("&eacute;", "é")
    assert ("ø", "oe") in cm.replaces
    assert cm.fold_str("Café &eacute;clair") == "cafe eclair"
    assert cm.fold_str("Straße") == "strasse"


def test_expand_set_and_members():
    assert _expand_set("{a-c}x\\040") == ["a", "b", "c", "x", " "]
    assert _expand_set("{0-2}") == ["0", "1", "2"]
    assert _split_members("aä(ae)") == ["a", "ä", "ae"]
    with pytest.raises(ValueError):
        _expand_set("{z-a}")


def test_spec_errors():
    with pytest.raises(ValueError):
        charmap_from_chr("encoding latin-1\nlowercase {a-z}")
    with pytest.raises(ValueError):
        charmap_from_chr("map x y")  # no value set
    with pytest.raises(ValueError):
        charmap_from_chr("lowercase {a-z}\nfrobnicate x")
    with pytest.raises(ValueError):
        charmap_from_chr("lowercase {a-z}\nuppercase {A-B}")


def test_uppercase_beyond_ascii_lower():
    """Parallel-position case pairs cover folds lower() doesn't do —
    e.g. a spec mapping 'İ' to plain 'i'."""
    cm = charmap_from_chr("lowercase {a-z}i\nuppercase {A-Z}İ")
    assert cm.fold_str("İstanbul".replace("i̇", "i")).startswith("i")


def test_tokenize_with_charmap(spark):
    cm = charmap_from_chr(CHR_DEMO_SPEC)
    df = spark.createDataFrame(CHR_DEMO_ROWS, ["sid", "t"])
    toks = tokenize(df, text_col="t", id_col="sid", alphabet=cm)
    got = [(r.doc_id, r.term, r.pos) for r in
           toks.orderBy("doc_id", "pos").collect()]
    assert got[:3] == [(0, "cafe", 1), (0, "eclair", 2), (0, "cafe", 3)]
    assert (2, "oekonomi", 1) in got
    assert (2, "strasse", 3) in got


def test_charmap_indexed_roundtrip(spark, tmp_path):
    """Index built with a .chr Charmap: accented queries hit the
    folded register end-to-end (build + query share the mapping)."""
    from idzebra_spark.api import ZebraSpark

    cm = charmap_from_chr(CHR_DEMO_SPEC)
    rows = [(0, "Café merge sort"), (1, "cafe scan"), (2, "unrelated text")]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    z = ZebraSpark(spark, str(tmp_path / "idx"))
    z.build(corpus, shard_size=8, block_size=8, alphabet=cm)
    hits = {r.doc_id for r in z.search("café", 10).collect()}
    assert hits == {0, 1}
    hits2 = {r.doc_id for r in z.search("CAFE", 10).collect()}
    assert hits2 == {0, 1}


def test_charmap_is_frozen_value():
    cm = Charmap("abc")
    with pytest.raises(Exception):
        cm.value_set = "xyz"  # frozen dataclass
    assert cm.split_regex == "[^abc]+"
