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
    a spec mapping 'İ' to plain 'i' must run BEFORE the generic
    lower() (which would mangle 'İ' into 'i'+combining-dot)."""
    cm = charmap_from_chr("lowercase {a-z}i\nuppercase {A-Z}İ")
    assert cm.case_src == "İ" and cm.case_dst == "i"
    assert cm.fold_str("İstanbul") == "istanbul"  # no U+0307 residue


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


def test_fold_applies_to_every_query_surface(spark, tmp_path):
    """facets / snippets / sort_by_multivalue / phrase / scan must map
    query terms through the index charmap like search does — an
    accented query on a folded index hits on ALL surfaces."""
    from idzebra_spark.api import ZebraSpark

    rows = [(0, "Café merge sort", "s0"), (1, "cafe scan line", "s1"),
            (2, "plain text here", "s0")]
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    z = ZebraSpark(spark, str(tmp_path / "fidx"), corpus=corpus)
    z.build(corpus, shard_size=8, block_size=8, alphabet="fold")
    assert {r.doc_id for r in z.search("café", 10).collect()} == {0, 1}
    fac = {(r.source, r["count"]) for r in
           z.facets("café", "source", 5).collect()}
    assert fac == {("s0", 1), ("s1", 1)}
    snip = z.snippets("café", k=5).collect()
    assert {r.doc_id for r in snip} == {0, 1}
    sk = z.sort_by_multivalue("café", pick="min", k=5).collect()
    assert {r.doc_id for r in sk} == {0, 1}
    ph = {r.doc_id for r in z.phrase(["café", "merge"], 5).collect()}
    assert ph == {0}
    sc = [r.term for r in z.scan("café", n_after=3).collect()]
    assert sc and sc[0] == "cafe"


def test_scan_excludes_fielded_registers(spark, tmp_path):
    """Dictionary browse never returns composite field\\x1fterm keys;
    field= browses exactly one field's register (rpn_scan anchors to
    one ordinal)."""
    from idzebra_spark.api import ZebraSpark
    from idzebra_spark.operators.boolean import FIELD_SEP

    rows = [(0, "merge sort alpha", "en"), (1, "zebra scan", "da")]
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    z = ZebraSpark(spark, str(tmp_path / "sidx"), corpus=corpus)
    z.build(corpus, shard_size=8, block_size=8, fields={"p": ["lang"]})
    out = z.scan("merge", n_after=5, n_before=5).collect()
    assert out and all(FIELD_SEP not in r.term for r in out)
    body = {r.term for r in out}
    assert "merge" in body and not body & {"en", "da"}
    langs = [(r.term, r.df) for r in
             z.scan("", n_after=5, field="lang").collect()]
    assert langs == [("da", 1), ("en", 1)]


def test_scan_multi_ordinal_merge(spark, tmp_path):
    """field=[...] merges parallel register scans by term with summed
    df (rpnscan.c:285-480), including under a limit set."""
    from idzebra_spark.api import ZebraSpark

    rows = [(0, "alpha body", "red", "blue"),
            (1, "beta body", "blue", "green"),
            (2, "gamma body", "green", "blue")]
    corpus = spark.createDataFrame(
        rows, ["doc_id", "text", "tag_a", "tag_b"])
    z = ZebraSpark(spark, str(tmp_path / "midx"), corpus=corpus)
    z.build(corpus, shard_size=8, block_size=8,
            fields={"p": ["tag_a", "tag_b"]})
    got = [(r.term, r.df) for r in
           z.scan("", n_after=10, field=["tag_a", "tag_b"]).collect()]
    # blue: tag_a of doc1 + tag_b of docs 0,2 → df 3
    assert got == [("blue", 3), ("green", 2), ("red", 1)]
    lim = [(r.term, r.df) for r in
           z.scan("", n_after=10, field=["tag_a", "tag_b"],
                  limit_query="beta").collect()]
    assert lim == [("blue", 1), ("green", 1)]


def test_charmap_incremental_update(spark, tmp_path):
    """The update path threads a Charmap object end-to-end: changed
    and new accented docs index through the same fold as the build."""
    from idzebra_spark.api import ZebraSpark

    cm = charmap_from_chr(CHR_DEMO_SPEC)
    corpus = spark.createDataFrame(
        [(0, "Café merge sort"), (1, "cafe scan"), (2, "plain text")],
        ["doc_id", "text"])
    z = ZebraSpark(spark, str(tmp_path / "uidx"), corpus=corpus)
    z.build(corpus, shard_size=8, block_size=8, alphabet=cm)
    corpus2 = spark.createDataFrame(
        [(0, "Café merge sort"), (1, "cafe scan"),
         (2, "CAFÉ now here"), (3, "Économie text")],
        ["doc_id", "text"])
    z.update(corpus2, alphabet=cm)
    assert {r.doc_id for r in z.search("café", 10).collect()} == {0, 1, 2}
    assert {r.doc_id for r in z.search("economie", 10).collect()} == {3}


def test_charmap_is_frozen_value():
    cm = Charmap("abc")
    with pytest.raises(Exception):
        cm.value_set = "xyz"  # frozen dataclass
    assert cm.split_regex == "[^abc]+"
