"""XML and MARC record filters: exact round trips, malformed-input
behavior, and the fielded-index integration (mod_dom.c /
mod_grs_xml.c / mod_grs_marc.c analogs)."""

import pytest
from pyspark.sql import functions as F

from idzebra_spark.sources.marc_filter import (
    encode_marc, marc_corpus, parse_marc, parse_marc_record, synth_marc)
from idzebra_spark.sources.xml_filter import (
    extract_records, synth_xml, xml_corpus, xml_escape, xml_unescape)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


# ------------------------------------------------------------- XML

def test_xml_escape_roundtrip(spark):  # noqa: F811
    nasty = 'a<b & c>"d" &amp; &lt;x&gt; \'e\''
    df = spark.createDataFrame([(nasty,)], "s string")
    out = df.select(
        xml_unescape(xml_escape(F.col("s"))).alias("r")).collect()[0].r
    assert out == nasty


def test_xml_extraction_roundtrip(spark, docs):  # noqa: F811
    nasty = docs.limit(8).withColumn(
        "text", F.concat(F.col("text"), F.lit(' x<y & z>"w" &amp; 2>1')))
    back = extract_records(synth_xml(nasty)).orderBy("doc_id").collect()
    orig = nasty.orderBy("doc_id").collect()
    for o, s in zip(back, orig):
        assert o.text == s.text
        assert o.source == s.source and o.lang == s.lang
        # node-set path gathers all <tag> elements in document order
        assert o.tags == f"{s.source} {s.lang} d{s.doc_id % 7}"


def test_xml_corpus_shape(docs):
    c = xml_corpus(docs)
    assert set(c.columns) == {"doc_id", "text", "source", "lang", "tags"}
    assert c.count() == docs.count()


def test_xml_fielded_index_search(spark, docs, tmp_path):  # noqa: F811
    """The xpath-derived `tags` field is searchable as a composite key
    and scopes the body term — d3 only exists post-XML-parsing."""
    from idzebra_spark.operators.boolean import fielded_term
    from idzebra_spark.operators.segment import build_index
    from idzebra_spark.operators.wand import SegmentIndex

    path = str(tmp_path / "xmlidx")
    build_index(spark, xml_corpus(docs), path, shard_size=256,
                block_size=64, fields={"w": ["tags"], "p": ["lang"]})
    idx = SegmentIndex(spark, path)
    got = {r.doc_id for r in idx.eval_tree(
        ("and", [("term", fielded_term("tags", "d3")),
                 ("term", "merge")])).collect()}
    want = {r.doc_id for r in docs
            .where((F.col("doc_id") % 7 == 3)
                   & F.col("text").rlike(r"\bmerge\b")).collect()}
    assert got == want and got


# ------------------------------------------------------------- MARC

def test_marc_control_and_variable_fields():
    rec = encode_marc([
        ("001", "42"),
        ("008", "abc"),
        ("245", [("a", "title here"), ("b", "sub")]),
        ("650", [("a", "x")]),
        ("650", [("a", "y")]),
    ])
    rows = parse_marc_record(rec)
    assert rows[0] == ("001", "", "", "42", 1)
    assert ("245", "  ", "a", "title here", 1) in rows
    assert ("245", "  ", "b", "sub", 1) in rows
    # repeated-tag occurrence counter (grs tree sibling order)
    assert ("650", "  ", "a", "x", 1) in rows
    assert ("650", "  ", "a", "y", 2) in rows


def test_marc_unicode_and_delimiters():
    # multi-byte utf-8 in values: directory lengths count BYTES
    rec = encode_marc([("245", [("a", "café — résumé")]),
                       ("520", [("a", "after")])])
    rows = parse_marc_record(rec)
    assert ("245", "  ", "a", "café — résumé", 1) in rows
    assert ("520", "  ", "a", "after", 1) in rows


def test_marc_rejects_malformed():
    with pytest.raises(ValueError):
        parse_marc_record(b"xxxxx not a record")
    with pytest.raises(ValueError):
        parse_marc_record(b"00030nam a2200000 a 4500" + b"\x1d")  # len lies
    ok = encode_marc([("001", "1")])
    bad = bytearray(ok)
    bad[24:27] = b"A!Z"  # corrupt directory tag entry digits
    with pytest.raises(ValueError):
        parse_marc_record(bytes(bad))
    # leader identifier-length digit '0' would slice subfield codes as
    # chunk[:-1] garbage — must be rejected, not defaulted
    bad0 = bytearray(encode_marc([("245", [("a", "title")])]))
    bad0[11] = ord("0")
    with pytest.raises(ValueError, match="identifier length"):
        parse_marc_record(bytes(bad0))


def test_marc_rejects_oversized_record():
    with pytest.raises(ValueError):
        encode_marc([("520", [("a", "x" * 10_000)])])


def test_marc_leader_declared_widths():
    """Parser honors leader bytes 20/21 (directory widths) like
    grs_read_iso2709 (mod_grs_marc.c:142-150), not MARC21 defaults."""
    rec = bytearray(encode_marc([("001", "7")]))
    # rewrite directory entry 3+4+5 → 3+5+6 and adjust leader/base
    tag, dlen, dstart = rec[24:27], int(rec[27:31]), int(rec[31:36])
    entry = tag + f"{dlen:05d}{dstart:06d}".encode()
    body_start = 24 + 12 + 1
    new = rec[:24] + entry + b"\x1e" + rec[body_start:]
    new[20:22] = b"56"
    base = 24 + len(entry) + 1
    new[12:17] = f"{base:05d}".encode()
    new[0:5] = f"{len(new):05d}".encode()
    assert parse_marc_record(bytes(new)) == [("001", "", "", "7", 1)]


def test_marc_spark_roundtrip(docs):
    back = marc_corpus(synth_marc(docs)).orderBy("doc_id").collect()
    orig = docs.select("doc_id", "text", "source", "lang") \
        .orderBy("doc_id").collect()
    assert len(back) == len(orig)
    for x, y in zip(back, orig):
        assert (x.doc_id, x.text, x.source, x.lang) == \
            (y.doc_id, y.text, y.source, y.lang)


# ----------------------------------------------------------- safari

def test_safari_line_forms(spark):
    """Optional type char (defaults to '0' on a digit-led line,
    mod_safari.c:146-151), term = rest of line, malformed dropped."""
    from idzebra_spark.sources.safari_filter import parse_safari

    rec = "\n".join([
        "match-key-1",
        "w7 1 3 title hello",          # typed line
        "7 1 4 title world",           # digit-led → type '0'
        "p7 1 1 author smith, john",   # term with spaces
        "garbage line",                # malformed → dropped
        "",
    ])
    df = spark.createDataFrame([(rec,)], "safari string")
    rows = {(r.doc_id, r.index_type, r.field, r.pos, r.term)
            for r in parse_safari(df).collect()}
    assert rows == {
        (7, "w", "title", 3, "hello"),
        (7, "0", "title", 4, "world"),
        (7, "p", "author", 1, "smith, john"),
    }


def test_safari_pretokenized_build_matches_text_build(spark, docs, tmp_path):
    """A safari-fed pretokenized build is rank- and stat-identical to
    the regular text build over the same corpus."""
    from idzebra_spark.operators.segment import build_index
    from idzebra_spark.operators.wand import SegmentIndex
    from idzebra_spark.sources.safari_filter import (
        safari_postings, synth_safari)

    pt, tt = str(tmp_path / "pidx"), str(tmp_path / "tidx")
    build_index(spark, safari_postings(synth_safari(docs)), pt,
                shard_size=256, block_size=64, pretokenized=True)
    build_index(spark, docs, tt, shard_size=256, block_size=64)
    pi, ti = SegmentIndex(spark, pt), SegmentIndex(spark, tt)
    for terms, mode in [(["merge", "sort"], "or"), (["spark", "query"], "and")]:
        a = [(r.doc_id, r.score_milli) for r in pi.topk(terms, 10, mode).collect()]
        b = [(r.doc_id, r.score_milli) for r in ti.topk(terms, 10, mode).collect()]
        assert a == b
    da = sorted(map(tuple, pi.dictionary().select("term", "df", "cf").collect()))
    db = sorted(map(tuple, ti.dictionary().select("term", "df", "cf").collect()))
    assert da == db


def test_safari_fielded_composite_keys(spark, tmp_path):
    """Non-body safari fields land as composite field\\x1fterm keys."""
    from idzebra_spark.operators.boolean import fielded_term
    from idzebra_spark.operators.segment import build_index
    from idzebra_spark.operators.wand import SegmentIndex
    from idzebra_spark.sources.safari_filter import parse_safari

    recs = [
        "k1\nw1 1 1 body alpha\nw1 1 2 body beta\nw1 1 1 title alpha",
        "k2\nw2 1 1 body alpha\nw2 1 1 title gamma",
    ]
    df = spark.createDataFrame([(r,) for r in recs], "safari string")
    p = parse_safari(df)
    from pyspark.sql import functions as FF
    postings = p.select(
        "doc_id", "term", "pos",
        FF.when(FF.col("field") == "body", FF.lit(None).cast("string"))
        .otherwise(FF.col("field")).alias("field"))
    path = str(tmp_path / "sidx")
    build_index(spark, postings, path, shard_size=16, block_size=8,
                pretokenized=True)
    idx = SegmentIndex(spark, path)
    hit = {r.doc_id for r in idx.eval_tree(
        ("term", fielded_term("title", "alpha"))).collect()}
    assert hit == {1}
    both = {r.doc_id for r in idx.eval_tree(("term", "alpha")).collect()}
    assert both == {1, 2}


def test_marc_parse_stream_schema(docs):
    f = parse_marc(synth_marc(docs.limit(10)))
    assert f.columns == ["doc_id", "tag", "ind", "sub", "value", "occ"]
    rows = f.collect()
    assert {r.tag for r in rows} == {"001", "008", "041", "245", "520"}
    ctrl = [r for r in rows if r.tag == "001"]
    assert all(r.ind == "" and r.sub == "" for r in ctrl)
