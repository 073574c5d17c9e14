"""XML record filter — Spark analog of Zebra's DOM/XML record filters.

Reference: ``/root/reference/index/mod_dom.c`` (libxml2 DOM filter;
configured element paths map XML nodes to index fields, text gathered
from descendant text nodes) and ``mod_grs_xml.c`` (expat event
parser building the same GRS tree). Zebra's ``dom`` filter walks the
parsed record and emits ``(field, term-stream)`` pairs which
``extract.c`` turns into dictionary keys.

Spark-first shape: parsing runs as the JVM ``xpath_*`` Catalyst
expressions — no Python in the extract path, the whole map from raw
XML string column to typed field columns is one whole-stage-codegen
projection. The extracted frame plugs straight into
``build_index(fields=...)``, so XML records get the same composite
``field\\x1fterm`` dictionary keys (and the same WAND/rset engines)
as any other corpus.

Two directions are provided so tests and oracles can prove an exact
round trip without any external data:

- :func:`synth_xml` — deterministically wraps the driver `documents`
  table into XML records (entity-escaped, multi-valued ``<tag>``
  elements exercise node-set extraction);
- :func:`extract_records` — xpath-driven extraction back to columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Entity escaping, applied amp-first (encode) / amp-last (decode) so
# '&lt;' in source text survives a round trip (mod_dom relies on
# libxml2 for this; here it is explicit JVM `replace` chains).
_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                ('"', "&quot;"), ("'", "&apos;")]


def xml_escape(c: Column) -> Column:
    for raw, ent in _XML_ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(ent))
    return c


def xml_unescape(c: Column) -> Column:
    for raw, ent in reversed(_XML_ESCAPES):
        c = F.replace(c, F.lit(ent), F.lit(raw))
    return c


def synth_xml(docs: DataFrame) -> DataFrame:
    """(doc_id, xml) — deterministic XML records over the `documents`
    table. The ``<tag>`` element repeats (source, lang, 'd<doc_id%7>')
    so node-set xpath extraction is exercised, not just scalar paths."""
    esc = lambda col: xml_escape(F.col(col).cast("string"))  # noqa: E731
    tag = lambda c: F.concat(F.lit("<tag>"), c, F.lit("</tag>"))  # noqa: E731
    return docs.select(
        "doc_id",
        F.concat(
            F.lit('<record id="'), F.col("doc_id").cast("string"),
            F.lit('"><source>'), esc("source"),
            F.lit("</source><lang>"), esc("lang"),
            F.lit("</lang>"),
            tag(esc("source")), tag(esc("lang")),
            tag(F.concat(F.lit("d"), (F.col("doc_id") % 7).cast("string"))),
            F.lit("<body>"), esc("text"), F.lit("</body></record>"),
        ).alias("xml"),
    )


# Default field map, mirroring a zebra dom-filter config: scalar
# element paths plus one node-set path whose text nodes are gathered
# in document order (mod_dom.c gathers descendant text the same way).
DEFAULT_XPATHS: dict[str, tuple[str, str]] = {
    "text": ("/record/body", "string"),
    "source": ("/record/source", "string"),
    "lang": ("/record/lang", "string"),
    "tags": ("/record/tag/text()", "nodes"),
}


def extract_records(
    xml_df: DataFrame,
    xpaths: dict[str, tuple[str, str]] = DEFAULT_XPATHS,
    xml_col: str = "xml",
    id_col: str = "doc_id",
) -> DataFrame:
    """xpath-driven field extraction: ``{col: (xpath, kind)}`` with
    kind ``'string'`` (first match, scalar) or ``'nodes'`` (all text
    nodes, space-joined in document order). Runs entirely JVM-side.

    The XPath engine decodes entities itself; the explicit
    ``xml_unescape`` is NOT applied on top (that would double-decode).
    """
    cols = [F.col(id_col)]
    for name, (path, kind) in xpaths.items():
        if kind == "string":
            c = F.xpath_string(F.col(xml_col), F.lit(path))
        elif kind == "nodes":
            c = F.array_join(F.xpath(F.col(xml_col), F.lit(path)), " ")
        else:
            raise ValueError(f"unknown xpath kind {kind!r}")
        cols.append(c.alias(name))
    return xml_df.select(*cols)


def mapped_corpus(
    xml_df: DataFrame,
    mapping: dict[str, dict[str, "str | tuple[str, str]"]],
    text_xpath: "str | tuple[str, str]" = "/record/body",
    xml_col: str = "xml",
    id_col: str = "doc_id",
) -> tuple[DataFrame, dict[str, list[str]]]:
    """Declarative dom-filter config → ``(corpus, fields)`` ready for
    ``build_index(..., fields=fields)``.

    ``mapping`` is ``{index_type: {field_name: xpath}}`` — the shape
    of a Zebra dom-filter config section that routes XML elements to
    named indexes with a type (``/root/reference/index/mod_dom.c``
    processes ``<z:index name="title:w">`` attributes the same way;
    ``recgrs.c:1360`` resolves element tables for the GRS family).
    An xpath value may be a plain string (scalar — first match) or
    ``(xpath, 'nodes')`` to gather all matching text nodes in
    document order. ``text_xpath`` locates the BM25 body text.

    A user indexes arbitrary XML by writing this config — no edits to
    the filter module — and searches the mapped fields with composite
    ``field\\x1fterm`` keys like any fielded corpus."""
    if isinstance(text_xpath, str):
        text_xpath = (text_xpath, "string")
    xpaths: dict[str, tuple[str, str]] = {"text": text_xpath}
    fields: dict[str, list[str]] = {}
    for itype, fmap in mapping.items():
        fields[itype] = list(fmap)
        for col, spec in fmap.items():
            if col == "text" or col in xpaths:
                raise ValueError(f"duplicate mapped field {col!r}")
            xpaths[col] = (spec, "string") if isinstance(spec, str) \
                else (spec[0], spec[1])
    return extract_records(xml_df, xpaths, xml_col, id_col), fields


def xml_corpus(docs: DataFrame) -> DataFrame:
    """documents → XML → extracted corpus, ready for
    ``build_index(fields={'w': ['source', 'tags'], 'p': ['lang']})``.
    An exact inverse of :func:`synth_xml` on the default field map."""
    return extract_records(synth_xml(docs))
