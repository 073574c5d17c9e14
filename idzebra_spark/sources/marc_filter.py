"""MARC (ISO2709) record filter — Spark analog of Zebra's grs.marc.

Reference: ``/root/reference/index/mod_grs_marc.c`` (grs_read_iso2709):
leader bytes 0-4 record length, 10 indicator length, 11 identifier
(subfield-code) length, 12-16 base address, 20/21 directory entry
length-of-data / length-of-start widths; the directory runs from byte
24 to the first field separator, each entry ``tag + len + start``;
field data lives at ``base_address + start``, fields end with 0x1E,
subfields begin with 0x1F + code, the record ends with 0x1D. Control
fields (tag 00x) carry bare data, variable fields carry indicators
then subfields — exactly the branch structure of mod_grs_marc.c:178-263.

Spark-first shape: records are an opaque ``binary`` column; the parse
step is one Arrow-batched ``mapInPandas`` kernel emitting the exploded
``(doc_id, tag, ind, sub, value, occ)`` stream (binary record formats
are per-record byte arithmetic in Zebra too — there is no declarative
shortcut, so the kernel IS the idiomatic form; everything around it —
synthesis, pivot back to columns, fielded indexing — stays in
whole-stage-codegen land).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FS = 0x1E  # field separator
RS = 0x1D  # record separator
SF = 0x1F  # subfield identifier


def encode_marc(fields: list[tuple[str, str | list[tuple[str, str]]]],
                status: str = "n") -> bytes:
    """Build one ISO2709 record. ``fields`` is an ordered list of
    ``(tag, data)``: control fields (tag < '010') take a plain string,
    variable fields a list of (subfield_code, value) pairs (written
    with blank indicators). Standard MARC widths (2 indicators,
    2-byte subfield marker, 4/5 directory widths) are declared in the
    leader exactly where grs_read_iso2709 reads them back."""
    body = bytearray()
    directory = bytearray()
    for tag, data in fields:
        start = len(body)
        if tag < "010":
            field = data.encode("utf-8") if isinstance(data, str) else bytes(data)
        else:
            if isinstance(data, (str, bytes)):
                raise ValueError(
                    f"variable field {tag} needs (code, value) pairs")
            field = bytearray(b"  ")  # two blank indicators
            for code, value in data:
                field += bytes([SF]) + code.encode("utf-8") \
                    + value.encode("utf-8")
            field = bytes(field)
        body += field + bytes([FS])
        if len(field) + 1 > 9999 or start > 99999:
            raise ValueError("field exceeds ISO2709 4/5-digit directory "
                             "widths (record too large)")
        directory += f"{tag:>03s}{len(field) + 1:04d}{start:05d}".encode()
    directory += bytes([FS])
    base = 24 + len(directory)
    total = base + len(body) + 1
    if total > 99999:
        raise ValueError("record exceeds ISO2709 5-digit record length")
    leader = (f"{total:05d}{status}am a22{base:05d} a 4500").encode()
    if len(leader) != 24:
        raise ValueError("internal: bad leader length")
    return bytes(leader) + bytes(directory) + bytes(body) + bytes([RS])


def parse_marc_record(buf: bytes) -> list[tuple[str, str, str, str, int]]:
    """One record → [(tag, ind, sub, value, occ)]; honors the leader's
    declared widths (mod_grs_marc.c:142-150) rather than assuming the
    MARC21 defaults. Control-field rows carry ind='' sub=''."""
    if len(buf) < 25 or not buf[:5].isdigit():
        raise ValueError("bad MARC leader")
    record_length = int(buf[:5])
    if record_length > len(buf) or buf[record_length - 1] != RS:
        raise ValueError("bad MARC record length / terminator")
    ind_len = int(chr(buf[10])) if chr(buf[10]).isdigit() else 2
    id_len = int(chr(buf[11])) if chr(buf[11]).isdigit() else 2
    # an identifier length of 0 would make chunk[:id_len-1] slice as
    # chunk[:-1] below — garbage subfield codes, not a graceful
    # default; reject the record instead (the reference only falls
    # back to 2 for NON-digits, mod_grs_marc.c:142-150)
    if id_len < 1:
        raise ValueError("bad MARC leader: identifier length 0")
    base = int(buf[12:17])
    len_data = int(chr(buf[20])) if chr(buf[20]).isdigit() else 4
    len_start = int(chr(buf[21])) if chr(buf[21]).isdigit() else 5
    entry_size = 3 + len_data + len_start
    out: list[tuple[str, str, str, str, int]] = []
    occ: dict[str, int] = {}
    p = 24
    while p < len(buf) and buf[p] != FS:
        entry = buf[p:p + entry_size]
        if len(entry) < entry_size or not entry[3:].isdigit() \
                or not entry[:3].isalnum():
            raise ValueError("bad MARC directory")
        tag = entry[:3].decode()
        dlen = int(entry[3:3 + len_data])
        dstart = int(entry[3 + len_data:])
        i, end = base + dstart, base + dstart + dlen - 1  # strip FS
        if end > record_length:
            raise ValueError("MARC field beyond record")
        occ[tag] = occ.get(tag, 0) + 1
        field = buf[i:end]
        if field and field[-1] == FS:
            field = field[:-1]
        if tag < "010":
            out.append((tag, "", "", field.decode("utf-8"), occ[tag]))
        else:
            ind = field[:ind_len].decode("utf-8")
            rest = field[ind_len:]
            for chunk in rest.split(bytes([SF])):
                if not chunk:
                    continue
                code = chunk[:id_len - 1].decode("utf-8")
                out.append((tag, ind, code,
                            chunk[id_len - 1:].decode("utf-8"), occ[tag]))
        p += entry_size
    return out


MARC_FIELD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("tag", T.StringType()),
    T.StructField("ind", T.StringType()),
    T.StructField("sub", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("occ", T.IntegerType()),
])


def parse_marc(df: DataFrame, marc_col: str = "marc",
               id_col: str = "doc_id") -> DataFrame:
    """Binary MARC column → exploded field stream, Arrow-batched."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(marc_col))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, buf in zip(pdf["doc_id"], pdf[marc_col]):
                for tag, ind, sub, val, occ in parse_marc_record(bytes(buf)):
                    rows.append((int(did), tag, ind, sub, val, occ))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MARC_FIELD_SCHEMA.fields])

    return src.mapInPandas(kernel, MARC_FIELD_SCHEMA)


def synth_marc(docs: DataFrame) -> DataFrame:
    """(doc_id, marc) — deterministic ISO2709 records over the
    `documents` table: 001 control number, 008-style control data,
    041$a language, 245$a title (source), 520$a body text. Encoding
    runs distributed (Arrow-batched), no driver loop."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("marc", T.BinaryType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = encode_marc([
                    ("001", str(r.doc_id)),
                    ("008", f"len{int(r.n_chars):05d}"),
                    ("041", [("a", r.lang)]),
                    ("245", [("a", r.source)]),
                    ("520", [("a", r.text)]),
                ])
                rows.append((int(r.doc_id), rec))
            yield pd.DataFrame(rows, columns=["doc_id", "marc"])

    return docs.select("doc_id", "text", "lang", "source",
                       "n_chars").mapInPandas(kernel, schema)


def marc_corpus(marc_df: DataFrame) -> DataFrame:
    """Parsed MARC stream → corpus columns (doc_id, text, source,
    lang) via a tag/sub pivot — the inverse of :func:`synth_marc`,
    ready for ``build_index(fields=...)``."""
    f = parse_marc(marc_df)
    key = F.concat_ws("$", "tag", "sub")
    return (
        f.groupBy("doc_id")
        .agg(
            F.max(F.when(key == "520$a", F.col("value"))).alias("text"),
            F.max(F.when(key == "245$a", F.col("value"))).alias("source"),
            F.max(F.when(key == "041$a", F.col("value"))).alias("lang"),
        )
    )
