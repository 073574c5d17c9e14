"""Property-fuzz of scan with limit sets and field registers — the
most intricate driver-side path (multi-ordinal merge + limit-probing
window growth, wand.py scan; reference rpnscan.c:200-480).

The oracle is an independent pure-Python recomputation from the raw
corpus: tokenize exactly like the engine (lowercase, [^0-9a-z]+
splits, 512-char truncation), restrict each register's per-term doc
counts to the limit set, merge display terms across the chosen
registers by summing df, and take the nonzero window around the seed.
"""

from __future__ import annotations

import re
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from idzebra_spark.operators.segment import build_index
from idzebra_spark.operators.wand import SegmentIndex

N_DOCS = 80


def _toks(text: str) -> list[str]:
    return [t[:512] for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


@pytest.fixture(scope="module")
def scan_fixture(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < N_DOCS)
        .select(
            "doc_id", "text",
            F.concat(F.lit("s"), F.col("doc_id") % 7).alias("src"),
            F.element_at(
                F.array(F.lit("aa"), F.lit("bb"), F.lit("s1")),
                (F.col("doc_id") % 3 + 1).cast("int")).alias("lang"),
        )
    )
    rows = docs.collect()
    base = tempfile.mkdtemp(prefix="idz_scanfuzz_")
    path = base + "/idx"
    build_index(spark, docs, path, shard_size=16, block_size=8,
                fields={"w": ["src", "lang"]})
    idx = SegmentIndex(spark, path)
    # register contents, Python-side: display term -> set of doc_ids
    regs = {"body": {}, "src": {}, "lang": {}}
    for r in rows:
        for t in _toks(r["text"]):
            regs["body"].setdefault(t, set()).add(r["doc_id"])
        for fname in ("src", "lang"):
            for t in _toks(r[fname]):
                regs[fname].setdefault(t, set()).add(r["doc_id"])
    yield spark, idx, regs
    shutil.rmtree(base, ignore_errors=True)


def _oracle(regs, field_names, seed, n_after, n_before, limit_ids):
    merged: dict[str, int] = {}
    for fn in field_names:
        for t, ids in regs[fn].items():
            df = len(ids if limit_ids is None else ids & limit_ids)
            if df:
                merged[t] = merged.get(t, 0) + df
    terms = sorted(merged)
    after = [t for t in terms if t >= seed][:n_after]
    before = [t for t in terms if t < seed][-n_before:] if n_before else []
    return sorted((t, merged[t]) for t in before + after)


seeds = st.one_of(
    st.sampled_from(["a", "m", "s3", "s", "zz", "bb", "merge", "0",
                     "sort", "s1", "q", "~"]),
    st.text(alphabet="abcdefms0123456789", min_size=1, max_size=4),
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    seed=seeds,
    n_after=st.integers(1, 8),
    n_before=st.integers(0, 5),
    mod=st.integers(2, 6),
    rem=st.integers(0, 5),
    field=st.sampled_from([None, "src", "lang", ["src"], ["src", "lang"]]),
)
def test_scan_limited_fielded_matches_oracle(scan_fixture, seed, n_after,
                                             n_before, mod, rem, field):
    spark, idx, regs = scan_fixture
    rem = rem % mod
    limit_ids = {i for i in range(N_DOCS) if i % mod == rem}
    lim = spark.createDataFrame([(i,) for i in sorted(limit_ids)],
                                "doc_id long")
    got = sorted(
        (r["term"], r["df"])
        for r in idx.scan(seed, n_after, n_before,
                          limit_set=lim, field=field).collect()
    )
    if field is None:
        names = ["body"]
    elif isinstance(field, str):
        names = [field]
    else:
        names = field
    want = _oracle(regs, names, seed.lower(), n_after, n_before, limit_ids)
    assert got == want, (seed, n_after, n_before, mod, rem, field)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=seeds, n_after=st.integers(1, 8), n_before=st.integers(0, 5),
       field=st.sampled_from([None, "src", ["src", "lang"]]))
def test_scan_unlimited_matches_oracle(scan_fixture, seed, n_after,
                                       n_before, field):
    """No limit set: pure dictionary browse, zero-df terms impossible
    by construction; same merge semantics across registers."""
    spark, idx, regs = scan_fixture
    got = sorted(
        (r["term"], r["df"])
        for r in idx.scan(seed, n_after, n_before, field=field).collect()
    )
    names = (["body"] if field is None
             else [field] if isinstance(field, str) else field)
    want = _oracle(regs, names, seed.lower(), n_after, n_before, None)
    assert got == want, (seed, n_after, n_before, field)
