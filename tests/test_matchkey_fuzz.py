"""Property-fuzz of the match-key update lifecycle: random corpus
transitions (re-key, modify, delete, add, duplicate-key collisions)
must converge to a register identical to a FRESH build of the
expected final state under the sysno rule — internal id = the id a
key had when first inserted (highest external id wins a same-snapshot
collision), exactly extract.c's matchDict resolution."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from idzebra_spark.operators.segment import build_index, update_index
from idzebra_spark.operators.wand import SegmentIndex

N0 = 40  # initial corpus size (keys k0..k39, ids 0..39)


@pytest.fixture(scope="module")
def texts(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").where(F.col("doc_id") < N0).collect()
    )
    return {r["doc_id"]: r["text"] for r in rows}


def _state0(texts):
    """key -> (external_id, text); sysno map key -> internal id."""
    snap = {f"k{i}": (i, texts[i]) for i in range(N0)}
    sysno = {f"k{i}": i for i in range(N0)}
    return snap, sysno


transitions = st.lists(
    st.tuples(
        st.sampled_from(["rekey", "modify", "delete", "add", "collide"]),
        st.integers(0, 9999),
    ),
    min_size=1, max_size=3,
)


def _apply(snap, sysno, op, seed, gen_id):
    """Apply one transition to the python model. Returns (snapshot,
    extra_rows): extra_rows are same-key LOSER rows shipped to the
    engine alongside the snapshot — the engine must drop them (its
    documented dedupe: highest external id wins). ``gen_id`` yields
    fresh, strictly increasing external ids."""
    keys = sorted(snap)
    extras = []
    if op == "rekey":          # every doc gets a new external id
        snap = {k: (next(gen_id), t) for k, (i, t) in snap.items()}
    elif op == "modify" and keys:
        k = keys[seed % len(keys)]
        i, t = snap[k]
        snap = dict(snap)
        snap[k] = (i, t + f" zz{seed}mod")
    elif op == "delete" and keys:
        k = keys[seed % len(keys)]
        snap = {kk: v for kk, v in snap.items() if kk != k}
    elif op == "add":
        k = f"new{seed % 7}"
        if k not in snap:
            snap = dict(snap)
            snap[k] = (next(gen_id), f"fresh doc zz{seed}add content")
    elif op == "collide" and keys:
        # the SAME key twice in one snapshot: the old row ships as a
        # duplicate loser; the higher-id row must win
        k = keys[seed % len(keys)]
        i, t = snap[k]
        extras.append((i, t, k))
        snap = dict(snap)
        snap[k] = (next(gen_id), f"collision zz{seed}win")
    return snap, extras


def _expected_corpus(snap, sysno):
    """(internal_id, text) rows after resolving keys through sysno;
    updates sysno in place for newly seen keys."""
    out = []
    for k in sorted(snap):
        ext, t = snap[k]
        if k not in sysno:
            sysno[k] = ext
        out.append((sysno[k], t))
    # keys absent from snap are deletions: drop their sysno so a later
    # re-add enters under its NEW external id (fresh record)
    for k in list(sysno):
        if k not in snap:
            del sysno[k]
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(steps=transitions)
def test_matchkey_lifecycle_converges(spark, texts, steps):
    snap, sysno = _state0(texts)
    ids = iter(range(1_000_000, 9_000_000))
    base = tempfile.mkdtemp(prefix="idz_mkfz_")
    p, pf = base + "/idx", base + "/fresh"
    try:
        docs0 = spark.createDataFrame(
            [(i, t, k) for k, (i, t) in snap.items()],
            "doc_id long, text string, mkey string")
        build_index(spark, docs0, p, shard_size=16, block_size=8,
                    match_cols=["mkey"])
        for op, seed in steps:
            snap, extras = _apply(snap, sysno, op, seed, ids)
            rows = [(i, t, k) for k, (i, t) in snap.items()] + extras
            df = spark.createDataFrame(
                rows, "doc_id long, text string, mkey string")
            update_index(spark, df, p)
            _expected_corpus(snap, sysno)  # keep the sysno model in step

        exp_rows = [(sysno[k], t) for k, (_, t) in snap.items()]
        exp = spark.createDataFrame(exp_rows, "doc_id long, text string")
        build_index(spark, exp, pf, shard_size=16, block_size=8)

        got, want = SegmentIndex(spark, p), SegmentIndex(spark, pf)
        assert got.stats() == want.stats()
        for q in (["merge", "sort"], ["zz901mod"], ["fresh", "content"]):
            g = [tuple(r) for r in got.topk(q, 10).collect()]
            w = [tuple(r) for r in want.topk(q, 10).collect()]
            assert g == w, (q, steps)
    finally:
        shutil.rmtree(base, ignore_errors=True)
