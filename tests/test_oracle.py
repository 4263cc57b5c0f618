"""Differential oracle harness — a local replica of the driver's correctness
gate: run every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compare row count, column names, and
order-insensitive values.

Runs at sf0.001 for speed (the driver gate runs sf0.01; set
CLIF_TEST_SF_DIR to point elsewhere).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("CLIF_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Keep the float marker: int 402 vs float 402.0 must NOT collide,
        # or the local gate misses oracle type artifacts (DuckDB HUGEINT →
        # float64 through arrow) that the driver's stricter hash catches.
        return f"f:{v:.10g}"
    return str(v)


def _rowset(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = list(sdf.columns)
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check, mirroring the driver
        return
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={scols} duck={dcols}")
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}")
    sset, dset = _rowset(srows, scols), _rowset(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"


def test_q3_preagg_shape_matches_oracle(spark, duck, monkeypatch):
    """The driver only ever gates q3's small-orders (broadcast star) shape;
    the fact-sized shape — revenue pre-aggregated by l_orderkey below a
    shuffle join — must face the same oracle here. Forcing the gate's
    statistic makes the pre-agg shape run at test SF."""
    real_getsize = os.path.getsize
    monkeypatch.setattr(
        "clif_spark.queries.tpch.os.path.getsize",
        lambda p: (99 << 30) if p.endswith("orders.parquet")
        else real_getsize(p))
    name = "q3_shipping_priority"
    sdf = QUERIES[name](spark, SF_DIR)
    plan = sdf._jdf.queryExecution().optimizedPlan().toString()
    assert "rev_micros" in plan  # precondition: gate really switched shapes
    srows, scols = sdf.collect(), list(sdf.columns)
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _rowset(srows, scols) == _rowset(drows, dcols)
