"""Unit tests for the temporal join operators: as-of boundary semantics
(no prior match -> NULL, simultaneous right row matches, latest-wins) and
interval containment edges (inclusive start, exclusive end)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from clif_spark.operators import temporal


def ts(h, m=0):
    return datetime(2020, 4, 1, h, m)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [("u1", ts(0, 30), "before_any"),
         ("u1", ts(1), "exact_tie"),
         ("u1", ts(2), "after_both"),
         ("u2", ts(5), "other_key")],
        ["user", "ts", "label"])
    right = spark.createDataFrame(
        [("u1", ts(1), 100.0),
         ("u1", ts(1, 30), 200.0),
         ("u3", ts(0), 999.0)],
        ["user", "ts", "px"])
    out = {r["label"]: r.asDict()
           for r in temporal.asof_join(left, right, on="user",
                                       value_cols=["px"],
                                       matched_ts_col="mts").collect()}
    assert out["before_any"]["px"] is None
    assert out["before_any"]["mts"] is None
    # a right row at exactly the left ts matches (>= semantics)
    assert out["exact_tie"]["px"] == 100.0 and out["exact_tie"]["mts"] == ts(1)
    # the greatest right ts <= left ts wins, not just any prior
    assert out["after_both"]["px"] == 200.0
    assert out["after_both"]["mts"] == ts(1, 30)
    # keys with no right rows at all stay NULL
    assert out["other_key"]["px"] is None


def test_interval_join_half_open(spark):
    points = spark.createDataFrame(
        [("u1", ts(1)), ("u1", ts(2)), ("u1", ts(3)), ("u2", ts(1, 30))],
        ["user", "ts"])
    intervals = spark.createDataFrame(
        [("u1", "i1", ts(1), ts(3))],  # [1:00, 3:00)
        ["user", "iid", "start_ts", "end_ts"])
    got = sorted(
        r["ts"] for r in temporal.interval_join(
            points, intervals, on="user", ts_col="ts",
            start_col="start_ts", end_col="end_ts").collect())
    # inclusive start, exclusive end; other keys never match
    assert got == [ts(1), ts(2)]


def test_asof_plan_is_single_exchange(spark):
    """The as-of join must plan as one shuffle on the key (union + window),
    not a range join: no Cartesian/BroadcastNestedLoop anywhere."""
    left = spark.createDataFrame([("u1", ts(1))], ["user", "ts"])
    right = spark.createDataFrame([("u1", ts(0), 1.0)], ["user", "ts", "px"])
    plan = (temporal.asof_join(left, right, on="user", value_cols=["px"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_epoch_second_floor_matches_duckdb_for_pre_1970(spark):
    """w11's epoch-second expression must FLOOR toward -inf like the
    oracle's `//`, not truncate toward zero — divergence only shows on
    pre-1970 (negative-micros) timestamps, which the driver corpus never
    contains, so it is pinned here cross-engine."""
    import datetime as dt

    import duckdb

    from pyspark.sql import functions as F
    from clif_spark.queries import us

    stamps = [dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
              dt.datetime(1969, 12, 31, 23, 59, 58, 1),
              dt.datetime(1970, 1, 1, 0, 0, 0, 0),
              dt.datetime(1970, 1, 1, 0, 0, 1, 999999),
              dt.datetime(1901, 6, 15, 12, 0, 0, 250000)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(stamps)],
                               ["i", "ts"])
    usc = us("ts")
    es = ((usc - F.pmod(usc, F.lit(1_000_000))) / F.lit(1_000_000)) \
        .cast("long")
    got = {r.i: r.es for r in df.select("i", es.alias("es")).collect()}

    con = duckdb.connect()
    want = {}
    for i, s in enumerate(stamps):
        # the oracle's expression — explicit floor, because DuckDB's
        # integer // TRUNCATES toward zero (-5 // 2 = -2)
        want[i] = con.execute(
            "SELECT CAST(floor(epoch_us(?::TIMESTAMP) / 1000000.0)"
            " AS BIGINT)", [s]).fetchone()[0]
    con.close()
    assert got == want
    # spot-check the sign-sensitive case: -0.5 s floors to -1, not 0
    assert got[0] == -1


def test_asof_forward_and_tolerance(spark):
    """Forward direction picks the nearest FOLLOWING right row (equal ts
    matches); tolerance nulls matches beyond the bound without dropping
    left rows; backward on the same data stays the prior row."""
    from clif_spark.operators import temporal

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 900)],
        ["id", "k", "sec"]).selectExpr(
        "id", "k", "timestamp_seconds(sec) AS ts")
    right = spark.createDataFrame(
        [("u", 100, 1.0), ("u", 210, 2.0), ("u", 2000, 3.0)],
        ["k", "sec", "v"]).selectExpr(
        "k", "timestamp_seconds(sec) AS ts", "v")
    fwd = {r.id: r.v for r in temporal.asof_join(
        left, right, on="k", value_cols=["v"],
        direction="forward").collect()}
    assert fwd == {1: 1.0, 2: 2.0, 3: 3.0}  # equal-ts matches; else next
    tol = {r.id: r.v for r in temporal.asof_join(
        left, right, on="k", value_cols=["v"], direction="forward",
        tolerance_seconds=60).collect()}
    assert tol == {1: 1.0, 2: 2.0, 3: None}  # 2000-900 > 60s -> nulled
    back = {r.id: r.v for r in temporal.asof_join(
        left, right, on="k", value_cols=["v"]).collect()}
    assert back == {1: 1.0, 2: 1.0, 3: 2.0}


def test_merge_with_deletes_cdc_replay_rules(spark):
    """The three MERGE outcomes in one batch, resolved strictly by version
    order: plain upsert survives, a winning tombstone deletes, and a
    tombstone followed by a NEWER reinsert resurrects the key (the CDC
    replay rule). NULL tombstones mean upsert; the tombstone column never
    leaks into the output."""
    from clif_spark.operators import core

    base = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c"), (4, 1, "d")],
        ["k", "version", "val"])
    updates = spark.createDataFrame(
        [(2, 2, "b2", False),   # plain upsert
         (3, 2, "c", True),     # delete wins (newest for key 3)
         (4, 2, "d", True),     # tombstone...
         (4, 3, "d3", None),    # ...overridden by newer reinsert (NULL
                                #    tombstone = upsert)
         (5, 1, "e", False)],   # pure insert
        "k long, version long, val string, is_delete boolean")
    out = core.merge_with_deletes(base, updates, ["k"], ["version"])
    assert "is_delete" not in out.columns
    got = {r.k: (r.version, r.val) for r in out.collect()}
    assert got == {1: (1, "a"), 2: (2, "b2"), 4: (3, "d3"), 5: (1, "e")}

    import pytest
    with pytest.raises(ValueError, match="is_delete"):
        core.merge_with_deletes(base, base, ["k"], ["version"])
