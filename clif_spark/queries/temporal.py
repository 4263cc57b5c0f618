"""Temporal-join queries (as-of + interval, operators/temporal.py) — the
episode <-> event alignment surface the RCLIF interval tables invite
(SURVEY §2.3 'Absent' row / §7.3). Oracles use DuckDB's native ASOF JOIN and
a plain range-predicate join respectively, so the engine formulations are
checked against an independent implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clif_spark import io
from clif_spark.operators import temporal
from clif_spark.queries import query, us


@query(
    "j7_asof_join",
    oracle="""
    WITH purch AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id, ts
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id,
           epoch_us(c.ts) AS ts_us,
           epoch_us(p.ts) AS purchase_ts_us,
           p.purchase_value
    FROM clicks c
    ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def j7_asof_join(spark, sf_dir):
    """Backward as-of join: each click is annotated with the user's most
    recent prior (or simultaneous) purchase. Engine plan is the union +
    ordered-window formulation — one shuffle on user_id, no range join —
    checked against DuckDB's native ASOF JOIN. Purchases are pre-aggregated
    per (user, ts) to satisfy the operator's uniqueness contract."""
    ev = io.load_table(spark, sf_dir, "events")
    purch = (ev.filter((F.col("event_type") == "purchase")
                       & F.col("value").isNotNull())
               .groupBy("user_id", "ts")
               .agg(F.max("value").alias("purchase_value")))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("event_id", "user_id", "ts"))
    out = temporal.asof_join(clicks, purch, on="user_id",
                             left_ts="ts", right_ts="ts",
                             value_cols=["purchase_value"],
                             matched_ts_col="purchase_ts")
    return out.select("event_id", us("ts").alias("ts_us"),
                      us("purchase_ts").alias("purchase_ts_us"),
                      "purchase_value")


@query(
    "j8_interval_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id,
             ts AS start_ts, ts + INTERVAL '2 hours' AS end_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.purchase_id, COUNT(*) AS n_clicks
    FROM p JOIN c ON c.user_id = p.user_id
                 AND c.ts >= p.start_ts AND c.ts < p.end_ts
    GROUP BY p.purchase_id
    """,
)
def j8_interval_join(spark, sf_dir):
    """Interval containment join: clicks falling inside each purchase's
    [ts, ts+2h) attribution window, counted per purchase. The range predicate
    rides the user_id equi-join — a keyed shuffle join, never cartesian."""
    ev = io.load_table(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select(F.col("event_id").alias("purchase_id"), "user_id",
                           F.col("ts").alias("start_ts"),
                           (F.col("ts") + F.expr("INTERVAL 2 HOURS"))
                           .alias("end_ts")))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ts"))
    joined = temporal.interval_join(clicks, purchases, on="user_id",
                                    ts_col="ts", start_col="start_ts",
                                    end_col="end_ts")
    return (joined.groupBy("purchase_id")
                  .agg(F.count(F.lit(1)).alias("n_clicks")))


@query(
    "j11_asof_forward_tolerance",
    oracle="""
    -- Forward as-of with a 1-hour tolerance: DuckDB's native ASOF with
    -- `<=` finds the nearest FOLLOWING error per click; the tolerance is
    -- applied as value-nulling (pandas merge_asof semantics), not row
    -- filtering, so the left row count is preserved.
    WITH errs AS (
      SELECT user_id, ts, MAX(value) AS error_value
      FROM events
      WHERE event_type = 'error' AND value IS NOT NULL
      GROUP BY user_id, ts
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id,
           epoch_us(c.ts) AS ts_us,
           CASE WHEN e.ts <= c.ts + INTERVAL '1 hour'
                THEN epoch_us(e.ts) END AS error_ts_us,
           CASE WHEN e.ts <= c.ts + INTERVAL '1 hour'
                THEN e.error_value END AS error_value
    FROM clicks c
    ASOF LEFT JOIN errs e ON c.user_id = e.user_id AND c.ts <= e.ts
    """,
)
def j11_asof_forward_tolerance(spark, sf_dir):
    """Forward as-of join with tolerance (J7's time-reversed sibling —
    pandas merge_asof(direction='forward', tolerance=1h)): each click is
    annotated with the user's NEXT error within an hour, NULL when the
    nearest following error is farther away. Same union + ordered-window
    plan as backward (one shuffle on user_id, no range join), with the
    frame flipped to look ahead; checked against DuckDB's native `<=`
    ASOF plus a CASE-applied tolerance."""
    ev = io.load_table(spark, sf_dir, "events")
    errs = (ev.filter((F.col("event_type") == "error")
                      & F.col("value").isNotNull())
              .groupBy("user_id", "ts")
              .agg(F.max("value").alias("error_value")))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("event_id", "user_id", "ts"))
    out = temporal.asof_join(clicks, errs, on="user_id",
                             left_ts="ts", right_ts="ts",
                             value_cols=["error_value"],
                             matched_ts_col="error_ts",
                             direction="forward",
                             tolerance_seconds=3600)
    return out.select("event_id", us("ts").alias("ts_us"),
                      us("error_ts").alias("error_ts_us"),
                      "error_value")
