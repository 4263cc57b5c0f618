"""Window-operator queries (SURVEY §2.5 W1-W3 + engine surface: rank, moving
aggregates, sessionization, native session/tumbling windows).

These are the per-entity ordered computations at the heart of the RCLIF
pipelines (episode derivation, downup fill, keep-last dedup). Every window
partitions by the entity key and orders by (ts, unique id) — the explicit
tiebreaker R's positional semantics silently relied on (SURVEY §7.4.1/2).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clif_spark import io
from clif_spark.operators import windows as W
from clif_spark.queries import dsum, query, sql_dsum, us


@query(
    "w1_lead_episodes",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS start_us,
           lead(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS stop_us
    FROM events
    """,
)
def w1_lead_episodes(spark, sf_dir):
    """W1 point events -> [start, stop) episodes; stop = next event's time,
    NULL at partition end (`lead(ts)`, `code/RCLIF_dialysis.Rmd:95-97`)."""
    ev = io.load_table(spark, sf_dir, "events")
    eps = W.lead_episodes(ev, ["user_id"], "ts", tiebreak=["event_id"])
    return eps.select("user_id", "event_id",
                      us("start_time").alias("start_us"),
                      us("stop_time").alias("stop_us"))


@query(
    "w2_downup_fill",
    oracle="""
    WITH sparse AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type IN ('click', 'view') THEN NULL
                  ELSE value END AS v
      FROM events
    )
    SELECT user_id, event_id,
           COALESCE(
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           ) AS v_filled
    FROM sparse
    """,
)
def w2_downup_fill(spark, sf_dir):
    """W2 per-entity LOCF+NOCB fill (`fill(.direction="downup")`,
    `code/RCLIF_vitals.Rmd:161-162`): click/view rows are blanked to emulate
    the sparse flowsheet columns, then filled down-then-up. Frame bounds per
    SURVEY §7.4.2."""
    ev = io.load_table(spark, sf_dir, "events")
    sparse = ev.withColumn(
        "v", F.when(F.col("event_type").isin("click", "view"), None)
              .otherwise(F.col("value")))
    filled = W.fill_downup(sparse, ["user_id"], ["ts", "event_id"], ["v"])
    return filled.select("user_id", "event_id", F.col("v").alias("v_filled"))


@query(
    "w3_keep_last_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM events
    QUALIFY row_number() OVER
      (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def w3_keep_last_dedup(spark, sf_dir):
    """W3 keep-last dedup (`!duplicated(..., fromLast=TRUE)`,
    `code/RCLIF_disposition.Rmd:51`): latest event per (user, type) under the
    explicit (ts, event_id) order — the determinism R leaves implicit."""
    ev = io.load_table(spark, sf_dir, "events")
    last = W.dedup_keep_last(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return last.select("user_id", "event_type", "event_id", "value")


@query(
    "w4_rank_lag",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(rank() OVER w AS BIGINT) AS bal_rank,
           ROUND(c_acctbal - lag(c_acctbal) OVER w, 2) AS gap_to_richer
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def w4_rank_lag(spark, sf_dir):
    """Engine-surface ranking + lag (absent from the reference, SURVEY §2.5
    'Absent'): per-nation account-balance rank and gap to the next richer."""
    c = io.load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey", "c_nationkey",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.round(F.col("c_acctbal") - F.lag("c_acctbal").over(w), 2)
         .alias("gap_to_richer"))


@query(
    "w5_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(avg(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
    FROM events
    """,
)
def w5_moving_avg(spark, sf_dir):
    """Engine-surface moving aggregate over a 4-row frame."""
    ev = io.load_table(spark, sf_dir, "events")
    mv = W.moving_agg(ev, ["user_id"], ["ts", "event_id"], "value",
                      preceding=3, agg="avg", out_col="mov_avg")
    return mv.select("user_id", "event_id", F.round("mov_avg", 4).alias("mov_avg"))


_GAP_MIN = 30

@query(
    "w6_sessionize_gap",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_GAP_MIN * 60 * 1_000_000} THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      -- CAST: DuckDB's windowed SUM(int) yields HUGEINT; Spark emits BIGINT.
      SELECT *, CAST(SUM(is_new) OVER
        (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us,
           {sql_dsum('value')} AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def w6_sessionize_gap(spark, sf_dir):
    """Gap-based sessionization — the dialysis episode template
    (`code/RCLIF_dialysis.Rmd:87-100`) generalized: a 30-minute silence
    starts a new session; per-session aggregates follow. Same partitioning
    as W1/W2, so all three share one shuffle when composed."""
    ev = io.load_table(spark, sf_dir, "events")
    s = W.sessionize(ev, ["user_id"], "ts", _GAP_MIN, tiebreak=["event_id"])
    return (s.groupBy("user_id", "session_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min(us("ts")).alias("first_us"),
                  F.max(us("ts")).alias("last_us"),
                  dsum("value").alias("session_value")))


@query(
    "w7_session_window_native",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_GAP_MIN * 60 * 1_000_000} THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, SUM(is_new) OVER
        (PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(epoch_us(ts)) AS session_start_us,
           MAX(epoch_us(ts)) + {_GAP_MIN * 60 * 1_000_000} AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def w7_session_window_native(spark, sf_dir):
    """Spark's native ``session_window`` in batch — identical semantics to
    w6 (window end = last event + gap), and the same operator the streaming
    surface uses incrementally (clif_spark.streaming; SURVEY §2.10)."""
    ev = io.load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id", F.session_window("ts", f"{_GAP_MIN} minutes"))
              .agg(F.count(F.lit(1)).alias("n_events"))
              .select("user_id",
                      us(F.col("session_window.start")).alias("session_start_us"),
                      us(F.col("session_window.end")).alias("session_end_us"),
                      "n_events"))


@query(
    "w8_tumbling_window",
    oracle=f"""
    SELECT epoch_us(ts) - epoch_us(ts) % {6 * 3600 * 1_000_000} AS bucket_us,
           event_type, COUNT(*) AS n, {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def w8_tumbling_window(spark, sf_dir):
    """Tumbling time window (batch form of the streaming windowed agg,
    SURVEY §2.10): 6-hour epoch-aligned buckets per event type."""
    ev = io.load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
              .select(us(F.col("w.start")).alias("bucket_us"), "event_type",
                      "n", "total_value"))


@query(
    "w9_ntile_percent_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER w AS BIGINT) AS bal_quartile,
           ROUND(percent_rank() OVER w, 6) AS bal_pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def w9_ntile_percent_rank(spark, sf_dir):
    """Quantile bucketing + relative rank per partition (engine surface):
    ntile(4) account-balance quartiles and percent_rank within each
    nation — the per-group normalization primitives mix/stratification
    logic is built from. Same entity-keyed window shape (and tiebreaker
    discipline) as W4."""
    c = io.load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey", "c_nationkey",
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"))


@query(
    "w10_funnel_conversion",
    oracle="""
    WITH c AS (
      SELECT user_id, MIN(ts) AS fc
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    b AS (
      SELECT e.user_id, MIN(e.ts) AS fb
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.fc
      GROUP BY e.user_id
    )
    SELECT c.user_id,
           epoch_us(c.fc) AS first_click_us,
           epoch_us(b.fb) AS first_buy_after_us,
           (b.fb IS NOT NULL) AS converted,
           CAST(epoch_us(b.fb) - epoch_us(c.fc) AS BIGINT) AS micros_to_convert
    FROM c LEFT JOIN b ON b.user_id = c.user_id
    """,
)
def w10_funnel_conversion(spark, sf_dir):
    """Two-step funnel (click -> later purchase) per user: first-click time,
    first qualifying purchase, conversion verdict, time-to-convert. The
    ordered-step constraint (purchase AFTER first click) is what separates a
    funnel from a plain join — here one aggregate per step with the step-2
    aggregate range-restricted by step 1. Both aggregates shuffle on
    user_id, so at scale the second reuses the first's partitioning; the
    left join keeps non-converting users in the output (the funnel's whole
    point is the drop-off denominator)."""
    ev = io.load_table(spark, sf_dir, "events")
    c = (ev.filter(F.col("event_type") == "click")
           .groupBy("user_id").agg(F.min("ts").alias("fc")))
    b = (ev.filter(F.col("event_type") == "purchase")
           .join(c, "user_id")
           .filter(F.col("ts") >= F.col("fc"))
           .groupBy("user_id").agg(F.min("ts").alias("fb")))
    return (c.join(b, "user_id", "left")
             .select("user_id",
                     us("fc").alias("first_click_us"),
                     us("fb").alias("first_buy_after_us"),
                     F.col("fb").isNotNull().alias("converted"),
                     (us("fb") - us("fc")).cast("long")
                      .alias("micros_to_convert")))


@query(
    "w11_range_time_frame",
    oracle=f"""
    -- es floors toward -inf on BOTH engines. NB: DuckDB's integer // is
    -- TRUNCATION toward zero (-5 // 2 = -2), so the floor must be spelled
    -- out; plain // would put all of (-1s, 1s) in one double-width bucket
    -- at the epoch origin. Exact for |us| < 2^53 (year ~2255).
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) AS es,
             CAST(FLOOR(COALESCE(value, 0.0) * 1000000.0 + 0.5) AS BIGINT)
               AS vm
      FROM events
    )
    SELECT event_id, user_id, es,
           COUNT(*) OVER w AS n_1h,
           CAST(FLOOR((SUM(vm) OVER w + 50) / 100.0) / 10000.0 AS DOUBLE)
             AS sum_1h
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY es
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def w11_range_time_frame(spark, sf_dir):
    """RANGE-framed window (the value-based frame ROWS cannot express):
    per-user trailing-1-hour event count and value sum, framed on epoch
    seconds so all time-peers enter the frame together. RANGE frames are
    order-deterministic WITHOUT a tiebreaker — peers at the same ordering
    value are always all-in — which is exactly why a sliding time window
    must be RANGE, not ROWS (a ROWS frame over tied timestamps depends on
    arrival order). The sum accumulates integer micros inside the frame and
    digit-rounds after, per the dsum discipline."""
    ev = io.load_table(spark, sf_dir, "events")
    # Floor division toward -inf (the oracle spells out floor() because
    # DuckDB's integer // truncates toward zero): subtracting the
    # non-negative pmod makes the numerator an exact multiple of 1e6, so the
    # double division is exact and pre-1970 (negative-micros) timestamps
    # floor instead of truncating toward zero.
    usc = us("ts")
    es = ((usc - F.pmod(usc, F.lit(1_000_000))) / F.lit(1_000_000)).cast("long")
    vm = F.floor(F.coalesce(F.col("value"), F.lit(0.0))
                 * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    w = (Window.partitionBy("user_id").orderBy("es")
               .rangeBetween(-3600, Window.currentRow))
    return (ev.select("event_id", "user_id", es.alias("es"), vm.alias("vm"))
              .select("event_id", "user_id", "es",
                      F.count(F.lit(1)).over(w).alias("n_1h"),
                      (F.floor((F.sum("vm").over(w) + F.lit(50))
                               / F.lit(100.0))
                       / F.lit(10000.0)).cast("double").alias("sum_1h")))


@query(
    "o3_topk_per_group",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def o3_topk_per_group(spark, sf_dir):
    """Top-k per group — the grouped LIMIT the reference approximates with
    arrange+head per entity: each user's 3 highest-value events via
    ``operators.windows.rank_in_group`` + filter. One hash exchange on the
    entity key and a per-partition sort; with entity-bucketed layout
    (io.write_bucketed_table) the exchange disappears. event_id tiebreak
    keeps equal-value rows deterministic (SURVEY §7.4.1)."""
    ev = io.load_table(spark, sf_dir, "events")
    ranked = W.rank_in_group(
        ev.select("user_id", "event_id", "value"),
        ["user_id"], [F.col("value").desc(), F.col("event_id")],
        method="row_number", out_col="rn")
    return (ranked.filter(F.col("rn") <= 3)
                  .withColumn("rn", F.col("rn").cast("long")))


@query(
    "w12_rate_of_change",
    oracle="""
    SELECT event_id,
           user_id,
           epoch_us(ts) AS ts_us,
           CASE WHEN epoch_us(ts) > epoch_us(lag(ts) OVER w)
                THEN (value - lag(value) OVER w)
                     / ((epoch_us(ts) - epoch_us(lag(ts) OVER w))
                        / 1000000.0)
           END AS rate_per_sec
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w12_rate_of_change(spark, sf_dir):
    """Per-entity rate of change — the discrete derivative behind vitals
    trend alarms (delta value / delta seconds vs the previous
    observation): lag pairs over a (ts, event_id)-tiebroken window, NULL
    at series start and for simultaneous observations (no division by
    zero row). Time deltas computed in integer micros, then one IEEE
    division — bit-identical across engines. One exchange on the entity
    key; entity-bucketed layout makes it exchange-free."""
    ev = io.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = us("ts")
    prev_t = F.lag(t_us).over(w)
    prev_v = F.lag("value").over(w)
    return (ev.filter(F.col("value").isNotNull())
              .select("event_id", "user_id", t_us.alias("ts_us"),
                      F.when(t_us > prev_t,
                             (F.col("value") - prev_v)
                             / ((t_us - prev_t) / F.lit(1000000.0)))
                      .alias("rate_per_sec")))


@query(
    "w13_cumulative_distinct",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
               FROM events),
    f AS (SELECT *,
                 CASE WHEN row_number() OVER
                          (PARTITION BY user_id, event_type
                           ORDER BY ts_us, event_id) = 1
                      THEN 1 ELSE 0 END AS is_first
          FROM e)
    SELECT user_id, event_id, ts_us,
           CAST(sum(is_first) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_distinct_types
    FROM f
    """,
)
def w13_cumulative_distinct(spark, sf_dir):
    """Running distinct-event-type count per user (novelty / engagement
    breadth curve). COUNT(DISTINCT) OVER is unsupported by Spark and
    O(frame) state where engines do support it; the first-occurrence-mark
    + running-sum recomposition (operators/windows.py:cumulative_distinct)
    is O(1) state per row and expressible on any engine — the same trick
    both the oracle and a warehouse user would need. (ts, event_id)
    tiebreak keeps simultaneous events deterministic (SURVEY §7.4.1)."""
    ev = io.load_table(spark, sf_dir, "events")
    out = W.cumulative_distinct(
        ev.select("event_id", "user_id", "event_type", us("ts").alias("ts_us")),
        partition=["user_id"], value_col="event_type",
        order=["ts_us", "event_id"], out_col="cum_distinct_types")
    return out.select("user_id", "event_id", "ts_us", "cum_distinct_types")


@query(
    "w14_interpolate_linear",
    oracle="""
    WITH sparse AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_type IN ('click', 'view') THEN NULL
                  ELSE value END AS v
      FROM events
    ),
    nbr AS (
      SELECT user_id, event_id, ts_us, v,
             last_value(v IGNORE NULLS) OVER wb AS prev_v,
             last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
                 OVER wb AS prev_t,
             first_value(v IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS)
                 OVER wf AS next_t
      FROM sparse
      WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_id, ts_us,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                    CASE WHEN next_t > prev_t
                         THEN prev_v + (next_v - prev_v)
                              * (CAST(ts_us - prev_t AS DOUBLE)
                                 / CAST(next_t - prev_t AS DOUBLE))
                         ELSE prev_v END
           END AS v_interp
    FROM nbr
    """,
)
def w14_interpolate_linear(spark, sf_dir):
    """Per-entity linear interpolation of interior gaps — the continuous
    upgrade of W2's step fills for vitals resampling (click/view rows
    blanked to emulate the sparse flowsheet, like w2_downup_fill). The
    weight is one double division of exact integer-micros deltas then one
    multiply + add (fixed IEEE sequence -> hash-matchable); boundary
    nulls stay null, zero-span ties degrade to LOCF instead of dividing
    by zero (operators/windows.py:interpolate_linear)."""
    ev = io.load_table(spark, sf_dir, "events")
    sparse = ev.select(
        "user_id", "event_id", us("ts").alias("ts_us"),
        F.when(F.col("event_type").isin("click", "view"), None)
         .otherwise(F.col("value")).alias("v"))
    out = W.interpolate_linear(sparse, ["user_id"], "ts_us", "v",
                               tiebreak=["event_id"])
    return out.select("user_id", "event_id", "ts_us", "v_interp")


@query("w15_ewma_smooth", oracle=None)
def w15_ewma_smooth(spark, sf_dir):
    """Per-entity exponential smoothing (alpha=0.3) of the event value
    stream — the recursive trend smoother a SQL window frame cannot
    express (each output depends on the previous OUTPUT), run through
    the sanctioned applyInPandas escape hatch: one exchange on the
    entity key, Arrow-batched pandas ewm per group, O(1) recursion
    state (operators/windows.py:ewma). Rows-only: the recursion has no
    SQL oracle; exactness is pinned by a unit test against the closed
    form instead."""
    ev = (io.load_table(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select("event_id", "user_id", us("ts").alias("ts_us"), "value"))
    out = W.ewma(ev, ["user_id"], "value", ["ts_us", "event_id"])
    return out.select("user_id", "event_id", "ts_us", "value", "ewma")


@query(
    "w16_ewma_agreement",
    oracle="""
    SELECT user_id, COUNT(*) AS n, TRUE AS ewma_consistent
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id
    """,
)
def w16_ewma_agreement(spark, sf_dir):
    """w15's recursion gets a DRIVER-GATED row via the two-formulation
    contract pattern (a12/ann_arrow_fold_equality): the applyInPandas
    smoother and an INDEPENDENT Catalyst formulation — per-user ordered
    array + ``aggregate`` left fold carrying the running outputs
    (s_1 = x_1; s_i = 0.3 x_i + 0.7 s_{i-1}) — must agree within 1e-9
    relative on every row. The fold IS the recursion expressed as a HOF
    (SQL window frames can't reference previous OUTPUTS; a sequential
    fold can), so the two paths share no code: pandas C ewm vs Catalyst
    expression eval. The oracle pins per-user row counts and asserts the
    agreement flag TRUE — a pandas-side semantics drift (alpha handling,
    ordering, NULL policy) flips the hash. Tolerance, not equality:
    pandas computes (1-a)*s + a*x in its own op order; last-ulp drift is
    not a defect. Array-fold cost is per-user-bounded (the engine's
    standard entity-window memory contract)."""
    ev = (io.load_table(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull())
            .select("event_id", "user_id", us("ts").alias("ts_us"), "value"))
    rec = W.ewma(ev, ["user_id"], "value", ["ts_us", "event_id"])
    fold = (ev.groupBy("user_id")
              .agg(F.expr("array_sort(collect_list("
                          "struct(ts_us, event_id, value)))").alias("a"))
              .withColumn("s", F.expr(
                  "aggregate(a, CAST(array() AS ARRAY<DOUBLE>),"
                  " (acc, x) -> CASE WHEN size(acc) = 0"
                  " THEN array(CAST(x.value AS DOUBLE))"
                  " ELSE concat(acc, array(0.3D * x.value"
                  " + 0.7D * element_at(acc, -1))) END)"))
              .select("user_id",
                      F.expr("explode(arrays_zip(a, s))").alias("z"))
              .select("user_id", F.col("z.a.event_id").alias("event_id"),
                      F.col("z.s").alias("ewma_fold")))
    j = rec.join(fold, ["user_id", "event_id"])
    close = (F.abs(F.col("ewma") - F.col("ewma_fold"))
             <= F.lit(1e-9) * F.greatest(F.lit(1.0), F.abs(F.col("ewma"))))
    return (j.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.bool_and(close).alias("ewma_consistent")))
