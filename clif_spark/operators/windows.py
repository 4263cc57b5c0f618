"""Window operators (SURVEY §2.5 W1-W3 + engine-surface extensions).

All per-entity, time-ordered computations. At 100 TB these are the operators
whose shuffle matters most: every one partitions by the entity key
(encounter_id / user_id), so a layout bucketed on that key (io.py) makes them
exchange-free. Every ``orderBy`` carries an explicit tiebreaker column —
R row order is positional and Spark has none (SURVEY §7.4.1/7.4.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _w(partition: Sequence[str], order: Sequence[str | Column]):
    return Window.partitionBy(*partition).orderBy(*order)


def lead_episodes(df: DataFrame, partition: Sequence[str], ts_col: str,
                  tiebreak: Sequence[str] = (),
                  start_col: str = "start_time",
                  stop_col: str = "stop_time") -> DataFrame:
    """W1: point events -> [start, stop) episodes; stop = next event's time,
    NULL at partition end (`lead(ts)` at `code/RCLIF_dialysis.Rmd:95-97,141-143`).
    """
    w = _w(partition, [ts_col, *tiebreak])
    return (df.withColumn(start_col, F.col(ts_col))
              .withColumn(stop_col, F.lead(ts_col).over(w)))


def fill_downup(df: DataFrame, partition: Sequence[str],
                order: Sequence[str | Column], cols: Sequence[str]) -> DataFrame:
    """W2: per-entity LOCF then NOCB fill (`fill(.direction="downup")`,
    `code/RCLIF_vitals.Rmd:161-162`).

    Exactly two stacked window functions per column with the frame bounds the
    semantics require: last-non-null over (unboundedPreceding, 0), then
    first-non-null over (0, unboundedFollowing), coalesced in that order so
    the downward pass wins where both apply (SURVEY §7.4.2). Callers must
    include a tiebreaker in ``order`` for deterministic fills on equal
    timestamps.
    """
    w = _w(partition, order)
    down = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    up = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = df
    for c in cols:
        locf = F.last(c, ignorenulls=True).over(down)
        nocb = F.first(c, ignorenulls=True).over(up)
        out = out.withColumn(c, F.coalesce(locf, nocb))
    return out


def dedup_keep_last(df: DataFrame, keys: Sequence[str],
                    order: Sequence[str | Column]) -> DataFrame:
    """W3: one row per key, keeping the row that sorts *last* by ``order``
    (`!duplicated(..., fromLast=TRUE)`, `code/RCLIF_disposition.Rmd:51`).

    R's "last" is positional; the engine requires an explicit, deterministic
    order (e.g. event time + unique id) and keeps the max (SURVEY §7.4.1).
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() if isinstance(c, str) else c.desc() for c in order])
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def rank_in_group(df: DataFrame, partition: Sequence[str],
                  order: Sequence[str | Column], method: str = "rank",
                  out_col: str = "rank") -> DataFrame:
    """Engine-surface ranking (absent from the reference, SURVEY §2.5
    'Absent'): rank / dense_rank / row_number within a partition."""
    fns = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}
    return df.withColumn(out_col, fns[method]().over(_w(partition, order)))


def moving_agg(df: DataFrame, partition: Sequence[str],
               order: Sequence[str | Column], value_col: str,
               preceding: int, agg: str = "avg",
               out_col: str = "moving") -> DataFrame:
    """Engine-surface moving aggregate over a ROWS frame
    (`rows between N preceding and current row`)."""
    w = _w(partition, order).rowsBetween(-preceding, Window.currentRow)
    fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
           "count": F.count}
    return df.withColumn(out_col, fns[agg](value_col).over(w))


def sessionize(df: DataFrame, partition: Sequence[str], ts_col: str,
               gap_minutes: float, tiebreak: Sequence[str] = (),
               session_col: str = "session_id") -> DataFrame:
    """Gap-based sessionization — the batch generalization of the dialysis
    episode derivation (W1 template, `code/RCLIF_dialysis.Rmd:87-100`) and
    the exact batch analog of Structured Streaming's ``session_window``
    (clif_spark.streaming).

    A new session starts when the gap to the previous event exceeds
    ``gap_minutes``; session_id is the running count of session starts within
    the partition (two cumulative window passes, no UDF).
    """
    w = _w(partition, [ts_col, *tiebreak])
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev_ts.cast("timestamp")))
           > int(gap_minutes * 60 * 1_000_000)),
        F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("__new", is_new)
              .withColumn(session_col,
                          F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
              .drop("__new"))


def interpolate_linear(df: DataFrame, partition: Sequence[str],
                       ts_us_col: str, value_col: str,
                       tiebreak: Sequence[str] = (),
                       out_col: str = "v_interp") -> DataFrame:
    """Per-entity linear interpolation of interior nulls — the resampling
    step between W2's step-function fills (LOCF/NOCB) and a true
    continuous signal (pandas ``interpolate(limit_area='inside')``):
    v = v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev).

    Determinism contract: ``ts_us_col`` must be integer micros. The
    weight is one double division of two exact integer deltas, then one
    multiply and one add — a fixed IEEE sequence, bit-identical on any
    engine. Boundary nulls (no non-null neighbor on one side) stay null;
    a zero time span (simultaneous observations) degrades to LOCF rather
    than dividing by zero.

    Two frame scans over one entity window (backward for the last
    non-null value/time, forward for the first) — same exchange geometry
    as fill_downup: one shuffle on the entity key, none when the layout
    is entity-bucketed.
    """
    wb = _w(partition, [ts_us_col, *tiebreak]).rowsBetween(
        Window.unboundedPreceding, 0)
    wf = _w(partition, [ts_us_col, *tiebreak]).rowsBetween(
        0, Window.unboundedFollowing)
    v = F.col(value_col)
    t = F.col(ts_us_col)
    t_of_v = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_t = F.last(t_of_v, ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_t = F.first(t_of_v, ignorenulls=True).over(wf)
    ratio = ((t - prev_t).cast("double")
             / (next_t - prev_t).cast("double"))
    interp = (F.when(v.isNotNull(), v)
               .when(prev_v.isNotNull() & next_v.isNotNull(),
                     F.when(next_t > prev_t,
                            prev_v + (next_v - prev_v) * ratio)
                      .otherwise(prev_v)))
    return df.withColumn(out_col, interp)


def ewma(df: DataFrame, partition: Sequence[str], value_col: str,
         order: Sequence[str], alpha: float = 0.3,
         out_col: str = "ewma") -> DataFrame:
    """Per-entity exponentially weighted moving average — the recursive
    smoother behind trend displays (s_t = a*v_t + (1-a)*s_{t-1}).

    The recursion cannot be a SQL window frame (each output depends on
    the PREVIOUS OUTPUT, not on a frame of inputs), so this is the
    sanctioned ``applyInPandas`` escape hatch for custom per-entity
    stateful operators (SURVEY §2.9: Arrow-batched, never row-Python):
    one exchange on the entity key, each group streams through pandas
    ``ewm(adjust=False)`` with O(1) recursion state. Entity-bounded
    groups are the memory contract — the same one every per-entity window
    in the engine already carries.

    NULLs propagate pandas-style: they take the running state without
    updating it (``ewm(ignore_na=False)`` semantics on a masked series).
    """
    schema = T.StructType(df.schema.fields
                          + [T.StructField(out_col, T.DoubleType())])
    cols = list(df.columns)
    order_cols = list(order)

    def smooth(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf[cols + [out_col]]

    return df.groupBy(*partition).applyInPandas(smooth, schema)


def cumulative_distinct(df: DataFrame, partition: Sequence[str],
                        value_col: str, order: Sequence[str],
                        out_col: str = "cum_distinct") -> DataFrame:
    """Running count of distinct ``value_col`` values seen so far per
    partition — the novelty curve behind engagement breadth / coverage
    monitors. ``COUNT(DISTINCT x) OVER`` is unsupported by Spark (and
    needs O(n) state per frame where engines do support it); the
    equivalent streaming-friendly form marks each value's FIRST occurrence
    (row_number over (partition + value) == 1) and takes a running sum of
    the marks over the entity window.

    Two window passes on different keys = two exchanges in general; with
    the entity-bucketed layout (io.write_bucketed) the second pass reuses
    the entity clustering and only the (entity, value) pass shuffles.
    State per row is O(1) — nothing accumulates a distinct set.
    """
    w_first = _w([*partition, value_col], list(order))
    w_run = _w(partition, list(order)).rowsBetween(
        Window.unboundedPreceding, 0)
    is_first = (F.row_number().over(w_first) == 1).cast("long")
    return (df.withColumn("__first", is_first)
              .withColumn(out_col, F.sum("__first").over(w_run))
              .drop("__first"))
