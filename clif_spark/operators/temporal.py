"""Temporal join operators: as-of and interval joins (SURVEY §2.3 'Absent' /
§7.3 — the reference has only equi-joins, but its episode/interval tables
(ADT stays, dialysis episodes, med spans) invite exactly these alignments;
the engine supplies them as first-class operators).

Scale design:
- ``asof_join`` is the union + ordered-window formulation: ONE shuffle on the
  join key (same exchange geometry as any per-entity window), instead of a
  range join whose naive plan is a per-key cross product. With entity-bucketed
  layout (io.py) it is exchange-free.
- ``interval_join`` is an equi-join on the entity key with the range predicate
  evaluated inside the join — Spark plans the shuffle on the equi key and
  AQE handles skew; the range condition never degrades to a cartesian plan
  as long as an equi key exists.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: Sequence[str] | None = None,
              matched_ts_col: str | None = None) -> DataFrame:
    """Backward as-of join: for each left row, attach ``value_cols`` from the
    right row with the greatest ``right_ts`` <= ``left_ts`` within the same
    key group (NULLs when no prior right row exists).

    Implementation: tag sides, union, and take ``last(value, ignorenulls)``
    over a (key, ts, side)-ordered running window — right rows sort before
    left rows at equal timestamps, so an exactly-simultaneous right row
    matches (DuckDB ASOF `>=` semantics).

    Caller contract (documented, mirrors SURVEY §7.4.1 determinism rules):
    right rows must be unique per (key, right_ts) — pre-aggregate otherwise —
    and ``value_cols`` must be non-null and must not collide with left column
    names.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = list(value_cols) if value_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts]
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = (right.select(*keys, F.col(right_ts).alias("__ts"), *value_cols)
              .withColumn("__side", F.lit(0)))
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = merged
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if matched_ts_col:
        out = (out.withColumn("__rts",
                              F.when(F.col("__side") == 0, F.col("__ts")))
                  .withColumn(matched_ts_col,
                              F.last("__rts", ignorenulls=True).over(w))
                  .drop("__rts"))
    return out.filter(F.col("__side") == 1).drop("__ts", "__side")


def interval_join(points: DataFrame, intervals: DataFrame,
                  on: str | Sequence[str], ts_col: str,
                  start_col: str, end_col: str) -> DataFrame:
    """Inner-join point events to the [start, end) intervals containing
    them, equi-keyed on ``on`` (episode <-> event alignment: which vitals
    fall in a dialysis episode, which events in a session).

    Key columns must be same-named on both sides (joined with USING so the
    output carries one copy); ``ts_col``/interval bound columns must not
    collide. The range predicate folds into the equi-join condition, so the
    plan stays a keyed shuffle join — never a cartesian.
    """
    keys = [on] if isinstance(on, str) else list(on)
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return points.join(intervals, keys, "inner").filter(cond)
