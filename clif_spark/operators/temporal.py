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
from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: Sequence[str] | None = None,
              matched_ts_col: str | None = None,
              direction: str = "backward",
              tolerance_seconds: float | None = None) -> DataFrame:
    """As-of join: for each left row, attach ``value_cols`` from the
    nearest right row within the same key group — the greatest
    ``right_ts`` <= ``left_ts`` (``direction="backward"``, default) or the
    smallest ``right_ts`` >= ``left_ts`` (``"forward"``); NULLs when no
    such row exists. ``tolerance_seconds`` bounds the match distance
    (pandas merge_asof semantics): a match farther than the tolerance is
    nulled out, not substituted.

    Implementation: tag sides, union, and run last/first(ignorenulls) over
    a (key, ts, order)-ordered window. The side order flips with the
    direction so an exactly-simultaneous right row matches either way
    (DuckDB ASOF `>=`/`<=` semantics): backward sorts right rows BEFORE
    left at equal ts (running frame looks back), forward sorts them AFTER
    (frame looks ahead).

    Caller contract (documented, mirrors SURVEY §7.4.1 determinism rules):
    right rows must be unique per (key, right_ts) — pre-aggregate otherwise —
    and ``value_cols`` must be non-null and must not collide with left column
    names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if tolerance_seconds is not None:
        # The ordering logic is type-agnostic, but the tolerance delta is
        # computed in epoch micros via a timestamp cast — a NUMERIC ts
        # column (e.g. this repo's epoch-micros bigints) would be
        # reinterpreted as epoch SECONDS and silently null every match.
        for df, c in ((left, left_ts), (right, right_ts)):
            if not isinstance(df.schema[c].dataType,
                              (T.TimestampType, T.TimestampNTZType)):
                raise TypeError(
                    f"tolerance_seconds requires timestamp-typed ts "
                    f"columns; {c} is {df.schema[c].dataType}")
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = list(value_cols) if value_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts]
    back = direction == "backward"
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = (right.select(*keys, F.col(right_ts).alias("__ts"), *value_cols)
              .withColumn("__side", F.lit(0 if back else 2)))
    merged = l.unionByName(r, allowMissingColumns=True)
    base = Window.partitionBy(*keys).orderBy("__ts", "__side")
    if back:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)
    out = merged
    for c in value_cols:
        out = out.withColumn(c, pick(c))
    need_matched = matched_ts_col or tolerance_seconds is not None
    mcol = matched_ts_col or "__matched"
    if need_matched:
        out = (out.withColumn("__rts",
                              F.when(F.col("__side") != 1, F.col("__ts")))
                  .withColumn(mcol, pick("__rts"))
                  .drop("__rts"))
    if tolerance_seconds is not None:
        delta = F.abs(F.unix_micros(F.col(mcol).cast("timestamp"))
                      - F.unix_micros(F.col("__ts").cast("timestamp")))
        ok = delta <= int(tolerance_seconds * 1_000_000)
        for c in value_cols:
            out = out.withColumn(c, F.when(ok, F.col(c)))
        out = out.withColumn(mcol, F.when(ok, F.col(mcol)))
    if not matched_ts_col and tolerance_seconds is not None:
        out = out.drop("__matched")
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
