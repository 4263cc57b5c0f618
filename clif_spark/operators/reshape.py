"""Reshape and set operators (SURVEY §2.7 U1-U3, R1-R4).

Pivot/unpivot between long/EAV event tables (the RCLIF core shape, SURVEY
§1.1) and wide per-setting tables, plus unions and dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_by_name(dfs: Sequence[DataFrame], allow_missing: bool = True) -> DataFrame:
    """U1: schema-aligned union (`bind_rows`, `code/RCLIF_vitals.Rmd:59`;
    the 3-modality dialysis union at `code/RCLIF_dialysis.Rmd:156-157` has
    missing columns -> NULL-filled, hence allowMissingColumns)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=allow_missing)
    return out


def distinct_rows(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """U2/U3: full-row distinct, optionally after projection
    (`distinct()`, `code/RCLIF_dialysis.Rmd:40`; `!duplicated`,
    `code/RCLIF_labs.Rmd:75` — keep-first over identical rows is just
    distinct). Map-side partial aggregation makes this a combiner-style
    shuffle, not a full-row exchange."""
    return (df.select(*cols) if cols else df).distinct()


def unpivot(df: DataFrame, ids: Sequence[str], values: Sequence[str],
            name_col: str = "name", value_col: str = "value") -> DataFrame:
    """R1: wide -> long/EAV (`pivot_longer` of sbp/dbp,
    `code/RCLIF_vitals.Rmd:50`). Narrow transform — no shuffle."""
    return df.unpivot(list(ids), list(values), name_col, value_col)


def pivot_wide(df: DataFrame, keys: Sequence[str], name_col: str,
               value_col: str, names: Sequence[str],
               order_col: str | None = None) -> DataFrame:
    """R2: long/EAV -> wide, one column per measurement name
    (`pivot_wider`, `code/RCLIF_vitals.Rmd:108-113`).

    ``names`` is explicit (the reference enumerates its 10 flowsheet names at
    `:97-106`) — passing the value list avoids Spark's extra distinct-names
    pass over the fact table. Duplicate (key, name) cells: R's pivot_wider
    warns and builds list-cols; the engine takes a *deterministic* first by
    ``order_col`` via min_by (SURVEY §7.4.5), or F.first (arbitrary but
    documented) when no order is given.
    """
    agg = (F.min_by(value_col, order_col) if order_col
           else F.first(value_col, ignorenulls=True))
    return df.groupBy(*keys).pivot(name_col, list(names)).agg(agg)


def split_column(df: DataFrame, col: str, sep: str,
                 into: Sequence[str], drop_source: bool = False) -> DataFrame:
    """R3: one string column -> N columns (`separate` of "120/80" blood
    pressure, `code/RCLIF_vitals.Rmd:48`). Missing parts yield NULL, matching
    R separate()'s NA fill (SURVEY §7.4.3)."""
    parts = F.split(F.col(col), sep)
    out = df.withColumns({name: parts.getItem(i) for i, name in enumerate(into)})
    return out.drop(col) if drop_source else out


def explode_tokens(df: DataFrame, col: str, out_col: str = "token",
                   sep: str = r"\s+") -> DataFrame:
    """R4: string -> one row per token (`unnest`,
    `code/RCLIF_medications.Rmd:125`; generalized to text tokenization for
    the LLM-pipeline surface)."""
    return df.withColumn(out_col, F.explode(F.split(F.col(col), sep)))
