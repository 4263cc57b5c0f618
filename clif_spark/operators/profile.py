"""Data-profiling aggregations (SURVEY §2.4 A1-A6).

The reference's interactive sanity checks (SURVEY §5) as engine operators:
single-pass, map-side-combinable aggregations — each is one job over the
table regardless of width, never a per-column loop of jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_count(df: DataFrame, keys: Sequence[str], desc: bool = True,
                count_col: str = "n") -> DataFrame:
    """A1/A2: histogram / tally (`group_by %>% count %>% arrange(desc(n))`,
    `code/RCLIF_vitals.Rmd:223`; `tally`, `code/RCLIF_dialysis.Rmd:167-168`).
    Partial aggregation means the shuffle carries one row per (partition, key).
    """
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_col))
    order = [F.col(count_col).desc(), *keys] if desc else [*keys]
    return out.orderBy(*order)


def missingness_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A3: NULL count + fraction per column (`colSums(is.na(df))`,
    `code/RCLIF_vitals.Rmd:236-249`). One aggregate over all columns, then a
    driver-side unpivot of the single result row."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__total")]
    aggs += [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    wide = df.agg(*aggs)
    long = wide.unpivot(["__total"], cols, "column_name", "null_count")
    return long.select(
        "column_name", "null_count",
        F.round(F.col("null_count") / F.col("__total"), 6).alias("null_frac"))


def duplicate_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A4: duplicate count per column (`sum(duplicated(.))`,
    `code/RCLIF_disposition.Rmd:103-105`) = count - count_distinct.

    Exact distinct per column in one pass; swap ``F.count_distinct`` for
    ``F.approx_count_distinct`` at the 100 TB tier where a ±2% HLL answer is
    the right trade (profiling, not accounting).
    """
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__total")]
    # R duplicated() counts NAs as duplicating each other too -> count rows,
    # not non-null values: total - (distinct incl. null).
    aggs += [
        (F.count(F.lit(1))
         - F.count_distinct(F.col(c))
         - F.max(F.col(c).isNull().cast("long"))).alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    return (wide.unpivot(["__total"], cols, "column_name", "duplicate_count")
                .select("column_name", "duplicate_count"))


def summary_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A5: per-column descriptive stats (`summary(df)`,
    `code/RCLIF_vitals.Rmd:233`): count/min/max/mean/median.

    Median is exact interpolated `percentile` here (matches R/DuckDB
    quantile_cont); at the 100 TB tier use `percentile_approx` and document
    the error bound — exact percentiles require a global sort per column.
    """
    rows = []
    for c in cols:
        col = F.col(c)
        rows.append(df.agg(
            F.lit(c).alias("column_name"),
            F.count(col).alias("n"),
            F.round(F.min(col).cast("double"), 6).alias("min_value"),
            F.round(F.max(col).cast("double"), 6).alias("max_value"),
            F.round(F.sum(col.cast("decimal(30,6)")).cast("double")
                    / F.count(col), 6).alias("mean_value"),
            F.round(F.expr(f"percentile({c}, 0.5)"), 6).alias("median_value"),
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
