"""Distributed-statistics queries (engine extensions of SURVEY §2.4 A5 —
the reference's analyses stop at `summary(df)`, `code/RCLIF_vitals.Rmd:233`;
these add the grouped second-moment and exact-percentile statistics a
training-data curation pipeline reports at scale).

Both are built for cross-engine bit-identity: integer accumulation first,
one BIGINT→DOUBLE conversion, then the same IEEE expression tree in Spark
and DuckDB (see operators/profile.py docstrings for the bounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clif_spark import io
from clif_spark.operators import profile
from clif_spark.queries import query


@query(
    "a10_moment_corr",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(FLOOR(l_quantity * 1.0 + 0.5) AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 0.1 + 0.5) AS BIGINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(FLOOR(l_quantity * 1.0 + 0.5) AS BIGINT)
                    * CAST(FLOOR(l_quantity * 1.0 + 0.5) AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 0.1 + 0.5) AS BIGINT)
                    * CAST(FLOOR(l_extendedprice * 0.1 + 0.5) AS BIGINT)) AS DOUBLE) AS syy,
             CAST(SUM(CAST(FLOOR(l_quantity * 1.0 + 0.5) AS BIGINT)
                    * CAST(FLOOR(l_extendedprice * 0.1 + 0.5) AS BIGINT)) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag)
    SELECT flag,
           CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr,
           (n * sxy - sx * sy) / (n * (n - 1.0)) / 0.1 AS covar_samp,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) * 10.0 AS beta,
           SQRT((n * sxx - sx * sx) / (n * (n - 1.0))) / 1.0 AS sd_x,
           SQRT((n * syy - sy * sy) / (n * (n - 1.0))) / 0.1 AS sd_y
    FROM m
    ORDER BY flag
    """,
)
def a10_moment_corr(spark, sf_dir):
    """Grouped Pearson correlation / sample covariance / OLS slope of
    (quantity, extendedprice) per returnflag — exact integer moments, one
    hash-aggregate pass, bit-identical double finish (operator docstring
    for the quantization contract and 2^53 bounds). Price is quantized to
    tens of dollars (y_scale=0.1) so per-group Σy² stays exact at SF ≥ 1."""
    li = io.load_table(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_returnflag").alias("flag"),
        "l_quantity", "l_extendedprice")
    out = profile.moment_corr(
        src, ["flag"], "l_quantity", "l_extendedprice",
        x_scale=1.0, y_scale=0.1)
    return out.orderBy("flag")


@query(
    "a11_exact_percentiles",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT flag,
           MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN v END) AS p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.90 * n) AS BIGINT) THEN v END) AS p90,
           MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN v END) AS p99
    FROM ranked
    GROUP BY flag
    ORDER BY flag
    """,
)
def a11_exact_percentiles(spark, sf_dir):
    """Exact nearest-rank p50/p90/p99 of extendedprice per returnflag —
    value at ceil(p·n) of the sorted group: an actual data value, no
    interpolation, so no float arithmetic can diverge between engines.
    One shuffle + per-group sort (operator docstring for the 100 TB
    two-pass alternative)."""
    li = io.load_table(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        "l_orderkey", "l_linenumber")
    out = profile.exact_percentiles(
        src, ["flag"], "v", (0.50, 0.90, 0.99),
        tiebreakers=("l_orderkey", "l_linenumber"))
    return out.orderBy("flag")
