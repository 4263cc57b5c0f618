"""TPC-H-derived headline queries (bench pace-setters vs the DuckDB baseline).

The reference has no business-aggregation queries (SURVEY §2.4 'Absent'), but
its operator inventory composes directly into the TPC-H shapes; these four
exercise scan+filter+agg (Q1/Q6) and multi-join pipelines (Q3/Q5) — adapted
to the driver's schema (no o_shippriority/l_shipmode columns; date ranges fit
the generated 1995-2001 span).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clif_spark import io
from clif_spark.queries import dmean, dsum, query, sql_dmean, sql_dsum


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_dmean('l_quantity')} AS avg_qty,
           {sql_dmean('l_extendedprice')} AS avg_price,
           {sql_dmean('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1: full-scan aggregate — partial aggregation collapses the
    shuffle to (partitions × 6 groups) rows; everything pre-shuffle is one
    WholeStageCodegen span over the pruned 7-column scan. The decimal
    accumulation dominates CPU, so under-split local inputs are repartitioned
    to spread it (no-op at scale where the scan yields >= cores splits)."""
    li = io.ensure_parallelism(io.load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.col("l_shipdate") <= F.lit("2001-08-06 00:00:00").cast("timestamp_ntz"))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(dsum("l_quantity").alias("sum_qty"),
                   dsum("l_extendedprice").alias("sum_base_price"),
                   dsum(disc_price).alias("sum_disc_price"),
                   dsum(charge).alias("sum_charge"),
                   dmean("l_quantity").alias("avg_qty"),
                   dmean("l_extendedprice").alias("avg_price"),
                   dmean("l_discount").alias("avg_disc"),
                   F.count(F.lit(1)).alias("count_order"))
              .orderBy("l_returnflag", "l_linestatus"))


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 (adapted: o_orderpriority for the missing o_shippriority):
    broadcast the filtered BUILDING customers into orders, shuffle-join
    lineitem once, top-10 via TakeOrderedAndProject."""
    c = io.load_table(spark, sf_dir, "customer")
    o = io.load_table(spark, sf_dir, "orders")
    li = io.load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    cust = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = (o.filter(F.col("o_orderdate") < cutoff)
              .join(F.broadcast(cust), o.o_custkey == cust.c_custkey))
    lines = li.filter(F.col("l_shipdate") > cutoff)
    return (lines.join(ords, lines.l_orderkey == ords.o_orderkey)
                 .groupBy("l_orderkey",
                          F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                          "o_orderpriority")
                 .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .alias("revenue"))
                 .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
                 .orderBy(F.col("revenue").desc(), "l_orderkey")
                 .limit(10))


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    headline=True,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: six-table join; supplier/nation/region are broadcast dims,
    customer⨝orders⨝lineitem carries the data volume. The c_nationkey =
    s_nationkey condition rides the supplier broadcast join."""
    c = io.load_table(spark, sf_dir, "customer")
    o = io.load_table(spark, sf_dir, "orders")
    li = io.load_table(spark, sf_dir, "lineitem")
    s = io.load_table(spark, sf_dir, "supplier")
    n = io.load_table(spark, sf_dir, "nation")
    r = io.load_table(spark, sf_dir, "region")
    ords = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")))
    joined = (li.join(ords, li.l_orderkey == ords.o_orderkey)
                .join(c, ords.o_custkey == c.c_custkey)
                .join(F.broadcast(s),
                      (li.l_suppkey == s.s_suppkey)
                      & (c.c_nationkey == s.s_nationkey))
                .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
                      n.n_regionkey == r.r_regionkey))
    return (joined.groupBy(F.col("n_name").alias("nation"))
                  .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .alias("revenue"))
                  .orderBy(F.col("revenue").desc(), "nation"))


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    headline=True,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure filter+aggregate; all four predicates push to the
    parquet scan, the aggregate is a single partial+final pair."""
    li = io.load_table(spark, sf_dir, "lineitem")
    return (li.filter(
                (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24))
              .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"))
                   .alias("revenue"),
                   F.count(F.lit(1)).alias("n_lines")))
