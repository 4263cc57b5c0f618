"""TPC-H-derived headline queries (bench pace-setters vs the DuckDB baseline).

The reference has no business-aggregation queries (SURVEY §2.4 'Absent'), but
its operator inventory composes directly into the TPC-H shapes; these four
exercise scan+filter+agg (Q1/Q6) and multi-join pipelines (Q3/Q5) — adapted
to the driver's schema (no o_shippriority/l_shipmode columns; date ranges fit
the generated 1995-2001 span).

Each is issued as ONE ``spark.sql`` call over direct parquet paths (see
``queries.pq``): the Catalyst plan is the same as the equivalent DataFrame
chain — broadcast hints included — without per-expression py4j round trips.
Aggregates go through the fixed-point ``sql_dsum``/``sql_dmean`` forms, which
are valid (and bit-identical) in both Spark SQL and DuckDB.
"""

from __future__ import annotations

from clif_spark.queries import pq, query, sql_dmean, sql_dsum


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
    WholeStageCodegen span over the pruned 7-column scan. Measure sums are
    fixed-point long-micros (see queries.dsum): native 64-bit accumulation,
    4× faster than DECIMAL(30,6) and still order-independent."""
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {sql_dmean('l_quantity')} AS avg_qty,
               {sql_dmean('l_extendedprice')} AS avg_price,
               {sql_dmean('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM {pq(sf_dir, 'lineitem')}
        WHERE l_shipdate <= TIMESTAMP_NTZ '2001-08-06 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """)


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
    broadcast the filtered BUILDING customers into orders (hint pins the
    strategy; AQE would pick it anyway under threshold), one shuffle join
    against lineitem, top-10 via TakeOrderedAndProject."""
    return spark.sql(f"""
        SELECT /*+ BROADCAST(c) */
               l.l_orderkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o.o_orderpriority
        FROM {pq(sf_dir, 'lineitem')} l
        JOIN {pq(sf_dir, 'orders')} o ON l.l_orderkey = o.o_orderkey
        JOIN {pq(sf_dir, 'customer')} c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP_NTZ '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP_NTZ '1998-01-01 00:00:00'
        GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """)


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
    """TPC-H Q5: six-table join. supplier/nation/region broadcast (hinted);
    lineitem⨝orders⨝customer carries the volume — written in that order so
    the large fact is probe side throughout. The c_nationkey = s_nationkey
    condition rides the supplier broadcast join."""
    return spark.sql(f"""
        SELECT /*+ BROADCAST(s), BROADCAST(n), BROADCAST(r) */
               n.n_name AS nation,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM {pq(sf_dir, 'lineitem')} l
        JOIN {pq(sf_dir, 'orders')} o ON l.l_orderkey = o.o_orderkey
        JOIN {pq(sf_dir, 'customer')} c ON o.o_custkey = c.c_custkey
        JOIN {pq(sf_dir, 'supplier')} s
          ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN {pq(sf_dir, 'nation')} n ON s.s_nationkey = n.n_nationkey
        JOIN {pq(sf_dir, 'region')} r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, nation
    """)


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
    parquet scan (PushedFilters), the aggregate is one partial+final pair."""
    return spark.sql(f"""
        SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
               COUNT(*) AS n_lines
        FROM {pq(sf_dir, 'lineitem')}
        WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """)
