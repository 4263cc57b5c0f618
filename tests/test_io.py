"""Sink/source tests (SURVEY §2.1 S1-S7): parquet/csv round trips, the
delimited-text reader with an explicit schema, and the partitioned event
layout policy."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from clif_spark import io
from clif_spark.operators import skew

SF_DIR = os.environ.get("CLIF_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_parquet_and_csv_sinks_roundtrip(spark):
    src = io.load_table(spark, SF_DIR, "nation")
    base = tempfile.mkdtemp(prefix="clif_io_")
    io.write_table(src, f"{base}/p", fmt="parquet")
    io.write_table(src, f"{base}/c", fmt="csv")
    back_p = spark.read.parquet(f"{base}/p")
    back_c = (spark.read.option("header", "true").option("inferSchema", "true")
              .csv(f"{base}/c"))
    assert sorted(map(tuple, back_p.collect())) == sorted(map(tuple, src.collect()))
    assert back_c.count() == src.count()
    assert back_c.columns == src.columns


def test_read_delimited_explicit_schema(spark):
    base = tempfile.mkdtemp(prefix="clif_io_")
    path = f"{base}/raw.txt"
    with open(path, "w") as f:
        f.write("C19_PATIENT_ID|recorded_time|meas_value\n")
        f.write("6914|1585713600|98.6\n")
        f.write("7001|1585717200|junk\n")
    df = io.read_delimited(
        spark, path, sep="|",
        schema="C19_PATIENT_ID string, recorded_time long, meas_value string")
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("6914", 1585713600, "98.6"), ("7001", 1585717200, "junk")]


def test_write_events_partitioned_layout(spark):
    ev = io.load_table(spark, SF_DIR, "events").limit(500)
    base = tempfile.mkdtemp(prefix="clif_io_")
    io.write_events_partitioned(ev, f"{base}/ev", ts_col="ts",
                                entity_col="user_id", buckets=4)
    # hive-partitioned by event date
    parts = [d for d in os.listdir(f"{base}/ev") if d.startswith("event_date=")]
    assert parts, "expected event_date=... partition directories"
    back = spark.read.parquet(f"{base}/ev")
    assert back.count() == 500
    # partition pruning: a single-date filter scans one partition directory
    one_day = back.filter(F.col("event_date") == parts[0].split("=")[1])
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan


def test_salted_join_and_count_equivalence(spark):
    df = spark.createDataFrame(
        [("hot", i % 3) for i in range(200)] + [("cold", 99)],
        "k string, v long")
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C")], "k string, label string")
    plain = sorted(map(tuple, df.join(dim, "k").collect()))
    salted = sorted(map(tuple, skew.salted_join(df, dim, "k").collect()))
    assert salted == plain
    counts = {r["k"]: r["n"]
              for r in skew.salted_count(df, ["k"], salt_buckets=4).collect()}
    assert counts == {"hot": 200, "cold": 1}
