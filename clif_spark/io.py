"""Sources and sinks (SURVEY §2.1 S1-S7) with a scale-aware layout policy.

Reference operators re-expressed Spark-first:

- S1 chunked delimited-text scan (`code/RCLIF_vitals.Rmd:23-24` big_fread1
  every_nlines=1e7) -> ``read_delimited``: Spark splits files natively via
  ``spark.sql.files.maxPartitionBytes``; no manual chunking.
- S2 Excel vocab scan (`code/RCLIF_vitals.Rmd:33`) -> ``read_vocab``: tiny
  dimension tables materialized as DataFrames; always broadcast in joins.
- S3 cloud object-store scan (`code/RCLIF_dialysis.Rmd:32` box_read) ->
  any hadoop-compatible URI (s3a://, abfs://) passes straight through
  ``spark.read``; auth belongs in Hadoop conf, never in code.
- S4/S5 parquet/csv sinks (`code/RCLIF_vitals.Rmd:67,73`) -> ``write_table``.
- S6 parquet read-back (`code/RCLIF_vitals.Rmd:206`) -> ``read_parquet``.
- S7 union-of-part-files (`code/RCLIF_vitals.Rmd:25` rbind) -> multi-path read.

Scale policy (100 TB north star): event tables are written partitioned by event
date and optionally bucketed by the entity key (encounter_id / user_id) so that
per-entity windows (W1/W2) and entity joins (J2) avoid a shuffle; global sorts at
the sink are replaced by ``sortWithinPartitions`` (SURVEY §7.4.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Driver-provided TPC-H-ish testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """S6/S7: parquet scan; pass a list of paths for union-of-part-files."""
    if isinstance(path, list):
        return spark.read.parquet(*path)
    return spark.read.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table, normalizing types to engine conventions.

    events.ts arrives as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it reads as a long of
    nanoseconds, which we floor-truncate to microseconds and expose as a real
    TimestampType — same truncation DuckDB applies reading TIMESTAMP_NS into its
    micro-resolution TIMESTAMP, so oracle comparisons agree exactly.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_field = df.schema["ts"]
        if isinstance(ts_field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _approx_scan_partitions(df: DataFrame) -> int | None:
    """Estimate how many splits the file scan under ``df`` yields, from file
    sizes alone — the same ``maxPartitionBytes`` arithmetic Spark's
    FilePartition planner applies. Returns None when the plan has no file
    source or sizes are unavailable (non-local FS), so callers can fall back.

    Rationale: the obvious probe, ``df.rdd.getNumPartitions()``, converts the
    whole plan to an RDD through py4j and costs ~0.9 s per call — more than
    many small queries take end-to-end. File metadata costs ~10 ms.
    """
    import math
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
        if not files:
            return None
        conf_val = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728b")
        max_bytes = int("".join(ch for ch in conf_val if ch.isdigit()) or "134217728")
        parts = 0
        for f in files:
            parsed = urlparse(f)
            if parsed.scheme not in ("", "file"):
                return None
            parts += max(1, math.ceil(os.path.getsize(parsed.path) / max_bytes))
        return parts
    except Exception:
        return None


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the scan produced fewer splits than cores.

    Small single-file inputs arrive as one partition, serializing every
    narrow stage above the first shuffle onto one core. At production scale
    the scan yields >= cores splits and this is a no-op — the repartition
    shuffle is only paid exactly when the input is small enough for it to be
    cheap. Used ahead of CPU-heavy narrow work (shingling, embedding math).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    current = _approx_scan_partitions(df)
    if current is None:
        # Non-file source (in-memory fixture, stream) — JVM-side probe; still
        # ~5x cheaper than df.rdd which builds the Python RDD machinery.
        current = df._jdf.rdd().getNumPartitions()
    if current < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def read_delimited(
    spark: SparkSession,
    path: str | list[str],
    sep: str = "|",
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """S1/S7: delimited text scan replacing big_fread1 chunked ingest.

    Spark parallelizes by input split (``maxPartitionBytes``); schemas should be
    explicit (`clif_spark.schemas`) — ``inferSchema`` costs an extra full pass
    over 100 TB of text and is only acceptable for exploration.
    """
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    paths = path if isinstance(path, list) else [path]
    return reader.csv(paths)


def read_vocab(spark: SparkSession, rows: list[tuple], columns: list[str]) -> DataFrame:
    """S2: materialize a small controlled-vocabulary dimension table.

    The reference loads these from xlsx (≤110 rows,
    `rclif_data/lab_name_lab_group_units.xlsx`); at any scale they are
    driver-side literals and must be broadcast in joins (SURVEY §4).
    """
    return spark.createDataFrame(rows, columns)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """S4/S5 sinks with the engine layout policy.

    The reference globally sorts every published table before writing
    (`code/RCLIF_vitals.Rmd:61,166`). A global sort is a range-partition
    exchange over the whole dataset — unaffordable at 100 TB — so the engine
    default is partitioned layout + sortWithinPartitions, which preserves the
    read-side usefulness (clustered scans) without the global exchange
    (SURVEY §7.4.8).
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def write_events_partitioned(df: DataFrame, path: str, ts_col: str = "ts",
                             entity_col: str | None = None,
                             buckets: int = 64) -> None:
    """Canonical 100-TB layout for longitudinal event tables.

    Partition by event date (dynamic partition pruning for time-range queries,
    SURVEY §2.2 P10) and, when a metastore is available, bucket by the entity
    key so per-entity windows and joins are shuffle-free. Bucketing requires
    ``saveAsTable``; for pure-path sinks we approximate with ``repartition`` on
    the entity key, which at least co-locates an entity within a file.
    """
    out = df.withColumn("event_date", F.to_date(F.col(ts_col)))
    if entity_col is not None:
        out = out.repartition(buckets, F.col(entity_col))
    (out.sortWithinPartitions(*(c for c in (entity_col, ts_col) if c))
        .write.mode("overwrite").partitionBy("event_date").parquet(path))
