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


def read_parquet(spark: SparkSession, path: str | list[str],
                 merge_schema: bool = False) -> DataFrame:
    """S6/S7: parquet scan; pass a list of paths for union-of-part-files.

    ``merge_schema=True`` reconciles evolved footers across files (a month
    that gained a column reads alongside older extracts, missing columns
    NULL-filled) — pay the footer-union cost only when asked; Spark's
    default takes one file's schema, which silently DROPS late-added
    columns from a mixed directory."""
    reader = spark.read.option("mergeSchema", "true") if merge_schema \
        else spark.read
    if isinstance(path, list):
        return reader.parquet(*path)
    return reader.parquet(path)


#: (session id, path) -> (session, DataFrame). The session object is held
#: in the value so its id() can never be recycled while the memo lives —
#: the same lifetime trick as queries._REGISTERED_VIEWS. Mutations hold
#: _TABLE_MEMO_LOCK (a caller may resolve tables from multiple threads —
#: e.g. concurrent streaming queries); stopped sessions are swept on
#: insert so the memo cannot pin dead JVM-side plans for the process
#: lifetime. The documented immutable-fixture caveat stands:
#: invalidate_table_memo() is the REFRESH TABLE analog.
_TABLE_MEMO: dict[tuple[int, str], tuple[SparkSession, DataFrame]] = {}
_TABLE_MEMO_LOCK = __import__("threading").Lock()


def _session_stopped(s: SparkSession) -> bool:
    try:
        return s.sparkContext._jsc is None or s.sparkContext._jsc.sc().isStopped()
    except Exception:
        return True  # unreachable JVM == dead for caching purposes


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table, normalizing types to engine conventions.

    events.ts arrives as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it reads as a long of
    nanoseconds, which we floor-truncate to microseconds and expose as a real
    TimestampType — same truncation DuckDB applies reading TIMESTAMP_NS into its
    micro-resolution TIMESTAMP, so oracle comparisons agree exactly.

    The resolved DataFrame is memoized per (session, path): a parquet PATH
    reference re-lists the directory and re-reads footers during analysis
    of every freshly built plan (measured ~100 ms per reference at sf0.1 —
    the dominant per-query driver cost once plans are JVM-built), while the
    memoized logical plan resolves once, exactly like the temp-view cache
    ``queries.pq`` keeps for SQL-string queries. Scans still re-read files
    each execution; only the RESOLUTION is cached. Freshness caveat, by
    design: new part-files appearing under an already-memoized path are not
    picked up by this session — these fixture dirs are immutable, and
    production tables belong in a catalog (whose relation cache makes the
    same trade, with REFRESH TABLE as the escape hatch; ours is
    ``invalidate_table_memo``)."""
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path)
    with _TABLE_MEMO_LOCK:
        hit = _TABLE_MEMO.get(key)
    if hit is not None:
        return hit[1]
    df = spark.read.parquet(path)
    if name == "events":
        ts_field = df.schema["ts"]
        if isinstance(ts_field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Probe session liveness OUTSIDE the lock: _session_stopped is a py4j
    # round trip, and a slow or hung JVM call while holding the lock
    # would block every concurrent load_table in the process. Snapshot
    # under the lock, probe unlocked, then re-check membership before
    # deleting (an entry may have been legitimately replaced meanwhile).
    with _TABLE_MEMO_LOCK:
        snapshot = dict(_TABLE_MEMO)
    dead = [k for k, (s, _) in snapshot.items() if _session_stopped(s)]
    with _TABLE_MEMO_LOCK:
        for k in dead:
            cur = _TABLE_MEMO.get(k)
            if cur is not None and cur[0] is snapshot[k][0]:
                del _TABLE_MEMO[k]
        _TABLE_MEMO[key] = (spark, df)
    return df


def invalidate_table_memo() -> None:
    """Drop every memoized table resolution (the REFRESH TABLE analog)."""
    with _TABLE_MEMO_LOCK:
        _TABLE_MEMO.clear()


def _parse_bytes(conf_val: str) -> int | None:
    """Parse a Spark byte-size conf value ('134217728', '128m', '1g',
    '134217728b') the way JavaUtils.byteStringAsBytes does. Returns None on
    anything unrecognized so callers can fall back to a JVM probe —
    filtering to digit characters (the old behavior) silently read '128m'
    as 128 *bytes* and exploded the partition estimate."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", conf_val or "")
    if not m:
        return None
    mult = {"": 1, "b": 1,
            "k": 1 << 10, "kb": 1 << 10,
            "m": 1 << 20, "mb": 1 << 20,
            "g": 1 << 30, "gb": 1 << 30,
            "t": 1 << 40, "tb": 1 << 40}.get(m.group(2).lower())
    return int(m.group(1)) * mult if mult else None


def _approx_scan_partitions(df: DataFrame) -> int | None:
    """Estimate how many splits the file scan under ``df`` yields, from file
    sizes alone — mirroring Spark's FilePartitions planning: splits are cut
    at ``maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    totalBytes / defaultParallelism))`` and bin-packed greedily with each
    file padded by ``openCostInBytes`` (FilePartition.maxSplitBytes /
    getFilePartitions in Spark's datasource code). Without the
    defaultParallelism term, one 400 MB file on 32 cores would be estimated
    at 4 splits while the scan actually yields ~32, triggering a pointless
    repartition in ensure_parallelism; without open-cost padding, many-small-
    file scans are undercounted. Returns None when the plan has no file
    source, sizes are unavailable (non-local FS), or a size conf does not
    parse, so callers can fall back to the JVM probe.

    Rationale: the obvious probe, ``df.rdd.getNumPartitions()``, converts the
    whole plan to an RDD through py4j and costs ~0.9 s per call — more than
    many small queries take end-to-end. File metadata costs ~10 ms.
    """
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
        if not files:
            return None
        spark = df.sparkSession
        max_part = _parse_bytes(spark.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728b"))
        open_cost = _parse_bytes(spark.conf.get(
            "spark.sql.files.openCostInBytes", "4194304b"))
        if max_part is None or open_cost is None:
            return None
        sizes = []
        for f in files:
            parsed = urlparse(f)
            if parsed.scheme not in ("", "file"):
                return None
            sizes.append(os.path.getsize(parsed.path))
        total = sum(sizes) + open_cost * len(sizes)
        parallelism = spark.sparkContext.defaultParallelism
        max_split = min(max_part, max(open_cost, total // max(parallelism, 1)))
        # FilePartitions packing, mirrored: clip files into <= max_split
        # chunks, sort all chunks descending, close a partition when the
        # next chunk would overflow, and account each placed chunk at
        # (length + openCost).
        chunks: list[int] = []
        for size in sizes:
            while size > max_split:
                chunks.append(max_split)
                size -= max_split
            if size > 0:
                chunks.append(size)
        parts, current, occupied = 0, 0, False
        for c in sorted(chunks, reverse=True):
            if occupied and current + c > max_split:
                parts += 1
                current, occupied = 0, False
            current += c + open_cost
            occupied = True
        if occupied:
            parts += 1
        return parts
    except Exception:
        return None


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the scan produced fewer splits than the
    session's parallelism width.

    Small single-file inputs arrive as one partition, serializing every
    narrow stage above the first shuffle onto one core. At production scale
    the scan yields >= cores splits and this is a no-op — the repartition
    shuffle is only paid exactly when the input is small enough for it to be
    cheap. Used ahead of CPU-heavy narrow work (shingling, embedding math).

    Width = min(defaultParallelism, shuffle.partitions): shuffle.partitions
    is the session owner's data-sized parallelism declaration — repartition
    wider than it buys nothing on small inputs and pays real per-task
    scheduler cost; on clusters shuffle.partitions >= cores, so the min()
    resolves to core count there (queries.narrow_width rationale)."""
    spark = df.sparkSession
    target = min_partitions or min(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")))
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
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """S1/S7: delimited text scan replacing big_fread1 chunked ingest.

    Spark parallelizes by input split (``maxPartitionBytes``); schemas should be
    explicit (`clif_spark.schemas`) — ``inferSchema`` costs an extra full pass
    over 100 TB of text and is only acceptable for exploration.

    Malformed-row policy (raw EHR dumps are messy; at 100 TB a single bad
    line must not kill a 6-hour job, and silently dropping it must not be
    the only alternative): ``mode`` is Spark's PERMISSIVE / DROPMALFORMED /
    FAILFAST. Pass ``corrupt_col`` (with an explicit ``schema``) to retain
    each unparseable line verbatim in that column — rows parse to NULLs +
    raw text, so the pipeline can count, quarantine, or re-parse them
    (the engine's junk->NULL cast policy, applied at row granularity)."""
    reader = (spark.read.option("header", str(header).lower())
              .option("sep", sep).option("mode", mode))
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        if corrupt_col not in schema.fieldNames():
            # copy first: StructType.add MUTATES in place, and silently
            # growing the caller's schema object corrupts their later reads
            schema = T.StructType(list(schema.fields)).add(
                corrupt_col, T.StringType(), True)
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    paths = path if isinstance(path, list) else [path]
    return reader.csv(paths)


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines scan (the interchange format LLM corpus dumps actually
    arrive in — one document object per line).

    Same policy as ``read_delimited``: explicit schema (inference costs a
    full extra pass at corpus scale), PERMISSIVE/DROPMALFORMED/FAILFAST
    malformed-row handling, optional quarantine column retaining the raw
    line. Nested fields come back as structs/arrays per the schema —
    project with dotted paths; no flattening pass needed."""
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        if corrupt_col not in schema.fieldNames():
            schema = T.StructType(list(schema.fields)).add(
                corrupt_col, T.StringType(), True)
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    paths = path if isinstance(path, list) else [path]
    return reader.json(paths)


def read_vocab(spark: SparkSession, rows: list[tuple], columns: list[str]) -> DataFrame:
    """S2: materialize a small controlled-vocabulary dimension table.

    The reference loads these from xlsx (≤110 rows,
    `rclif_data/lab_name_lab_group_units.xlsx`); at any scale they are
    driver-side literals and must be broadcast in joins (SURVEY §4).
    ``read_vocab_xlsx`` loads the actual spreadsheets.
    """
    return spark.createDataFrame(rows, columns)


def read_xlsx_rows(path: str, sheet: int = 1) -> list[list[str | None]]:
    """Parse one worksheet of an .xlsx file into rows of cell strings.

    Stdlib-only (zipfile + ElementTree — xlsx is zipped SpreadsheetML), so
    the engine has no optional-dependency gate around its vocabulary
    ingest. Handles shared strings (t="s"), inline strings (t="inlineStr"),
    formula strings (t="str"), booleans (t="b") and numbers; skipped cells
    inside a row come back as None; trailing all-empty cells are ragged
    (caller pads). Numbers keep their literal lexical form (vocab sheets
    are string-typed; cast downstream if needed).
    """
    import xml.etree.ElementTree as ET
    import zipfile

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{ns}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{ns}t")))
        sheet_xml = z.read(f"xl/worksheets/sheet{sheet}.xml")
    root = ET.fromstring(sheet_xml)
    rows: list[list[str | None]] = []
    for row_el in root.iter(f"{ns}row"):
        cells: list[str | None] = []
        for c in row_el.findall(f"{ns}c"):
            ref = c.get("r", "")
            col_idx = 0
            for ch in ref:
                if ch.isalpha():
                    col_idx = col_idx * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            while len(cells) < col_idx - 1:   # fill skipped cells
                cells.append(None)
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find(f"{ns}is")
                val = ("".join(t.text or "" for t in is_el.iter(f"{ns}t"))
                       if is_el is not None else None)
            else:
                v = c.find(f"{ns}v")
                raw = v.text if v is not None else None
                if raw is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(raw)]
                elif ctype == "b":
                    val = "true" if raw == "1" else "false"
                else:
                    val = raw
            cells.append(val)
        rows.append(cells)
    return rows


def read_vocab_xlsx(spark: SparkSession, path: str, sheet: int = 1,
                    header: bool = True,
                    columns: list[str] | None = None,
                    strip_invisible: bool = True) -> DataFrame:
    """S2: load a controlled-vocabulary dimension from a real spreadsheet
    (the reference's `read_excel` at `code/RCLIF_labs.Rmd:38`,
    `code/RCLIF_vitals.Rmd:33,93`, `code/RCLIF_medications.Rmd:34,94`;
    data shape: `rclif_data/lab_name_lab_group_units.xlsx`).

    Driver-side parse is the correct scale story: vocab sheets are ≤ a few
    hundred rows, the resulting DataFrame is a broadcast dimension (J1) —
    the same footprint as ``read_vocab`` literals. Column names come from
    the header row (sanitized); all columns are nullable strings.

    ``strip_invisible`` (default on) removes Unicode format characters
    (category Cf: BOM, zero-width marks) from cell values: the reference's
    actual sheets carry them — ``lab_name`` values arrive as e.g.
    '\\ufeff\\ufeff\\ufeffpao2' — and a vocab key that LOOKS like 'pao2'
    but never equi-joins is a silent-empty-join trap. Pass False for
    byte-faithful values.
    """
    import unicodedata

    rows = read_xlsx_rows(path, sheet)
    if strip_invisible:
        rows = [[("".join(ch for ch in c
                          if unicodedata.category(ch) != "Cf")
                  if isinstance(c, str) else c) for c in r]
                for r in rows]
    if not rows:
        raise ValueError(f"no rows in {path} sheet {sheet}")
    if columns is None:
        if header:
            columns = [
                "".join(ch for ch in (c or "").strip()
                        if ch.isprintable()).strip() or f"col_{i}"
                for i, c in enumerate(rows[0])]
            rows = rows[1:]
        else:
            columns = [f"col_{i}" for i in range(max(map(len, rows)))]
    width = len(columns)
    padded = [tuple((r + [None] * width)[:width]) for r in rows]
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in columns])
    return spark.createDataFrame(padded, schema)


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


def write_bucketed_table(df: DataFrame, table: str, bucket_col: str,
                         buckets: int = 64,
                         sort_cols: list[str] | None = None,
                         mode: str = "overwrite") -> None:
    """Metastore-backed bucketed layout — the shuffle-free-join half of the
    100 TB story: two tables bucketed by the same key into the same bucket
    count join with NO exchange on either side, and aggregations keyed on
    the bucket column skip their shuffle too (`tests/test_plans.py` asserts
    both on actual plans). ``sort_cols`` adds within-bucket ordering
    (SortMergeJoin then skips its sorts as well).

    This is the publish-side complement of ``write_events_partitioned``'s
    pure-path approximation: bucketing metadata only lives in a metastore,
    so this writer requires ``saveAsTable``; readers use
    ``spark.table(name)``."""
    writer = (df.write.mode(mode).format("parquet")
                .bucketBy(buckets, bucket_col))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              num_partitions: int | None = None,
              predicates: list[str] | None = None,
              properties: dict[str, str] | None = None) -> DataFrame:
    """Relational source over JDBC (the "Spark SQL + JDBC for analytics"
    contract in BASELINE.json; the reference's equivalent surface is its
    DBI/ODBC extract step feeding `code/RCLIF_*.Rmd`).

    Scale shape: a bare JDBC read is ONE connection streaming the whole
    table through a single task — at warehouse scale always pass either
    ``partition_column`` + bounds (numeric/date column; Spark issues
    ``num_partitions`` bounded range queries in parallel) or explicit
    ``predicates`` (one partition per predicate, e.g. hash buckets or date
    ranges). Bounds are *partitioning* hints, not filters — rows outside
    them still arrive, skewed into the edge partitions. Catalyst pushes
    projections and filters into the remote query either way.
    """
    if predicates and partition_column is not None:
        raise ValueError(
            "predicates and partition_column are mutually exclusive "
            "partitioning schemes — pass one or the other")
    if predicates:
        # DataFrameReader.jdbc exposes predicate partitioning directly.
        return spark.read.jdbc(url, table, predicates=predicates,
                               properties=properties or {})
    reader = spark.read.format("jdbc").option("url", url) \
        .option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions")
        reader = (reader.option("partitionColumn", partition_column)
                        .option("lowerBound", str(lower_bound))
                        .option("upperBound", str(upper_bound))
                        .option("numPartitions", str(num_partitions)))
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               batch_size: int = 10_000,
               num_partitions: int | None = None,
               properties: dict[str, str] | None = None) -> None:
    """Relational sink over JDBC. One connection per partition, rows
    batched ``batch_size`` at a time; ``num_partitions`` caps the writer's
    connection fan-out (coalesce, not repartition — no shuffle just to
    write). Idempotency belongs to the destination (staging table +
    MERGE, or a transactional overwrite) — 'append' retried after a
    partial failure duplicates rows, same as any parallel JDBC loader."""
    out = df.coalesce(num_partitions) if num_partitions else df
    writer = (out.write.format("jdbc").mode(mode)
                 .option("url", url).option("dbtable", table)
                 .option("batchsize", str(batch_size)))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


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


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None,
                      recursive: bool = False) -> DataFrame:
    """S8 (engine ext.): opaque file ingestion via Spark's built-in
    ``binaryFile`` source — (path, modificationTime, length, content) with
    content as a BinaryType column, the input path for the multimodal
    layer (clif_spark.multimodal decodes `content` without the file ever
    touching the driver).

    Scale notes: the source splits by FILE (one row per file, never
    splitting a blob), so partition sizing follows
    ``spark.sql.files.maxPartitionBytes`` over whole files and a
    pathological single-huge-file input is one task by construction —
    chunk media at the storage layer, not in the reader. Pushdown: only
    ``length``/``modificationTime``/``path`` filters prune at the listing
    (content predicates cannot); project `content` away when only
    metadata is needed and the files are never opened."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)
