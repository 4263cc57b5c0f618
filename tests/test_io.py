"""Sink/source tests (SURVEY §2.1 S1-S7): parquet/csv round trips, the
delimited-text reader with an explicit schema, and the partitioned event
layout policy."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _make_xlsx(path: str) -> None:
    """Minimal SpreadsheetML fixture: shared strings, an inline string,
    a number, a skipped cell, a short row."""
    import zipfile
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    shared = (f'<?xml version="1.0"?><sst {ns} count="4" uniqueCount="4">'
              '<si><t>lab_name</t></si><si><t>lab_group</t></si>'
              '<si><t>sodium</t></si><si><t>BMP</t></si></sst>')
    sheet = (f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
             '<row r="1"><c r="A1" t="s"><v>0</v></c>'
             '<c r="B1" t="s"><v>1</v></c>'
             '<c r="C1" t="inlineStr"><is><t>units</t></is></c></row>'
             '<row r="2"><c r="A2" t="s"><v>2</v></c>'
             '<c r="B2" t="s"><v>3</v></c>'
             '<c r="C2"><v>140</v></c></row>'
             # row 3: B skipped entirely, short row
             '<row r="3"><c r="A3" t="inlineStr"><is><t>potassium</t></is></c>'
             '<c r="C3"><v>4.5</v></c></row>'
             '</sheetData></worksheet>')
    ct = ('<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.'
          'org/package/2006/content-types"/>')
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_read_vocab_xlsx_fixture(spark):
    base = tempfile.mkdtemp(prefix="clif_xlsx_")
    path = f"{base}/vocab.xlsx"
    _make_xlsx(path)
    dim = io.read_vocab_xlsx(spark, path)
    assert dim.columns == ["lab_name", "lab_group", "units"]
    rows = {tuple(r) for r in dim.collect()}
    assert rows == {("sodium", "BMP", "140"), ("potassium", None, "4.5")}


def test_read_vocab_xlsx_broadcast_join(spark):
    """The loaded dim drives a J1 broadcast vocab join (plan-asserted)."""
    base = tempfile.mkdtemp(prefix="clif_xlsx_")
    path = f"{base}/vocab.xlsx"
    _make_xlsx(path)
    dim = io.read_vocab_xlsx(spark, path)
    facts = spark.createDataFrame(
        [("sodium", 139.0), ("potassium", 4.1), ("unknown", 1.0)],
        "lab_name string, value double")
    from clif_spark.operators import core
    joined = core.vocab_join(facts, dim, on="lab_name", how="left")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {(r.lab_name, r.lab_group) for r in joined.collect()}
    assert got == {("sodium", "BMP"), ("potassium", None), ("unknown", None)}


def test_read_vocab_xlsx_reference_sheet(spark):
    """The actual reference spreadsheet loads with its documented header
    (SURVEY §1.1; skipped when the reference checkout is absent)."""
    import pytest as _pytest
    ref = "/root/reference/rclif_data/lab_name_lab_group_units.xlsx"
    if not os.path.exists(ref):
        _pytest.skip("reference data not present")
    dim = io.read_vocab_xlsx(spark, ref)
    assert "lab_name" in dim.columns and "lab_group" in dim.columns
    assert dim.count() > 20
    names = [r.lab_name for r in dim.select("lab_name").collect()]
    assert any(n and "sodium" in n.lower() for n in names)


def test_read_vocab_xlsx_strips_bom_keys(spark):
    """Reference sheets carry U+FEFF-polluted vocab keys; default load
    makes them joinable (strip_invisible=False keeps raw bytes)."""
    import pytest as _pytest
    ref = "/root/reference/rclif_data/lab_name_lab_group_units.xlsx"
    if not os.path.exists(ref):
        _pytest.skip("reference data not present")
    dim = io.read_vocab_xlsx(spark, ref)
    names = {r.lab_name for r in dim.select("lab_name").collect()}
    assert "pao2" in names            # stripped -> joinable
    raw = io.read_vocab_xlsx(spark, ref, strip_invisible=False)
    raw_names = {r.lab_name for r in raw.select("lab_name").collect()}
    assert "﻿﻿﻿pao2" in raw_names


def test_parse_bytes_and_partition_estimate(spark):
    from clif_spark.io import _approx_scan_partitions, _parse_bytes

    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("64k") == 64 << 10
    assert _parse_bytes("oops") is None  # caller falls back to JVM probe

    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for conf in ["128m", "64k"]:
            spark.conf.set("spark.sql.files.maxPartitionBytes", conf)
            df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            assert _approx_scan_partitions(df) == df.rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_read_delimited_corrupt_record_quarantine(spark):
    """Malformed lines survive as quarantinable rows (PERMISSIVE +
    corrupt column), are droppable (DROPMALFORMED), and FAILFAST raises."""
    from pyspark.sql import types as T

    base = tempfile.mkdtemp(prefix="clif_corrupt_")
    path = f"{base}/raw.psv"
    with open(path, "w") as fh:
        fh.write("id|qty\n1|10\nnot-a-number-row-with|too|many|fields\n3|30\n")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("qty", T.LongType())])

    kept = io.read_delimited(spark, path, sep="|", schema=schema,
                             corrupt_col="_bad")
    rows = {r.id: (r.qty, r._bad) for r in kept.collect()}
    assert rows[1] == (10, None) and rows[3] == (30, None)
    bad = [r for r in kept.collect() if r._bad is not None]
    assert len(bad) == 1 and "too|many|fields" in bad[0]._bad

    dropped = io.read_delimited(spark, path, sep="|", schema=schema,
                                mode="DROPMALFORMED")
    assert {r.id for r in dropped.collect()} == {1, 3}

    import pytest as _pytest
    with _pytest.raises(Exception):
        io.read_delimited(spark, path, sep="|", schema=schema,
                          mode="FAILFAST").collect()


def test_orc_sink_roundtrip(spark, tmp_path):
    """S4 generalizes beyond parquet/csv: ORC (Spark-native columnar with
    predicate pushdown) round-trips through the same layout-policy writer."""
    df = spark.range(0, 100).selectExpr(
        "id", "id % 5 AS k", "cast(id * 1.5 as double) AS v")
    out = str(tmp_path / "orc_out")
    io.write_table(df, out, fmt="orc", sort_within_partitions=["id"])
    back = spark.read.orc(out)
    assert back.count() == 100
    assert sorted(back.columns) == ["id", "k", "v"]
    assert back.filter("k = 3").count() == 20


def test_read_jsonl_schema_and_quarantine(spark, tmp_path):
    """JSONL ingest: explicit schema (nested struct), PERMISSIVE quarantine
    of malformed lines into the corrupt column — same junk->NULL-at-row-
    granularity policy as the delimited reader."""
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "meta": {"lang": "en"}}\n'
        '{"doc_id": 2, "text": "bonjour", "meta": {"lang": "fr"}}\n'
        'NOT JSON AT ALL\n')
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("meta", T.StructType([
            T.StructField("lang", T.StringType())])),
    ])
    df = io.read_jsonl(spark, str(p), schema=schema, corrupt_col="_raw")
    rows = {r.doc_id: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[1].meta.lang == "en"
    assert rows[2].text == "bonjour"
    bad = rows[None]
    assert bad._raw == "NOT JSON AT ALL" and bad.text is None
    # dotted-path projection stays a narrow scan
    assert df.select("meta.lang").where("doc_id = 2").first()[0] == "fr"


def test_jdbc_roundtrip_derby(spark, tmp_path):
    """JDBC source/sink against the Derby engine Spark itself bundles
    (derby-*.jar ships in pyspark/jars for the metastore): write a table
    over JDBC, read it back plain and partitioned, and check the
    partitioned read really splits the key range."""
    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    # Uppercase aliases: Derby folds unquoted identifiers (in predicates
    # and partition clauses) to uppercase, while Spark always quotes the
    # written column names — uppercase on both sides keeps them aligned.
    src = spark.range(100).selectExpr("id AS ID", "id % 7 AS K",
                                     "cast(id * 1.5 as double) AS V")
    io.write_jdbc(src, url, "t_roundtrip", mode="overwrite",
                  num_partitions=1, properties=props)
    back = io.read_jdbc(spark, url, "t_roundtrip", properties=props)
    assert back.count() == 100
    assert {c.lower() for c in back.columns} == {"id", "k", "v"}

    ranged = io.read_jdbc(spark, url, "t_roundtrip",
                          partition_column="ID", lower_bound=0,
                          upper_bound=100, num_partitions=4,
                          properties=props)
    assert ranged.rdd.getNumPartitions() == 4
    assert ranged.count() == 100
    assert ranged.agg(F.sum("ID")).first()[0] == 4950

    pred = io.read_jdbc(spark, url, "t_roundtrip",
                        predicates=["K < 3", "K >= 3"], properties=props)
    assert pred.rdd.getNumPartitions() == 2
    assert pred.count() == 100

    import pytest

    with pytest.raises(ValueError):
        io.read_jdbc(spark, url, "t_roundtrip", partition_column="ID")

    # predicates and partition bounds are mutually exclusive partitioning
    # schemes; silently preferring one would drop the caller's other intent
    with pytest.raises(ValueError, match="mutually exclusive"):
        io.read_jdbc(spark, url, "t_roundtrip",
                     partition_column="ID", lower_bound=0, upper_bound=100,
                     num_partitions=4, predicates=["K < 3", "K >= 3"],
                     properties=props)


def test_uri_scheme_passthrough_file(spark):
    """S3 (cloud object-store scan): the engine passes hadoop-compatible
    URIs straight to spark.read (io.py module notes). No object store
    exists in this sandbox, so the URI *mechanism* is pinned with the
    file:// scheme — the same FileSystem-resolution path s3a:// and
    abfs:// take, minus network: a scheme-qualified URI must resolve
    identically to the bare path."""
    bare = f"{SF_DIR}/nation.parquet"
    via_uri = io.read_parquet(spark, f"file://{os.path.abspath(bare)}")
    assert sorted(map(tuple, via_uri.collect())) \
        == sorted(map(tuple, spark.read.parquet(bare).collect()))
    # and through the engine loader path used by every query
    multi = io.read_parquet(spark, [f"file://{os.path.abspath(bare)}",
                                    f"file://{os.path.abspath(bare)}"])
    assert multi.count() == via_uri.count() * 2


def test_binary_file_ingest_feeds_media_decode(spark, tmp_path):
    """The binaryFile source is the real ingestion path for the multimodal
    layer: write actual PNG/WAV files to disk, read them back as binary
    rows, and run the sample-stats decoder on the content column."""
    import math

    from clif_spark import io, multimodal

    png = multimodal.build_png_rich(9, 7, lambda x, y, c: (x + 2 * y + c) % 256)
    (tmp_path / "img_1.png").write_bytes(png)
    wav_samples = [((k * 13) % 600) - 300 for k in range(50)]
    import struct
    data = b"".join(struct.pack("<h", v) for v in wav_samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    (tmp_path / "clip_2.wav").write_bytes(
        b"RIFF" + struct.pack("<I", len(body)) + body)
    (tmp_path / "notes.txt").write_text("not media")

    df = io.read_binary_files(spark, str(tmp_path))
    assert set(df.columns) == {"path", "modificationTime", "length",
                               "content"}
    assert df.count() == 3
    # glob filter prunes at listing
    assert io.read_binary_files(spark, str(tmp_path), glob="*.png").count() == 1

    binary = df.selectExpr(
        "cast(regexp_extract(path, '_([0-9]+)\\\\.', 1) as long) AS doc_id",
        "content AS payload").filter("doc_id IS NOT NULL")
    out = {r.doc_id: r for r in
           multimodal.media_sample_features(binary).collect()}
    pvals = [(x + 2 * y + c) % 256
             for y in range(7) for x in range(9) for c in range(3)]
    assert out[1].kind == "png_pixels"
    assert out[1].mean_value == sum(pvals) / len(pvals)
    assert out[2].kind == "wav_pcm"
    assert out[2].rms == math.sqrt(
        sum(v * v for v in wav_samples) / len(wav_samples))


def test_merge_schema_reads_evolved_extracts(spark, tmp_path):
    """A later extract gains a column: mergeSchema unions the footers
    (old rows NULL-filled); the default single-footer read documents the
    hazard this flag exists for."""
    from clif_spark import io

    d = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], ["id", "v1"]) \
        .write.parquet(d + "/m1")
    spark.createDataFrame([(2, "b", 9.5)], ["id", "v1", "v2_added"]) \
        .write.parquet(d + "/m2")
    merged = io.read_parquet(spark, [d + "/m1", d + "/m2"],
                             merge_schema=True)
    assert set(merged.columns) == {"id", "v1", "v2_added"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].v2_added is None and rows[2].v2_added == 9.5


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """read_jdbc/write_jdbc against a REAL database — embedded Derby
    ships in Spark's own jars, so the JDBC surface gets an in-sandbox
    round-trip (write -> read, predicate partitioning, bounded range
    partitioning) instead of staying an untested URI contract."""
    from pyspark.sql import functions as F

    from clif_spark import io

    # Derby folds unquoted identifiers to UPPER CASE; writing uppercase
    # column names keeps the read-side quoted references resolvable.
    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.range(100).select(
        F.col("id").cast("long").alias("K"),
        (F.col("id") % 7).cast("long").alias("GRP"),
        F.concat(F.lit("val-"), F.col("id")).alias("VAL"))
    io.write_jdbc(src, url, "t_round", mode="overwrite",
                  num_partitions=1, properties=props)

    back = io.read_jdbc(spark, url, "t_round", properties=props)
    assert back.count() == 100
    assert {r.K for r in back.filter("GRP = 3").collect()} == \
        {i for i in range(100) if i % 7 == 3}

    # bounded range partitioning: rows outside bounds still arrive
    # (bounds partition, they don't filter)
    ranged = io.read_jdbc(spark, url, "t_round",
                          partition_column="K", lower_bound=20,
                          upper_bound=80, num_partitions=4,
                          properties=props)
    assert ranged.rdd.getNumPartitions() == 4
    assert ranged.count() == 100

    # predicate partitioning: one partition per predicate, union complete
    preds = [f"MOD(K, 3) = {i}" for i in range(3)]
    pred_df = io.read_jdbc(spark, url, "t_round", predicates=preds,
                           properties=props)
    assert pred_df.rdd.getNumPartitions() == 3
    assert pred_df.count() == 100

    # append lands on top of overwrite
    io.write_jdbc(src.limit(5), url, "t_round", mode="append",
                  num_partitions=1, properties=props)
    assert io.read_jdbc(spark, url, "t_round",
                        properties=props).count() == 105


def test_jsonl_gzip_ingest(spark, tmp_path):
    """Corpus dumps arrive as .jsonl.gz; Spark's text-source codec layer
    decompresses transparently, so read_jsonl needs no gzip branch —
    this pins that behavior (and the explicit-schema path) against
    hand-written compressed shards, including one malformed line
    quarantined via corrupt_col."""
    import gzip as _gzip
    import json

    from pyspark.sql import types as T

    rows = [{"doc_id": i, "text": f"doc {i}", "lang": "en"}
            for i in range(10)]
    shard1 = "\n".join(json.dumps(r) for r in rows[:6]) + "\n"
    shard2 = "\n".join(json.dumps(r) for r in rows[6:]) + "\nnot json\n"
    (tmp_path / "part-0.jsonl.gz").write_bytes(
        _gzip.compress(shard1.encode(), mtime=0))
    (tmp_path / "part-1.jsonl.gz").write_bytes(
        _gzip.compress(shard2.encode(), mtime=0))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    # cache() materializes all columns first: Spark disallows queries
    # whose referenced columns reduce to ONLY the internal corrupt
    # column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which the bad-row count
    # below would otherwise prune down to
    df = io.read_jsonl(spark, str(tmp_path), schema=schema,
                       corrupt_col="_bad").cache()
    try:
        good = df.filter(df._bad.isNull())
        assert good.count() == 10
        assert df.filter(df._bad.isNotNull()).count() == 1
        got = {r["doc_id"]: r["text"] for r in good.collect()}
        assert got == {i: f"doc {i}" for i in range(10)}
    finally:
        df.unpersist()
