"""Streaming-surface tests beyond the oracle gate: the foreachBatch parquet
sink round-trip and stream-reader schema normalization."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import types as T

from clif_spark import io, streaming

SF_DIR = os.environ.get("CLIF_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_foreachbatch_parquet_sink(spark):
    ev = streaming.read_events_stream(spark, SF_DIR)
    out_dir = tempfile.mkdtemp(prefix="clif_stream_out_")
    ckpt = tempfile.mkdtemp(prefix="clif_stream_ckpt_")
    q = streaming.write_stream_parquet(
        ev.select("event_id", "ts", "event_type"), out_dir, ckpt)
    q.awaitTermination()
    written = spark.read.parquet(out_dir)
    batch = io.load_table(spark, SF_DIR, "events")
    assert written.count() == batch.count()
    assert set(written.columns) == {"event_id", "ts", "event_type"}


def test_stream_reader_normalizes_ts(spark):
    ev = streaming.read_events_stream(spark, SF_DIR)
    assert ev.isStreaming
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
