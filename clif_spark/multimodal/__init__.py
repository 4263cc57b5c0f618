"""Multimodal column support (north star: BASELINE.json).

Images/audio/video are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract run as Arrow-batched pandas functions over
``mapInPandas`` — the one place the engine deliberately leaves the JVM,
because media codecs are native libraries, not expressions.

The decode step itself is STUBBED in this container (no PIL/ffmpeg baked in):
``decode_image_meta`` tries a real decoder import and otherwise computes a
deterministic fake (header-derived) metadata record. Everything around the
stub — schema, Arrow batch shape, partitioning, UDF signature — is real and
tested, so swapping in a real codec is a one-function change.

Scale notes: media blobs dominate row size, so the iterator-of-batches form
matters (``mapInPandas`` streams Arrow batches; nothing accumulates per
task); repartition by a content key upstream to even out blob-size skew, and
keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` small enough that
batch_bytes = records × blob_size fits the executor's Arrow buffer.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata schema every decoder emits alongside the passthrough id.
IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
])


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (testdata carries no real media;
    utf-8 bytes of the text stand in — the engine treats it as opaque)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a codec: derive (format, width, height)
    from the byte content. Matches the SQL oracle formula, so the Arrow
    plumbing is verified end-to-end even without a real decoder."""
    n = len(payload)
    first = payload[0] if n else 0
    return ("png" if first % 2 == 0 else "jpeg", (n % 640) + 1, (first % 480) + 1)


def decode_image_meta(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """Decode metadata from a binary column via Arrow-batched mapInPandas.

    With a real imaging library installed the stub is replaced by e.g.
    ``PIL.Image.open(io.BytesIO(b))``; the plan, schema and batch flow are
    identical either way.
    """
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401
        raise NotImplementedError(
            "real image decode not wired in this build; see _fake_decode")
    except ImportError:
        pass

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        # Self-contained copy of _fake_decode: defining it INSIDE the
        # closure makes cloudpickle serialize it by value, so executor
        # Python workers need no clif_spark on their PYTHONPATH (a
        # module-level reference would import-fail on any worker whose
        # environment lacks the repo — e.g. a driver loading
        # __spark_entry__ by file path from a foreign cwd).
        def decode(payload: bytes) -> tuple[str, int, int]:
            n = len(payload)
            first = payload[0] if n else 0
            return ("png" if first % 2 == 0 else "jpeg",
                    (n % 640) + 1, (first % 480) + 1)

        for pdf in batches:
            metas = [decode(b if b is not None else b"") for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": [len(b) if b is not None else 0 for b in pdf[payload_col]],
                "format": [m[0] for m in metas],
                "width": [m[1] for m in metas],
                "height": [m[2] for m in metas],
            })

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_META_SCHEMA)


def frame_sample_stub(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload",
                      every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame" (byte
    offset stride stands in for time stride). Demonstrates the 1->N decode
    shape (video -> frames) with pure-Spark expressions; a real sampler
    replaces the offsets with PTS timestamps inside mapInPandas."""
    n = F.length(F.col(payload_col))
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)),
                         F.lit(every_n_bytes))
    return (df.select(id_col, payload_col)
              .withColumn("frame_offset", F.explode(offsets))
              .select(id_col, "frame_offset",
                      F.substring(F.col(payload_col),
                                  F.col("frame_offset") + 1, 16).alias("frame_bytes")))


#: Schema for resize_image_meta (the resize stage's metadata contract).
RESIZE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("out_width", T.LongType()),
    T.StructField("out_height", T.LongType()),
    T.StructField("scale_pct", T.LongType()),
])


def resize_image_meta(df: DataFrame, max_side: int = 256,
                      id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """Resize planning via Arrow-batched mapInPandas: decode (stub) ->
    aspect-preserving fit inside a ``max_side`` square -> typed metadata.

    The geometry is integer-exact (floor of width*max_side/long_side with
    the long side pinned to max_side), so the DuckDB oracle can mirror it
    bit-for-bit; a real implementation adds the pixel transform
    (``PIL.Image.resize``) next to the arithmetic without touching the
    plan, schema, or batch flow. Images already inside the square pass
    through unscaled (scale_pct = 100)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        # By-value decode copy — see decode_image_meta for why the closure
        # must not reference module-level clif_spark symbols.
        def decode(payload: bytes) -> tuple[str, int, int]:
            n = len(payload)
            first = payload[0] if n else 0
            return ("png" if first % 2 == 0 else "jpeg",
                    (n % 640) + 1, (first % 480) + 1)

        for pdf in batches:
            rows = []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                _, w, h = decode(b if b is not None else b"")
                long_side = max(w, h)
                if long_side <= max_side:
                    ow, oh = w, h
                else:
                    if w >= h:
                        ow, oh = max_side, (h * max_side) // w
                    else:
                        ow, oh = (w * max_side) // h, max_side
                rows.append((int(did), w, h, ow, oh,
                             (ow * 100) // max(w, 1)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "out_width", "out_height",
                "scale_pct"])

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_META_SCHEMA)
