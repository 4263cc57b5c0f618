"""Multimodal column support (north star: BASELINE.json).

Images/audio/video are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract run as Arrow-batched pandas functions over
``mapInPandas`` — the one place the engine deliberately leaves the JVM,
because media codecs are native libraries, not expressions.

Metadata decode is REAL for PNG/JPEG/GIF payloads: width/height/format are
parsed from container headers with stdlib byte slicing (``_header_decode``)
— no codec library required. Pixel-level decode (resampling, frame
extraction) is the part that stays stubbed in this container (no PIL/ffmpeg
baked in); everything around it — schema, Arrow batch shape, partitioning,
UDF signature — is real and tested, so swapping in a full codec is a
one-function change.

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


def _header_decode(payload: bytes) -> tuple[str, int, int] | None:
    """Real image metadata from container headers, stdlib-only — no codec
    library needed because width/height live in the first bytes of every
    common container. Returns None when the payload is not a recognized
    image, so callers can fall back to the deterministic stub (which is
    what the synthetic text-as-bytes oracle corpus exercises).

    - PNG: 8-byte signature, then the IHDR chunk is mandatory-first —
      width/height are big-endian u32 at offsets 16 and 20.
    - JPEG: walk the marker stream to the first SOF0-SOF15 frame header
      (excluding DHT/JPG/DAC at C4/C8/CC); height/width are big-endian
      u16 at offsets +5/+7 inside the segment.
    - GIF87a/89a: logical-screen width/height, little-endian u16 at 6/8.
      Unlike the PNG/JPEG magic bytes (invalid UTF-8, so unreachable from
      text), ``GIF87a`` is plain ASCII — a text document can start with it.
      A payload that decodes as UTF-8 end-to-end is treated as text and
      skipped (a real GIF's LZW-compressed body virtually never survives a
      full UTF-8 decode; an all-ASCII sub-1KB GIF could in principle slip
      to the stub, which is the safe direction for the oracle corpus).
    """
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("png", w, h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(payload[i + 5:i + 7], "big")
                w = int.from_bytes(payload[i + 7:i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        try:
            payload.decode("utf-8")
            return None  # ASCII-prefixed text, not a GIF
        except UnicodeDecodeError:
            pass
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return ("gif", w, h)
    return None


def decode_image_meta(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """Decode metadata from a binary column via Arrow-batched mapInPandas.

    Recognized image containers (PNG/JPEG/GIF) are decoded for REAL from
    their headers (``_header_decode`` — stdlib byte parsing, no codec
    library); unrecognized payloads fall back to the deterministic stub so
    the synthetic text-as-bytes oracle corpus stays verifiable. Pixel-level
    decode (``PIL.Image.open``) would slot in beside the header parse
    without touching the plan, schema or batch flow.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        # Self-contained copies of _header_decode/_fake_decode: defining
        # them INSIDE the closure makes cloudpickle serialize them by
        # value, so executor Python workers need no clif_spark on their
        # PYTHONPATH (a module-level reference would import-fail on any
        # worker whose environment lacks the repo — e.g. a driver loading
        # __spark_entry__ by file path from a foreign cwd).
        def header_decode(p: bytes):
            if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n":
                return ("png", int.from_bytes(p[16:20], "big"),
                        int.from_bytes(p[20:24], "big"))
            if len(p) >= 4 and p[:2] == b"\xff\xd8":
                i = 2
                while i + 9 <= len(p):
                    if p[i] != 0xFF:
                        break
                    m = p[i + 1]
                    if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
                        i += 2
                        continue
                    seg_len = int.from_bytes(p[i + 2:i + 4], "big")
                    if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                        return ("jpeg", int.from_bytes(p[i + 7:i + 9], "big"),
                                int.from_bytes(p[i + 5:i + 7], "big"))
                    i += 2 + seg_len
                return None
            if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
                try:
                    p.decode("utf-8")
                    return None  # ASCII-prefixed text, not a GIF
                except UnicodeDecodeError:
                    return ("gif", int.from_bytes(p[6:8], "little"),
                            int.from_bytes(p[8:10], "little"))
            return None

        def decode(payload: bytes) -> tuple[str, int, int]:
            real = header_decode(payload)
            if real is not None:
                return real
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
