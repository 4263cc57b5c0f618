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

    # Bind the parser as a LOCAL so the run closure captures it by value
    # (cloudpickle serializes nested/factory functions whole — executor
    # Python workers need no clif_spark on their PYTHONPATH; a module-level
    # reference would import-fail on any worker whose environment lacks the
    # repo, e.g. a driver loading __spark_entry__ by path from a foreign
    # cwd). The stub fallback is small enough to keep inline.
    _, _, header_decode = _media_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

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


#: Metadata contract for audio/video/image container decode: one row per
#: document, NULLs where a field does not apply to the container kind.
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("container", T.StringType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("first_frame_offset", T.LongType()),
])


def _media_codecs():
    """Factory for the container-header parsers. Callers bind the returned
    functions into mapInPandas closures: nested functions are cloudpickled
    BY VALUE, so executor workers need no clif_spark import — ONE
    definition serves the module-level API, decode_image_meta, and
    decode_media_meta (previously three hand-kept copies; a bounds fix
    applied to one copy silently missed the others)."""

    def wav_decode(p: bytes):
        """(sample_rate, channels, duration_ms) from a RIFF/WAVE header —
        stdlib byte slicing. Walks the word-aligned chunk list for
        ``fmt `` (channels u16 LE @2, sample rate u32 LE @4, byte rate
        u32 LE @8) and ``data`` (payload size -> duration). None unless a
        well-formed fmt chunk with a positive byte rate is found."""
        if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return None
        sr = ch = brate = None
        data_size = 0
        i = 12
        while i + 8 <= len(p):
            cid = p[i:i + 4]
            csz = int.from_bytes(p[i + 4:i + 8], "little")
            body = p[i + 8:i + 8 + csz]
            if cid == b"fmt " and len(body) >= 16:
                ch = int.from_bytes(body[2:4], "little")
                sr = int.from_bytes(body[4:8], "little")
                brate = int.from_bytes(body[8:12], "little")
            elif cid == b"data":
                data_size = csz
            i += 8 + csz + (csz & 1)
        if sr is None or not brate:
            return None
        return (sr, ch, data_size * 1000 // brate)

    def mp4_decode(p: bytes):
        """(duration_ms, n_frames, first_frame_offset) from an ISO BMFF
        box tree. ``mvhd`` carries timescale/duration (v0: u32s at body
        offsets 12/16, needs body+20; v1: u32 at 20 + u64 at 24, needs
        body+32 — a truncated v1 box returns None, never a partial
        big-endian read); ``stco`` lists per-chunk frame anchors. Requires
        the ``ftyp`` brand box first, so no UTF-8 text guard is needed."""
        if len(p) < 12 or p[4:8] != b"ftyp":
            return None
        found: dict = {}

        def walk(start: int, end: int) -> None:
            i = start
            while i + 8 <= end:
                size = int.from_bytes(p[i:i + 4], "big")
                typ = p[i + 4:i + 8]
                if size < 8:
                    return
                body, body_end = i + 8, min(i + size, end)
                if typ == b"mvhd" and body + 20 <= end:
                    if p[body] == 1:  # version 1: 64-bit times
                        if body + 32 <= end:
                            ts = int.from_bytes(p[body + 20:body + 24], "big")
                            dur = int.from_bytes(p[body + 24:body + 32], "big")
                            found["mvhd"] = (ts, dur)
                    else:
                        ts = int.from_bytes(p[body + 12:body + 16], "big")
                        dur = int.from_bytes(p[body + 16:body + 20], "big")
                        found["mvhd"] = (ts, dur)
                elif typ == b"stco" and body + 8 <= end:
                    n = int.from_bytes(p[body + 4:body + 8], "big")
                    found["stco"] = [
                        int.from_bytes(p[body + 8 + 4 * k:body + 12 + 4 * k],
                                       "big")
                        for k in range(n) if body + 12 + 4 * k <= end]
                elif typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                    walk(body, body_end)
                i += size

        walk(0, len(p))
        if "mvhd" not in found:
            return None
        ts, dur = found["mvhd"]
        if not ts:
            return None
        offs = found.get("stco") or []
        return (dur * 1000 // ts, len(offs) or None, offs[0] if offs else None)

    def header_decode(p: bytes):
        """Real image metadata from container headers (PNG IHDR, JPEG SOF
        marker walk, GIF logical screen). ``GIF87a`` is plain ASCII, so a
        payload that decodes as UTF-8 end-to-end is treated as text and
        skipped (the PNG/JPEG magics are invalid UTF-8 — unreachable from
        text). None when not a recognized image."""
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
                    i += 2  # standalone markers carry no length
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
                pass
            return ("gif", int.from_bytes(p[6:8], "little"),
                    int.from_bytes(p[8:10], "little"))
        return None

    return wav_decode, mp4_decode, header_decode


#: Module-level bindings (tests and non-closure callers).
(_wav_decode, _mp4_decode, _header_decode) = _media_codecs()


def _media_builders():
    """Factory for the container-fixture builders (same by-value closure
    discipline as _media_codecs — one definition serves the module API and
    both synth generators' mapInPandas closures)."""
    import struct

    def build_wav(sample_rate: int, channels: int, n_frames: int,
                  data: bytes | None = None) -> bytes:
        """Spec-valid 16-bit PCM WAV; ``data`` defaults to silence of
        n_frames interleaved frames."""
        block = channels * 2
        fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                          sample_rate * block, block, 16)
        if data is None:
            data = bytes(n_frames * block)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    def build_mp4(timescale: int, duration: int,
                  frame_offsets: list) -> bytes:
        """Minimal ISO BMFF tree: ftyp + moov{mvhd(v0), trak{mdia{minf{
        stbl{stco}}}}} — just enough real structure to exercise the
        recursive box walk end-to-end."""
        mvhd = box(b"mvhd", bytes(4)  # version 0 + flags
                   + struct.pack(">IIII", 0, 0, timescale, duration)
                   + bytes(80))       # rate/volume/matrix/next_track_id
        stco = box(b"stco", struct.pack(">II", 0, len(frame_offsets))
                   + b"".join(struct.pack(">I", o) for o in frame_offsets))
        trak = box(b"trak", box(b"mdia", box(b"minf", box(b"stbl", stco))))
        ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        return ftyp + box(b"moov", mvhd + trak)

    def build_png_header(w: int, h: int) -> bytes:
        """Header-only PNG (IHDR + empty IEND): valid for metadata decode;
        build_png_rich adds real pixel data."""
        import zlib
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + b"\x08\x02\x00\x00\x00")
        chunk = (len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr
                 + zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big"))
        end = (0).to_bytes(4, "big") + b"IEND" \
            + zlib.crc32(b"IEND").to_bytes(4, "big")
        return b"\x89PNG\r\n\x1a\n" + chunk + end

    return build_wav, build_mp4, build_png_header


#: Module-level bindings (tests and fixture writers).
(build_wav_bytes, build_mp4_bytes, build_png_header) = _media_builders()


def synth_media_payload(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Deterministic media-container fixture generator for the synthetic
    corpus (testdata ships no real media): by ``doc_id % 4`` each document
    becomes a spec-valid WAV (0), MP4 (1), PNG (2), or stays raw utf-8
    text (3). All container parameters are closed-form functions of
    doc_id, so a SQL oracle can state the expected decode output without
    parsing — the builder and the real parser in ``decode_media_meta``
    then face each other end-to-end: a parser offset bug shows up as a
    mismatch against the formula, not as a cancelled round trip."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])

    wav, mp4, png = _media_builders()  # by-value closure capture

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            kind = doc_id % 4
            if kind == 0:
                return wav(8000 + (doc_id % 5) * 4000,
                           1 + (doc_id // 4) % 2,
                           100 + (doc_id % 50))
            if kind == 1:
                ts = 600 * (1 + doc_id % 3)
                dur = (10 + doc_id % 20) * ts + (doc_id % 600)
                nf = 3 + doc_id % 5
                first = 40 + (doc_id % 7) * 16
                return mp4(ts, dur, [first + 64 * k for k in range(nf)])
            if kind == 2:
                return png(16 + doc_id % 100, 16 + doc_id % 80)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t) for i, t in
                          zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def decode_media_meta(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """Container-dispatching media metadata decode over Arrow-batched
    mapInPandas: WAV (RIFF fmt/data chunks) and MP4 (mvhd + stco box walk)
    are parsed for REAL with stdlib byte slicing, images fall through to
    the PNG/JPEG/GIF header decode, and anything else is 'unknown' with
    NULL metadata. Pixel/sample decode lives one layer down
    (media_sample_features: PNG/GIF/WAV/baseline-JPEG, all stdlib); the
    metadata layer — the part schema inference, routing, and partitioning
    decisions actually consume — never needs it."""

    # One parser definition for all consumers: bound as locals so the run
    # closure pickles them by value (see decode_image_meta).
    wav_decode, mp4_decode, image_decode = _media_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = ["container", "sample_rate", "channels", "duration_ms",
                "width", "height", "n_frames", "first_frame_offset"]

        def decode(p: bytes) -> tuple:
            wav = wav_decode(p)
            if wav is not None:
                sr, ch, dur = wav
                return ("wav", sr, ch, dur, None, None, None, None)
            mp4 = mp4_decode(p)
            if mp4 is not None:
                dur, nf, off0 = mp4
                return ("mp4", None, None, dur, None, None, nf, off0)
            img = image_decode(p)
            if img is not None:
                fmt, w, h = img
                return (fmt, None, None, None, w, h, None, None)
            return ("unknown",) + (None,) * 7

        for pdf in batches:
            metas = [decode(b if b is not None else b"")
                     for b in pdf[payload_col]]
            out = {"doc_id": pdf[id_col].astype("int64")}
            for j, c in enumerate(cols):
                out[c] = pd.array([m[j] for m in metas],
                                  dtype="string" if c == "container"
                                  else "Int64")
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, MEDIA_META_SCHEMA)


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


# ---------------------------------------------------------------------------
# Pixel/sample-level decode (beyond metadata): PNG pixels via stdlib zlib,
# WAV PCM samples via struct, GIF pixels via hand LZW (_gif_codecs),
# baseline JPEG via hand Huffman + IDCT (multimodal/jpeg.py).
# PNG is zlib-compressed filtered scanlines (inflate + the five spec
# unfilters); GIF is LZW-coded palette indices (pure table logic); JPEG
# is canonical-Huffman-coded quantized DCT blocks (table logic + an 8x8
# transform). The remaining honest boundary is VIDEO codecs (H.264 etc.
# — transform + motion compensation at a scale hand-rolling would be
# obfuscation, not engineering); MP4 *containers* parse for real.
# ---------------------------------------------------------------------------

#: One row per document: sample-level statistics, NULL where the payload
#: has no decodable samples (MP4/text — sample decode needs a codec).
SAMPLE_STATS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_values", T.LongType()),
    T.StructField("mean_value", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.LongType()),
])


def _sample_codecs():
    """Factory for the pixel/sample codec functions. Callers bind the
    returned functions into mapInPandas closures: nested functions are
    cloudpickled BY VALUE, so executor workers need no clif_spark import
    (same constraint as decode_image_meta, without the copy-paste)."""
    import struct
    import zlib

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def png_filter_line(line: bytes, prev: bytes, ft: int, bpp: int) -> bytearray:
        """Encoder side: apply spec filter ``ft`` to a raw scanline."""
        out = bytearray(len(line))
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            pred = (0 if ft == 0 else a if ft == 1 else b if ft == 2
                    else (a + b) >> 1 if ft == 3 else paeth(a, b, c))
            out[i] = (line[i] - pred) & 0xFF
        return out

    def png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytearray:
        """Decoder side: reverse the per-scanline filters (0-4)."""
        stride = w * bpp
        out = bytearray()
        prev = bytearray(stride)
        pos = 0
        for _ in range(h):
            ft = raw[pos]
            line = bytearray(raw[pos + 1:pos + 1 + stride])
            pos += 1 + stride
            if ft == 1:
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif ft == 2:
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ft == 3:
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ft == 4:
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    c = prev[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + paeth(a, prev[i], c)) & 0xFF
            out += line
            prev = line
        return out

    def build_png_rich(width: int, height: int, pixel) -> bytes:
        """Spec-valid RGB8 PNG whose pixel (x, y, channel) values come from
        ``pixel(x, y, c)``; scanline y uses filter y % 5, so a decoder must
        implement ALL five unfilters to recover the pattern."""
        bpp = 3
        raw = bytearray()
        prev = bytes(width * bpp)
        for y in range(height):
            line = bytes(pixel(x, y, c) & 0xFF
                         for x in range(width) for c in range(bpp))
            ft = y % 5
            raw.append(ft)
            raw += png_filter_line(line, prev, ft, bpp)
            prev = line

        def chunk(typ: bytes, body: bytes) -> bytes:
            return (len(body).to_bytes(4, "big") + typ + body
                    + zlib.crc32(typ + body).to_bytes(4, "big"))

        ihdr = (width.to_bytes(4, "big") + height.to_bytes(4, "big")
                + bytes([8, 2, 0, 0, 0]))  # depth 8, RGB, default methods
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    def png_pixel_values(p: bytes) -> list[int] | None:
        """Full PNG pixel decode: chunk walk -> IDAT inflate -> unfilter.
        Handles 8-bit RGB (color type 2) and grayscale (0), the
        non-interlaced case; returns channel values row-major or None."""
        if len(p) < 33 or p[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        w = h = depth = ctype = None
        interlace = 0
        idat = bytearray()
        i = 8
        while i + 8 <= len(p):
            clen = int.from_bytes(p[i:i + 4], "big")
            typ = p[i + 4:i + 8]
            body = p[i + 8:i + 8 + clen]
            if typ == b"IHDR":
                w = int.from_bytes(body[0:4], "big")
                h = int.from_bytes(body[4:8], "big")
                depth, ctype = body[8], body[9]
                interlace = body[12]
            elif typ == b"IDAT":
                idat += body
            elif typ == b"IEND":
                break
            i += 12 + clen
        if not w or not h or depth != 8 or ctype not in (0, 2) or interlace:
            return None
        bpp = 3 if ctype == 2 else 1
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error:
            return None
        if len(raw) != h * (1 + w * bpp):
            return None
        return list(png_unfilter(raw, w, h, bpp))

    def wav_pcm_values(p: bytes) -> list[int] | None:
        """16-bit PCM sample decode from a RIFF/WAVE payload: fmt chunk
        must declare PCM (tag 1) at 16 bits; returns interleaved
        per-channel sample values."""
        if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return None
        fmt_ok = False
        data = None
        i = 12
        while i + 8 <= len(p):
            cid = p[i:i + 4]
            csz = int.from_bytes(p[i + 4:i + 8], "little")
            body = p[i + 8:i + 8 + csz]
            if cid == b"fmt " and len(body) >= 16:
                tag = int.from_bytes(body[0:2], "little")
                bits = int.from_bytes(body[14:16], "little")
                fmt_ok = (tag == 1 and bits == 16)
            elif cid == b"data":
                data = body
            i += 8 + csz + (csz & 1)
        if not fmt_ok or data is None:
            return None
        n = len(data) // 2
        return list(struct.unpack(f"<{n}h", data[:2 * n]))

    return build_png_rich, png_pixel_values, wav_pcm_values


#: Module-level bindings for direct unit testing.
(build_png_rich, png_pixel_values, wav_pcm_values) = _sample_codecs()


def _gif_codecs():
    """Factory for GIF-variant LZW + container functions (same by-value
    cloudpickle contract as _sample_codecs). GIF pixel decode is the
    second image codec that IS stdlib-feasible: the container is a plain
    byte walk and the entropy layer is LZW — pure table logic, no DCT.
    (Baseline JPEG followed in r7 — Huffman + IDCT hand-rolled in
    multimodal/jpeg.py — so the codec set is now PNG/GIF/JPEG/WAV.)

    GIF-LZW specifics implemented here (and mirrored by the tests):
    LSB-first bit packing; clear/EOI codes at 2^mcs and 2^mcs+1; code
    width starts at mcs+1 and grows when the next assignable code would
    not fit (encoder bumps after assigning 2^width, the decoder — one
    entry behind by construction — when its next code reaches 2^width);
    12-bit cap with DEFERRED CLEAR (both sides simply stop adding
    entries at 4096 — spec-legal and symmetric, so no reset handshake).
    """

    def lzw_compress(indices, mcs: int) -> bytes:
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        out = bytearray()
        bitbuf = bitcnt = 0

        def emit(code: int, width: int) -> None:
            nonlocal bitbuf, bitcnt
            bitbuf |= code << bitcnt
            bitcnt += width
            while bitcnt >= 8:
                out.append(bitbuf & 0xFF)
                bitbuf >>= 8
                bitcnt -= 8

        table = {(i,): i for i in range(1 << mcs)}
        nxt, width = eoi + 1, mcs + 1
        emit(clear, width)
        prefix = ()
        for px in indices:
            cand = prefix + (px,)
            if cand in table:
                prefix = cand
                continue
            emit(table[prefix], width)
            if nxt < 4096:
                table[cand] = nxt
                nxt += 1
                if nxt == (1 << width) + 1 and width < 12:
                    width += 1
            prefix = (px,)
        if prefix:
            emit(table[prefix], width)
            # The decoder adds a table entry for this FINAL code too (it
            # cannot know no more data follows), catching its next-code
            # counter up to ours — so if that counter now sits exactly at
            # 2^width, the decoder bumps its width before reading EOI and
            # we must emit EOI at the bumped width. In-loop emissions are
            # immune (we assign + check after every one); only the flush,
            # which assigns nothing, can desync. Found by the hypothesis
            # container-roundtrip fuzz at 13x27 (the in-repo tests and
            # 250 driver-gated GIFs all happened to miss the crossing).
            if nxt < 4096 and nxt == (1 << width) and width < 12:
                width += 1
        emit(eoi, width)
        if bitcnt:
            out.append(bitbuf & 0xFF)
        return bytes(out)

    def lzw_decompress(data: bytes, mcs: int,
                       max_out: int | None = None) -> list[int] | None:
        # mcs is payload-controlled: GIF caps LZW codes at 12 bits, so a
        # valid min code size is 2..11 — anything else must return None,
        # not build a 2^mcs base table (a crafted 0xFF byte would OOM).
        if not 2 <= mcs <= 11:
            return None
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        pos = 0  # bit cursor

        def read(width: int) -> int | None:
            nonlocal pos
            if pos + width > len(data) * 8:
                return None
            v = int.from_bytes(
                data[pos // 8:(pos + width + 7) // 8 + 1], "little")
            v = (v >> (pos % 8)) & ((1 << width) - 1)
            pos += width
            return v

        base = {i: (i,) for i in range(1 << mcs)}
        table = dict(base)
        nxt, width = eoi + 1, mcs + 1
        out: list[int] = []
        prev: tuple | None = None
        while True:
            code = read(width)
            if code is None:
                return None  # truncated stream (no EOI)
            if code == clear:
                table = dict(base)
                nxt, width, prev = eoi + 1, mcs + 1, None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return None
            elif code in table:
                entry = table[code]
            elif code == nxt:
                entry = prev + (prev[0],)  # the KwKwK self-reference case
            else:
                return None  # corrupt: code beyond the table frontier
            if prev is not None and nxt < 4096:
                table[nxt] = prev + (entry[0],)
                nxt += 1
                if nxt == (1 << width) and width < 12:
                    width += 1
            out.extend(entry)
            if max_out is not None and len(out) > max_out:
                return None  # stream longer than the frame — corrupt
            prev = entry

    def gif_palette(n_colors: int) -> list[tuple[int, int, int]]:
        """The synthesis palette: closed forms of the index so an oracle
        can restate every channel value without reading the table."""
        return [((i * 7) % 256, (i * 11) % 256, (i * 13) % 256)
                for i in range(n_colors)]

    def build_gif_rich(width: int, height: int, index_fn,
                       n_colors: int = 64) -> bytes:
        """Spec-valid GIF87a: one frame, global color table, REAL LZW
        image data (dictionary growth and all — not the fixed-width
        'uncompressed GIF' trick), indices from ``index_fn(x, y)``."""
        assert n_colors & (n_colors - 1) == 0 and 4 <= n_colors <= 256
        size_bits = n_colors.bit_length() - 2  # GCT size field: 2^(s+1)
        mcs = max(2, n_colors.bit_length() - 1)
        out = bytearray(b"GIF87a")
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out += bytes([0x80 | 0x70 | size_bits, 0, 0])
        for rgb in gif_palette(n_colors):
            out += bytes(rgb)
        out += b"\x2C" + bytes(4)  # image descriptor at (0, 0)
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out += b"\x00"  # no local table, not interlaced
        out.append(mcs)
        data = lzw_compress(
            [index_fn(x, y) % n_colors
             for y in range(height) for x in range(width)], mcs)
        for i in range(0, len(data), 255):
            block = data[i:i + 255]
            out.append(len(block))
            out += block
        out += b"\x00\x3B"
        return bytes(out)

    def gif_pixel_values(p: bytes) -> list[int] | None:
        """Full GIF pixel decode for the first frame: screen descriptor →
        color table → block walk (skipping 0x21 extensions) → LZW
        decompress → palette mapping. Returns RGB channel values
        row-major, or None for interlaced/local-table-less-corrupt/
        non-GIF payloads."""
        if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        packed = p[10]
        i = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            if i + 3 * n > len(p):
                return None  # truncated inside the global color table
            gct = [(p[i + 3 * j], p[i + 3 * j + 1], p[i + 3 * j + 2])
                   for j in range(n)]
            i += 3 * n
        while i < len(p):
            b = p[i]
            if b == 0x3B:
                return None  # trailer before any image
            if b == 0x21:  # extension: label byte then sub-blocks
                i += 2
                while i < len(p) and p[i] != 0:
                    i += 1 + p[i]
                i += 1
                continue
            if b != 0x2C or i + 10 > len(p):
                return None
            w = int.from_bytes(p[i + 5:i + 7], "little")
            h = int.from_bytes(p[i + 7:i + 9], "little")
            ipacked = p[i + 9]
            i += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if i + 3 * n > len(p):
                    return None  # truncated inside the local color table
                pal = [(p[i + 3 * j], p[i + 3 * j + 1], p[i + 3 * j + 2])
                       for j in range(n)]
                i += 3 * n
            if ipacked & 0x40 or pal is None:
                return None  # interlace out of scope; no palette at all
            if i >= len(p):
                return None
            mcs = p[i]
            i += 1
            data = bytearray()
            while i < len(p) and p[i] != 0:
                data += p[i + 1:i + 1 + p[i]]
                i += 1 + p[i]
            idx = lzw_decompress(bytes(data), mcs, max_out=w * h)
            if idx is None or len(idx) != w * h or any(
                    v >= len(pal) for v in idx):
                return None
            return [c for v in idx for c in pal[v]]
        return None

    return lzw_compress, lzw_decompress, gif_palette, build_gif_rich, \
        gif_pixel_values


#: Module-level bindings for direct unit testing.
(gif_lzw_compress, gif_lzw_decompress, gif_palette, build_gif_rich,
 gif_pixel_values) = _gif_codecs()


def synth_gif_payload(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      out_col: str = "payload") -> DataFrame:
    """GIF twin of synth_rich_media_payload: even doc_ids become real
    LZW-compressed GIF87a images with closed-form indexed pixels —
    index(x, y) = (doc_id + 3x + 5y) % 64 over a (10 + id%30) ×
    (8 + id%20) frame and the gif_palette channel forms — odd doc_ids
    stay raw utf-8 text (the 'other' path). Image sizes push the LZW
    dictionary well past the initial code width, so decode exercises
    genuine width growth, not just literal codes."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    _, _, _, build_gif, _ = _gif_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            if doc_id % 2 == 0:
                return build_gif(
                    10 + doc_id % 30, 8 + doc_id % 20,
                    lambda x, y: (doc_id + 3 * x + 5 * y) % 64)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def synth_jpeg_payload(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       out_col: str = "payload") -> DataFrame:
    """JPEG twin of synth_gif_payload: even doc_ids become real baseline
    JPEGs (SOI/DQT/DHT/SOF0/SOS marker stream, Huffman-coded DCT blocks —
    multimodal.jpeg) that are CONSTANT within each 8x8 block —
    value(x, y) = (3·doc_id + 7·(x div 8) + 11·(y div 8)) % 256 over a
    (9 + id%38) × (7 + id%26) frame — encoded with all-ones quant tables,
    which makes the lossy codec bit-exact for this content (DC-only
    blocks; see jpeg.py docstring) and the decoded statistics closed-form
    SQL-predictable. Frame sizes are deliberately NOT multiples of 8
    (partial-block padding + crop is exercised on every image) and a
    rotating restart interval exercises DRI/RSTn. Odd doc_ids stay raw
    utf-8 text (the 'other' path)."""
    from clif_spark.multimodal import jpeg as _jpeg

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            if doc_id % 2 == 0:
                return _jpeg.jpeg_encode_gray(
                    9 + doc_id % 38, 7 + doc_id % 26,
                    lambda x, y:
                        (3 * doc_id + 7 * (x // 8) + 11 * (y // 8)) % 256,
                    restart_interval=(doc_id // 2) % 3)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def synth_jpeg_progressive_payload(df: DataFrame, id_col: str = "doc_id",
                                   text_col: str = "text",
                                   out_col: str = "payload") -> DataFrame:
    """Progressive twin of synth_jpeg_payload: even doc_ids become real
    PROGRESSIVE JPEGs (SOF2, six scans — coarse DC, two spectral AC
    bands, then DC + AC successive-approximation refinements with
    cross-block EOBRUN), block-constant with value(x, y) =
    (5·doc_id + 7·(x div 8) + 13·(y div 8)) % 256 over a
    (9 + id%37) × (7 + id%25) frame, all-ones quant tables (bit-exact
    regime, closed-form oracle). Odd doc_ids stay raw utf-8 text."""
    from clif_spark.multimodal import jpeg as _jpeg

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            if doc_id % 2 == 0:
                return _jpeg.jpeg_encode_gray_progressive(
                    9 + doc_id % 37, 7 + doc_id % 25,
                    lambda x, y:
                        (5 * doc_id + 7 * (x // 8) + 13 * (y // 8)) % 256)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def synth_rich_media_payload(df: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             out_col: str = "payload") -> DataFrame:
    """Like synth_media_payload, but the WAV carries a patterned PCM signal
    and the PNG patterned, per-scanline-filtered pixels — closed forms of
    doc_id, so a SQL oracle can state the exact sample statistics the
    decoder must recover THROUGH the codec (zlib inflate + all five
    unfilters / PCM frames), not just from the headers:

    - wav (doc_id%4==0): channels 1+(doc_id//4)%2 - keyed off the
      container selector quotient, NOT doc_id%2 (always even for wav
      docs, which would pin every payload to mono), 100+doc_id%50
      frames,
      value_k = ((doc_id*31 + k*7) % 2048) - 1024 over interleaved k;
    - mp4 (1): unchanged metadata-only tree (no sample decode w/o codec);
    - png (2): 16+doc_id%40 × 16+doc_id%30 RGB, value(x,y,c) =
      (doc_id + x + y + c) % 256, scanline filter y%5;
    - text (3): raw utf-8.
    """
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    build_png, _, _ = _sample_codecs()
    build_wav, build_mp4, _ = _media_builders()

    def run(batches: Iterator) -> Iterator:
        import struct

        import pandas as pd

        def wav(doc_id: int) -> bytes:
            ch = 1 + (doc_id // 4) % 2
            nv = (100 + doc_id % 50) * ch
            sr = 8000 + (doc_id % 5) * 4000
            data = b"".join(
                struct.pack("<h", ((doc_id * 31 + k * 7) % 2048) - 1024)
                for k in range(nv))
            return build_wav(sr, ch, nv // ch, data=data)

        def mp4(doc_id: int) -> bytes:
            ts = 600 * (1 + doc_id % 3)
            dur = (10 + doc_id % 20) * ts + (doc_id % 600)
            offs = [40 + (doc_id % 7) * 16 + 64 * k
                    for k in range(3 + doc_id % 5)]
            return build_mp4(ts, dur, offs)

        def build(doc_id: int, text: str) -> bytes:
            kind = doc_id % 4
            if kind == 0:
                return wav(doc_id)
            if kind == 1:
                return mp4(doc_id)
            if kind == 2:
                return build_png(16 + doc_id % 40, 16 + doc_id % 30,
                                 lambda x, y, c: (doc_id + x + y + c) % 256)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def media_sample_features(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """Sample-level feature extraction over Arrow-batched mapInPandas:
    REAL pixel decode for PNG (zlib inflate + the five spec unfilters) and
    REAL 16-bit PCM decode for WAV, reduced per document to
    (n_values, mean, rms, peak) — the normalization statistics an
    image/audio training pipeline computes in its preprocessing pass.
    GIF payloads decode for real too (LZW + palette, _gif_codecs), and
    JPEG — baseline sequential AND progressive (SOF2 spectral selection +
    successive approximation) — decodes through the full Huffman + IDCT
    pipeline (multimodal.jpeg — luma channel values). Payloads without a
    stdlib-decodable sample body (MP4, text, arithmetic-coded JPEG) yield
    kind='other' with NULL stats rather than fabricated numbers.

    Determinism contract: stats accumulate in exact integer arithmetic
    (values are 8/16-bit ints; squares sum < 2^53) before one float
    division/sqrt at the end, so results are bit-identical to a SQL oracle
    computing the same closed forms — summation order cannot matter."""
    from clif_spark.multimodal.jpeg import jpeg_gray_values

    _, png_values, wav_values = _sample_codecs()
    _, _, _, _, gif_values = _gif_codecs()

    def run(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        def stats(payload: bytes):
            vals = wav_values(payload)
            kind = "wav_pcm"
            if vals is None:
                vals = png_values(payload)
                kind = "png_pixels"
            if vals is None:
                vals = gif_values(payload)
                kind = "gif_pixels"
            if vals is None:
                vals = jpeg_gray_values(payload)
                kind = "jpeg_pixels"
            if vals is None or not vals:
                return ("other", None, None, None, None)
            n = len(vals)
            s = sum(vals)
            s2 = sum(v * v for v in vals)
            return (kind, n, s / n, math.sqrt(s2 / n),
                    max(abs(v) for v in vals))

        for pdf in batches:
            rows = [stats(b if b is not None else b"")
                    for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "kind": [r[0] for r in rows],
                "n_values": pd.array([r[1] for r in rows], dtype="Int64"),
                "mean_value": pd.array([r[2] for r in rows],
                                       dtype="float64"),
                "rms": pd.array([r[3] for r in rows], dtype="float64"),
                "peak": pd.array([r[4] for r in rows], dtype="Int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, SAMPLE_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Video: REAL sample extraction from ISO BMFF (MP4) containers.
# mm_frame_offsets walks stco (chunk anchors, metadata grain); this layer
# goes one level deeper and reconstructs the actual per-sample byte ranges
# from the full sample-table machinery — stsz (sizes), stsc (chunk->sample
# mapping), stco (chunk offsets), stts (timing) — then slices the frames
# out of mdat. The frame PAYLOADS stay opaque (H.264 et al. are out of
# honest hand-rolling scope — see the codec-boundary note above), but the
# extraction a video training pipeline runs BEFORE any codec (demux,
# stride-sample, per-frame stats/routing) is all real.
# ---------------------------------------------------------------------------

#: 1->N frame extraction contract: one row per sampled frame.
VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("pts_ms", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("byte_sum", T.LongType()),
])


def _mp4_sample_codecs():
    """Factory for the MP4 sample-table builder/extractor pair (same
    by-value closure discipline as _media_codecs)."""
    import struct

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    def build_mp4_samples(timescale: int, sample_delta: int,
                          samples: list, uniform: bool = False,
                          single_sample_chunks: bool = False) -> bytes:
        """ISO BMFF with a REAL sample table: ftyp + mdat(samples) +
        moov{mvhd, trak{mdia{minf{stbl{stsd-less stsz/stsc/stco/stts}}}}}.
        Chunk layout is [2, 3, 3, ...] samples per chunk (stsc compresses
        to two entries — the run-length form decoders must actually
        expand), or one sample per chunk when ``single_sample_chunks``.
        ``uniform`` emits the stsz uniform-size branch (legal only when
        every sample has equal length)."""
        sizes = [len(s) for s in samples]
        if uniform and len(set(sizes)) > 1:
            raise ValueError("uniform stsz requires equal sample sizes")
        ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        mdat_body = b"".join(samples)
        mdat_off = len(ftyp) + 8  # absolute offset of first sample
        # chunk layout
        if single_sample_chunks:
            chunk_sizes = [1] * len(samples)
            stsc_entries = [(1, 1)] if samples else []
        else:
            chunk_sizes = []
            left = len(samples)
            per = 2
            while left > 0:
                take = min(per, left)
                chunk_sizes.append(take)
                left -= take
                per = 3
            stsc_entries = []
            for ci, n in enumerate(chunk_sizes):
                if not stsc_entries or stsc_entries[-1][1] != n:
                    stsc_entries.append((ci + 1, n))
        offsets = []
        pos = mdat_off
        k = 0
        for n in chunk_sizes:
            offsets.append(pos)
            for _ in range(n):
                pos += sizes[k]
                k += 1
        dur = sample_delta * len(samples)
        mvhd = box(b"mvhd", bytes(4)
                   + struct.pack(">IIII", 0, 0, timescale, dur)
                   + bytes(80))
        stsz = box(b"stsz", bytes(4) + (
            struct.pack(">II", sizes[0] if uniform and sizes else 0,
                        len(sizes))
            + (b"" if uniform else
               b"".join(struct.pack(">I", s) for s in sizes))))
        stsc = box(b"stsc", bytes(4) + struct.pack(">I", len(stsc_entries))
                   + b"".join(struct.pack(">III", fc, n, 1)
                              for fc, n in stsc_entries))
        stco = box(b"stco", bytes(4) + struct.pack(">I", len(offsets))
                   + b"".join(struct.pack(">I", o) for o in offsets))
        stts = box(b"stts", bytes(4) + struct.pack(">III", 1, len(samples),
                                                   sample_delta))
        stbl = box(b"stbl", stsz + stsc + stco + stts)
        trak = box(b"trak", box(b"mdia", box(b"minf", stbl)))
        return ftyp + box(b"mdat", mdat_body) + box(b"moov", mvhd + trak)

    def mp4_extract_samples(p: bytes):
        """Reconstruct per-sample (offset, size, pts_ticks) from the
        sample table and slice the frames out of the payload. Returns
        (timescale, [(bytes, pts_ticks), ...]) or None when the payload
        is not an MP4 with a complete sample table. Bounds-checked: a
        table pointing outside the file returns None, never garbage
        slices."""
        if len(p) < 12 or p[4:8] != b"ftyp":
            return None
        found: dict = {}

        def walk(start: int, end: int) -> None:
            i = start
            while i + 8 <= end:
                size = int.from_bytes(p[i:i + 4], "big")
                typ = p[i + 4:i + 8]
                if size < 8:
                    return
                body, body_end = i + 8, min(i + size, end)
                if typ == b"mvhd" and body + 20 <= end and p[body] == 0:
                    found["timescale"] = int.from_bytes(
                        p[body + 12:body + 16], "big")
                elif typ == b"stsz" and body + 12 <= end:
                    uniform = int.from_bytes(p[body + 4:body + 8], "big")
                    n = int.from_bytes(p[body + 8:body + 12], "big")
                    if uniform:
                        found["sizes"] = [uniform] * n
                    elif body + 12 + 4 * n <= end:
                        found["sizes"] = [
                            int.from_bytes(
                                p[body + 12 + 4 * k:body + 16 + 4 * k],
                                "big")
                            for k in range(n)]
                elif typ == b"stsc" and body + 8 <= end:
                    n = int.from_bytes(p[body + 4:body + 8], "big")
                    if body + 8 + 12 * n <= end:
                        found["stsc"] = [
                            (int.from_bytes(p[body + 8 + 12 * k:
                                              body + 12 + 12 * k], "big"),
                             int.from_bytes(p[body + 12 + 12 * k:
                                              body + 16 + 12 * k], "big"))
                            for k in range(n)]
                elif typ == b"stco" and body + 8 <= end:
                    n = int.from_bytes(p[body + 4:body + 8], "big")
                    if body + 8 + 4 * n <= end:
                        found["offsets"] = [
                            int.from_bytes(
                                p[body + 8 + 4 * k:body + 12 + 4 * k],
                                "big")
                            for k in range(n)]
                elif typ == b"stts" and body + 8 <= end:
                    n = int.from_bytes(p[body + 4:body + 8], "big")
                    if body + 8 + 8 * n <= end:
                        found["stts"] = [
                            (int.from_bytes(p[body + 8 + 8 * k:
                                              body + 12 + 8 * k], "big"),
                             int.from_bytes(p[body + 12 + 8 * k:
                                              body + 16 + 8 * k], "big"))
                            for k in range(n)]
                elif typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                    walk(body, body_end)
                i += size

        walk(0, len(p))
        sizes = found.get("sizes")
        stsc = found.get("stsc")
        offsets = found.get("offsets")
        if not sizes or not stsc or not offsets:
            return None
        # expand stsc run-length form: samples-per-chunk for each chunk
        per_chunk = []
        for ci in range(1, len(offsets) + 1):
            n = 0
            for fc, spc in stsc:
                if fc <= ci:
                    n = spc
                else:
                    break
            per_chunk.append(n)
        # per-sample pts ticks from stts deltas (cumulative)
        deltas = []
        for cnt, delta in found.get("stts", []):
            deltas.extend([delta] * cnt)
        samples = []
        k = 0
        pts = 0
        for off, n in zip(offsets, per_chunk):
            pos = off
            for _ in range(n):
                if k >= len(sizes):
                    break
                sz = sizes[k]
                if pos + sz > len(p):
                    return None  # table points past EOF: corrupt
                samples.append((p[pos:pos + sz], pts))
                pts += deltas[k] if k < len(deltas) else 0
                pos += sz
                k += 1
        if k != len(sizes):
            return None  # chunk layout doesn't cover every sample
        return (found.get("timescale") or 0, samples)

    return build_mp4_samples, mp4_extract_samples


def synth_video_payload(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Video twin of synth_jpeg_payload: doc_id % 3 == 0 becomes a real
    ISO BMFF container whose mdat carries n = 3 + id%6 deterministic
    frames — frame k has 16 + (id + k) % 32 bytes with byte i =
    (7·id + 13·k + i) % 256 — timescale 1000·(1 + id%3), per-frame delta
    40 ticks. Every third such doc uses single-sample chunks and every
    fifth the uniform-stsz branch, so all sample-table shapes appear in
    one corpus. Other doc_ids stay raw utf-8 text."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    build_mp4_samples, _ = _mp4_sample_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            if doc_id % 3 == 0:
                n = 3 + doc_id % 6
                uniform = doc_id % 15 == 0
                frames = [
                    bytes((7 * doc_id + 13 * k + i) % 256
                          for i in range(16 if uniform
                                         else 16 + (doc_id + k) % 32))
                    for k in range(n)]
                return build_mp4_samples(
                    1000 * (1 + doc_id % 3), 40, frames,
                    uniform=uniform,
                    single_sample_chunks=doc_id % 9 == 0)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def extract_video_frames(df: DataFrame, stride: int = 1,
                         id_col: str = "doc_id",
                         payload_col: str = "payload") -> DataFrame:
    """REAL 1->N video demux over Arrow-batched mapInPandas: walk the MP4
    sample table, slice every ``stride``-th frame out of mdat, and emit
    (frame_idx, pts_ms, n_bytes, byte_sum) per sampled frame — the
    demux + stride-sampling + per-frame routing stats a video training
    pipeline runs before any codec touches the frames. Non-MP4 payloads
    and containers without a complete sample table produce no rows (a
    demuxer that fabricates frames is worse than one that skips).

    Scale shape: one streaming Arrow batch per task, output fan-out is
    bounded by frames-per-doc / stride, byte_sum folds in exact integer
    arithmetic — nothing driver-side."""
    _, mp4_extract_samples = _mp4_sample_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, ptss, lens, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                got = mp4_extract_samples(
                    payload if payload is not None else b"")
                if got is None:
                    continue
                timescale, samples = got
                for k in range(0, len(samples), stride):
                    frame, pts = samples[k]
                    ids.append(int(doc_id))
                    idxs.append(k)
                    ptss.append(pts * 1000 // timescale
                                if timescale else 0)
                    lens.append(len(frame))
                    sums.append(sum(frame))
            yield pd.DataFrame({
                "doc_id": pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="int64"),
                "pts_ms": pd.array(ptss, dtype="int64"),
                "n_bytes": pd.array(lens, dtype="int64"),
                "byte_sum": pd.array(sums, dtype="int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, VIDEO_FRAME_SCHEMA)


#: demux -> JPEG decode contract: per-frame geometry + decoded luma stats.
VIDEO_PIXEL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("pts_ms", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("mean_value", T.DoubleType()),
    T.StructField("peak", T.LongType()),
])


def synth_mjpeg_payload(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """MJPEG-in-MP4: doc_id % 3 == 0 becomes a real ISO BMFF container
    whose mdat samples are REAL baseline JPEG frames (the
    synth_video_payload container around synth_jpeg_payload content) —
    the composition that makes the video story end-to-end decodable
    without hand-rolling H.264. Frame k of doc id is block-constant
    grayscale, value(x, y) = (3·id + 5·k + 7·(x div 8) + 11·(y div 8))
    % 256 over (9 + (id+5k)%20) × (7 + (id+3k)%14), all-ones quant
    tables (bit-exact decode regime), rotating restart intervals;
    n = 3 + id%4 frames, timescale 1000·(1 + id%3), delta 40 ticks.
    Other doc_ids stay raw utf-8 text."""
    from clif_spark.multimodal import jpeg as _jpeg

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    build_mp4_samples, _ = _mp4_sample_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            if doc_id % 3 == 0:
                frames = [
                    _jpeg.jpeg_encode_gray(
                        9 + (doc_id + 5 * k) % 20,
                        7 + (doc_id + 3 * k) % 14,
                        lambda x, y, k=k:
                            (3 * doc_id + 5 * k + 7 * (x // 8)
                             + 11 * (y // 8)) % 256,
                        restart_interval=(doc_id // 3 + k) % 3)
                    for k in range(3 + doc_id % 4)]
                return build_mp4_samples(
                    1000 * (1 + doc_id % 3), 40, frames)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def video_frame_pixel_stats(df: DataFrame, stride: int = 1,
                            id_col: str = "doc_id",
                            payload_col: str = "payload") -> DataFrame:
    """demux -> DECODE, closed loop: walk the MP4 sample table
    (extract_video_frames machinery), slice every ``stride``-th frame,
    decode it as baseline JPEG (multimodal/jpeg.py — MJPEG, the one
    video codec whose frames the engine can honestly decode), and emit
    per-frame geometry + luma statistics. Frames that are not decodable
    JPEGs are SKIPPED (same no-fabrication stance as the demuxer:
    H.264 payloads et al. stay opaque — extract_video_frames serves
    those at byte grain), as are non-MP4 payloads.

    Scale shape: one streaming Arrow batch per task; per-frame work is
    bounded by frame pixel count; exact integer folds (sum/peak), mean
    as one double divide — nothing driver-side, nothing accumulates
    across batches."""
    from clif_spark.multimodal import jpeg as _jpeg

    _, mp4_extract_samples = _mp4_sample_codecs()

    def run(batches: Iterator) -> Iterator:
        import struct

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "pts_ms",
                                   "width", "height", "n_pixels",
                                   "mean_value", "peak")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                got = mp4_extract_samples(
                    payload if payload is not None else b"")
                if got is None:
                    continue
                timescale, samples = got
                for k in range(0, len(samples), stride):
                    frame, pts = samples[k]
                    try:
                        decoded = _jpeg.jpeg_decode(bytes(frame))
                    except (ValueError, IndexError, KeyError,
                            StopIteration, struct.error):
                        decoded = None  # not a decodable JPEG frame
                    if decoded is None:
                        continue
                    w, h, planes = decoded
                    luma = planes[0]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(k)
                    out["pts_ms"].append(pts * 1000 // timescale
                                         if timescale else 0)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_pixels"].append(len(luma))
                    out["mean_value"].append(sum(luma) / len(luma))
                    out["peak"].append(max(luma))
            yield pd.DataFrame({
                "doc_id": pd.array(out["doc_id"], dtype="int64"),
                "frame_idx": pd.array(out["frame_idx"], dtype="int64"),
                "pts_ms": pd.array(out["pts_ms"], dtype="int64"),
                "width": pd.array(out["width"], dtype="int64"),
                "height": pd.array(out["height"], dtype="int64"),
                "n_pixels": pd.array(out["n_pixels"], dtype="int64"),
                "mean_value": pd.array(out["mean_value"],
                                       dtype="float64"),
                "peak": pd.array(out["peak"], dtype="int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, VIDEO_PIXEL_SCHEMA)


#: Surface-probe contract: metadata grain always served; pixel grain is
#: decoded / cleanly-rejected / not-a-JPEG, never a crashed task.
JPEG_PROBE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("meta_kind", T.StringType()),
    T.StructField("meta_width", T.LongType()),
    T.StructField("meta_height", T.LongType()),
    T.StructField("decode_status", T.StringType()),
    T.StructField("n_pixels", T.LongType()),
])


def synth_mixed_codec_payload(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              out_col: str = "payload") -> DataFrame:
    """Payloads straddling the documented codec boundary: doc_id%3==0 is
    a real decodable baseline JPEG (block-constant, all-ones quant —
    the synth_jpeg_payload regime); doc_id%3==1 is a syntactically
    well-formed JPEG whose frame header is SOF9 (0xC9, arithmetic
    coding — T.81's patent-era entropy coder, the decoder's documented
    honest boundary): real SOI/DQT/SOF9/SOS/EOI marker stream with
    plausible dimensions, so metadata-grain readers see a JPEG while
    the pixel decoder must REJECT rather than decode garbage;
    doc_id%3==2 stays raw utf-8 text."""
    import struct as _struct

    from clif_spark.multimodal import jpeg as _jpeg

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            if doc_id % 3 == 0:
                return _jpeg.jpeg_encode_gray(
                    9 + doc_id % 16, 7 + doc_id % 12,
                    lambda x, y:
                        (3 * doc_id + 7 * (x // 8) + 11 * (y // 8)) % 256)
            if doc_id % 3 == 1:
                w, h = 16 + doc_id % 32, 12 + doc_id % 24
                sof9 = (_struct.pack(">BHHB", 8, h, w, 1)
                        + bytes([1, 0x11, 0]))
                # entropy bytes are opaque to a parser that stops at SOF9
                return (b"\xff\xd8" + _jpeg._seg(0xC9, sof9)
                        + _jpeg._seg(0xDA, bytes([1, 1, 0, 0, 63, 0]))
                        + bytes((doc_id * 13 + i * 7) % 251
                                for i in range(16))
                        + b"\xff\xd9")
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def probe_jpeg_surface(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """Machine-checked codec boundary: run BOTH grains over arbitrary
    payloads and report what each one did. Metadata grain
    (``_header_decode``) serves any structurally-valid JPEG including
    out-of-surface codings; pixel grain (``jpeg.jpeg_decode``) returns
    'decoded' (+ pixel count), 'rejected_unsupported' (the clean
    ValueError for arithmetic/lossless/hierarchical/12-bit SOFs — the
    task survives, the payload is classified, nothing decodes to
    garbage), or 'not_jpeg'. One Arrow batch per task; per-payload
    exceptions are the CONTRACT here, caught at payload grain."""
    from clif_spark.multimodal import jpeg as _jpeg

    _, _, header_decode = _media_codecs()  # by-value closure discipline

    def run(batches: Iterator) -> Iterator:
        import struct as _struct

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "meta_kind", "meta_width",
                                   "meta_height", "decode_status",
                                   "n_pixels")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(payload) if payload is not None else b""
                meta = header_decode(p)
                out["doc_id"].append(int(doc_id))
                out["meta_kind"].append(meta[0] if meta else None)
                out["meta_width"].append(meta[1] if meta else None)
                out["meta_height"].append(meta[2] if meta else None)
                try:
                    decoded = _jpeg.jpeg_decode(p)
                    if decoded is None:
                        out["decode_status"].append("not_jpeg")
                        out["n_pixels"].append(None)
                    else:
                        w, h, _planes = decoded
                        out["decode_status"].append("decoded")
                        out["n_pixels"].append(w * h)
                except (ValueError, IndexError, KeyError,
                        _struct.error):
                    out["decode_status"].append("rejected_unsupported")
                    out["n_pixels"].append(None)
            yield pd.DataFrame({
                "doc_id": pd.array(out["doc_id"], dtype="int64"),
                "meta_kind": out["meta_kind"],
                "meta_width": pd.array(out["meta_width"], dtype="Int64"),
                "meta_height": pd.array(out["meta_height"],
                                        dtype="Int64"),
                "decode_status": out["decode_status"],
                "n_pixels": pd.array(out["n_pixels"], dtype="Int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, JPEG_PROBE_SCHEMA)


def synth_mixed_codec_mp4(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          out_col: str = "payload") -> DataFrame:
    """MP4s whose sample table mixes codecs — the shape real video
    corpora have: doc_id%3==0 becomes an ISO BMFF container where EVEN
    sample indices are real baseline JPEG frames (MJPEG, decodable) and
    ODD indices are H.264 Annex-B byte streams (start codes + SPS/IDR
    NAL headers + deterministic payload bytes — undecodable here by
    documented boundary). n = 3 + id%4 samples, timescale 1000, delta
    40. Other doc_ids stay raw text. The demuxer must serve ALL frames
    at byte grain; the pixel path must decode exactly the JPEG half and
    SKIP the H.264 half without failing the task."""
    from clif_spark.multimodal import jpeg as _jpeg

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    build_mp4_samples, _ = _mp4_sample_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def h264_frame(doc_id: int, k: int) -> bytes:
            # Annex-B: start code + SPS (NAL type 7), then IDR (type 5)
            sps = b"\x00\x00\x00\x01\x67\x42\x00\x1e"
            idr = (b"\x00\x00\x00\x01\x65"
                   + bytes((doc_id * 17 + k * 5 + i * 3) % 256
                           for i in range(24 + (doc_id + k) % 16)))
            return sps + idr

        def build(doc_id: int, text: str) -> bytes:
            if doc_id % 3 == 0:
                frames = []
                for k in range(3 + doc_id % 4):
                    if k % 2 == 0:
                        frames.append(_jpeg.jpeg_encode_gray(
                            9 + (doc_id + 5 * k) % 20,
                            7 + (doc_id + 3 * k) % 14,
                            lambda x, y, k=k:
                                (3 * doc_id + 5 * k + 7 * (x // 8)
                                 + 11 * (y // 8)) % 256))
                    else:
                        frames.append(h264_frame(doc_id, k))
                return build_mp4_samples(1000, 40, frames)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


#: Real-resize contract: geometry + decoded-resample statistics per doc.
RESIZE_PIXELS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("out_width", T.LongType()),
    T.StructField("out_height", T.LongType()),
    T.StructField("n_values", T.LongType()),
    T.StructField("mean_value", T.DoubleType()),
    T.StructField("peak", T.LongType()),
])


def synth_png_payload(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      out_col: str = "payload") -> DataFrame:
    """PNG twin of synth_gif_payload for the real-resize path: even
    doc_ids become real RGB PNGs (zlib scanlines, filter rotation) with
    closed-form pixels value(x, y, c) = (doc_id + 2x + 3y + 5c) % 256
    over a (10 + id%30) × (8 + id%22) frame; odd doc_ids stay text."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    build_png, _, _ = _sample_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(doc_id: int, text: str) -> bytes:
            if doc_id % 2 == 0:
                return build_png(
                    10 + doc_id % 30, 8 + doc_id % 22,
                    lambda x, y, c: (doc_id + 2 * x + 3 * y + 5 * c) % 256)
            return (text or "").encode("utf-8")

        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(i), t)
                          for i, t in zip(pdf[id_col], pdf[text_col])],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def resize_image_pixels(df: DataFrame, max_side: int = 16,
                        id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """REAL image resize — the operation resize_image_meta only PLANNED:
    decode actual pixels through whichever codec the container declares
    (PNG zlib scanlines, GIF LZW+palette, baseline JPEG — all three real
    decoders), nearest-neighbor resample into the aspect-preserving
    ``max_side`` fit (source index = floor(dst * src_side / dst_side),
    the standard box-free NN mapping, all integer arithmetic), and reduce
    the resampled RGB channels to (n, mean, peak). The geometry formula
    is bit-identical to resize_image_meta's; the pixel transform is what
    a training preprocessing pass actually runs before feature
    extraction. Non-image payloads (and images whose decode fails) yield
    NULL stats rather than fabricated numbers. Scale shape: one streaming
    Arrow batch per task; per-image work is bounded by max_side^2."""
    from clif_spark.multimodal.jpeg import jpeg_rgb_values

    _, png_values, _ = _sample_codecs()
    _, _, _, _, gif_values = _gif_codecs()
    _, _, header = _media_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def one(payload: bytes):
            meta = header(payload)
            if meta is None:
                return (None,) * 7
            fmt, w, h = meta
            vals = (png_values(payload) if fmt == "png"
                    else gif_values(payload) if fmt == "gif"
                    else jpeg_rgb_values(payload) if fmt == "jpeg"
                    else None)
            if vals is None or len(vals) != w * h * 3:
                return (None,) * 7
            long_side = max(w, h)
            if long_side <= max_side:
                rw, rh = w, h
            elif w >= h:
                rw, rh = max_side, (h * max_side) // w
            else:
                rw, rh = (w * max_side) // h, max_side
            rw, rh = max(rw, 1), max(rh, 1)
            s = peak = n = 0
            for y2 in range(rh):
                sy = y2 * h // rh
                row = sy * w
                for x2 in range(rw):
                    base = (row + x2 * w // rw) * 3
                    for c in range(3):
                        v = vals[base + c]
                        s += v
                        if v > peak:
                            peak = v
                        n += 1
            return (w, h, rw, rh, n, s / n, peak)

        for pdf in batches:
            rows = [one(b if b is not None else b"")
                    for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "width": pd.array([r[0] for r in rows], dtype="Int64"),
                "height": pd.array([r[1] for r in rows], dtype="Int64"),
                "out_width": pd.array([r[2] for r in rows], dtype="Int64"),
                "out_height": pd.array([r[3] for r in rows],
                                       dtype="Int64"),
                "n_values": pd.array([r[4] for r in rows], dtype="Int64"),
                "mean_value": pd.array([r[5] for r in rows],
                                       dtype="float64"),
                "peak": pd.array([r[6] for r in rows], dtype="Int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, RESIZE_PIXELS_SCHEMA)


#: Image dHash contract: 64-bit difference hash as 4×16-bit chunks
#: (dedup.SIMHASH_CHUNKS layout, so dedup.hamming_pairs_from_chunks
#: pairs them directly). NULL chunks = not an image / decode failed.
IMAGE_DHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("c0", T.LongType()),
    T.StructField("c1", T.LongType()),
    T.StructField("c2", T.LongType()),
    T.StructField("c3", T.LongType()),
])


def synth_scaled_png_payload(spec: DataFrame, id_col: str = "doc_id",
                             src_col: str = "src_id",
                             scale_col: str = "scale",
                             bump_col: str | None = None,
                             out_col: str = "payload") -> DataFrame:
    """PNG corpus for the image-dedup fixture: each spec row
    (doc_id, src_id, scale) becomes a real RGB PNG (zlib scanlines,
    filter rotation — the _sample_codecs builder) of a closed-form
    SOURCE image nearest-neighbor UPSCALED by the integer ``scale``:

        val(x, y, c) = (ka*(sx + 2*sy + 3) + kb*(sx*sy + 7)
                        + 3*sx² + 5*sy² + 5*c) % 256,
        sx = x // scale, sy = y // scale,
        ka = src_id % 251, kb = src_id % 241,
        frame = (12 + src_id % 9) × (10 + src_id % 7), times scale.

    Two rows sharing src_id are the SAME image at different
    resolutions — by the floor identity (2a div b) div 2 = a div b,
    an NN downsample of the scaled copy lands on identical source
    pixels, so its dHash equals the original's exactly (the planted
    near-dup pair the image-dedup gate recovers). The quadratic +
    dual-modulus form keeps per-doc gradient signs pseudo-random
    (distinct docs never pair; prototyped: 6k docs, zero false
    pairs, max band bucket 9) with every SQL intermediate < 2^17.

    ``bump_col`` (optional): an additive PERTURBATION applied to the
    source pixel the 9×8 dHash grid samples at cell (3, 4) — i.e.
    sx = 3*w0//9, sy = 4*h0//8 of the UNSCALED frame — val' =
    (val + bump) % 256 on all three channels. A bumped row is the
    near-miss copy (at most 2 gradient bits can flip: the two
    comparisons adjacent to the cell), exercising nonzero-Hamming
    pairing with an exactly-recomputable distance."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    build_png, _, _ = _sample_codecs()
    cols = [id_col, src_col, scale_col] + ([bump_col] if bump_col else [])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(src: int, scale: int, bump: int) -> bytes:
            ka, kb = src % 251, src % 241
            w0, h0 = 12 + src % 9, 10 + src % 7
            px, py = 3 * w0 // 9, 4 * h0 // 8

            def val(x: int, y: int, c: int) -> int:
                sx, sy = x // scale, y // scale
                v = (ka * (sx + 2 * sy + 3) + kb * (sx * sy + 7)
                     + 3 * sx * sx + 5 * sy * sy + 5 * c)
                if bump and sx == px and sy == py:
                    v += bump
                return v % 256

            return build_png(w0 * scale, h0 * scale, val)

        for pdf in batches:
            bumps = (pdf[bump_col] if bump_col
                     else [0] * len(pdf[id_col]))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(s), int(k), int(b))
                          for s, k, b in zip(pdf[src_col],
                                             pdf[scale_col], bumps)],
            })

    return spec.select(*cols).mapInPandas(run, schema)


def image_dhash(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """64-bit DIFFERENCE HASH (dHash) per image — the perceptual
    fingerprint that makes near-duplicate IMAGES visible to the dedup
    stack: decode real pixels through whichever codec the container
    declares (PNG zlib scanlines, GIF LZW+palette, baseline JPEG — the
    resize_image_pixels dispatch), integer grayscale (r+g+b)//3,
    nearest-neighbor downsample to a 9×8 luminance grid (source index
    = dst * src_side // dst_side, the shared NN mapping), one
    horizontal gradient bit per adjacent cell pair (right strictly >
    left), packed LSB-first: bit i = row(i//8) col(i%8), chunk m =
    bits [16m, 16m+16) — 4×16-bit chunks so the SimHash banding
    machinery (dedup.hamming_pairs_from_chunks) pairs image
    signatures unchanged. All arithmetic integer-exact: a re-encode
    or exact NN rescale of the same image hashes IDENTICALLY, and the
    whole decode→hash pipeline is oracle-recomputable from closed-form
    pixel fixtures. Non-image payloads (and failed decodes) yield
    NULL chunks rather than fabricated bits. Scale shape: one
    streaming Arrow batch per task, per-image work bounded by the
    decode + 72 sampled cells; the output is one 4-long row per image
    — band-joinable at any corpus size."""
    from clif_spark.multimodal.jpeg import jpeg_rgb_values

    _, png_values, _ = _sample_codecs()
    _, _, _, _, gif_values = _gif_codecs()
    _, _, header = _media_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def one(payload: bytes):
            meta = header(payload)
            if meta is None:
                return (None,) * 4
            fmt, w, h = meta
            vals = (png_values(payload) if fmt == "png"
                    else gif_values(payload) if fmt == "gif"
                    else jpeg_rgb_values(payload) if fmt == "jpeg"
                    else None)
            if vals is None or len(vals) != w * h * 3:
                return (None,) * 4
            gray = []
            for cy in range(8):
                sy = cy * h // 8
                for cx in range(9):
                    base = (sy * w + cx * w // 9) * 3
                    gray.append(
                        (vals[base] + vals[base + 1] + vals[base + 2])
                        // 3)
            bits = 0
            for cy in range(8):
                row = cy * 9
                for cx in range(8):
                    if gray[row + cx + 1] > gray[row + cx]:
                        bits |= 1 << (cy * 8 + cx)
            return tuple((bits >> (16 * m)) & 0xFFFF for m in range(4))

        for pdf in batches:
            rows = [one(b if b is not None else b"")
                    for b in pdf[payload_col]]
            out = {"doc_id": pdf[id_col].astype("int64")}
            for m in range(4):
                out[f"c{m}"] = pd.array([r[m] for r in rows],
                                        dtype="Int64")
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, IMAGE_DHASH_SCHEMA)


def synth_scaled_wav_payload(spec: DataFrame, id_col: str = "doc_id",
                             src_col: str = "src_id",
                             scale_col: str = "scale",
                             bump_col: str | None = None,
                             out_col: str = "payload") -> DataFrame:
    """WAV corpus for the audio-dedup fixture — the audio twin of
    synth_scaled_png_payload: each spec row (doc_id, src_id, scale)
    becomes a real 16-bit PCM RIFF/WAVE of a closed-form SOURCE clip
    frame-repeat UPSAMPLED by the integer ``scale``:

        v(f, c) = ((ka * ((7·sf² + 3·sf + 11) % 1021)
                    + kb * ((5·sf² + 13·sf + 7) % 1019) + 5·c
                    [+ bump if sf = pb]) % 2048) - 1024,
        sf = f // scale,
        ka = src % 251, kb = src % 241,
        nf0 = 100 + src % 50 frames × ch = 1 + src % 2 channels,
        sample_rate = 8000 * scale (so duration is scale-invariant).

    Two rows sharing src_id are the SAME clip at different sample
    rates — by the floor identity (2a div b) div 2 = a div b, the
    audio_dhash NN frame sampling of the upsampled copy lands on
    identical source frames, so its fingerprint equals the
    original's exactly (the planted near-dup the audio-dedup gate
    recovers). Both coefficients multiply LARGE quadratic-mod bases
    (values pseudo-random in [0, ~1020), never small or smooth), so
    a ±1 change in either coefficient re-crosses many mod-2048
    boundaries and the gradient signs avalanche — a plain ka*(sf+3)
    linear basis measurably false-pairs at 50k docs (10,354 banded
    Hamming<=4 collisions, dominated by same-kb/nf0/ch docs with
    nearby ka); this form scans CLEAN at 50k docs (zero banded false
    pairs over 359k candidates, max bucket 49) and near-clean at
    500k (168 over 33.8M candidates — 5e-6, the honest birthday
    floor of a 64-bit perceptual hash; gate SFs are <= 500 docs).

    ``bump_col``: additive perturbation applied (pre-modulus, all
    channels) to the one SOURCE frame the 65-point dHash grid samples
    at index 32 — pb = 32*nf0 // 65 — so at most the 2 adjacent
    gradient bits flip: the touched-up near-miss copy at an
    exactly-recomputable Hamming in {0, 1, 2}."""
    import struct

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    build_wav, _, _ = _media_builders()
    cols = [id_col, src_col, scale_col] + ([bump_col] if bump_col else [])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(src: int, scale: int, bump: int) -> bytes:
            ka, kb = src % 251, src % 241
            nf0, ch = 100 + src % 50, 1 + src % 2
            pb = 32 * nf0 // 65
            nf = nf0 * scale
            vals = []
            for f in range(nf):
                sf = f // scale
                for c in range(ch):
                    v = (ka * ((7 * sf * sf + 3 * sf + 11) % 1021)
                         + kb * ((5 * sf * sf + 13 * sf + 7) % 1019)
                         + 5 * c + (bump if sf == pb else 0))
                    vals.append(v % 2048 - 1024)
            data = struct.pack(f"<{len(vals)}h", *vals)
            return build_wav(8000 * scale, ch, nf, data)

        for pdf in batches:
            bumps = (pdf[bump_col] if bump_col
                     else [0] * len(pdf[id_col]))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                out_col: [build(int(s), int(k), int(b))
                          for s, k, b in zip(pdf[src_col],
                                             pdf[scale_col], bumps)],
            })

    return spec.select(*cols).mapInPandas(run, schema)


def audio_dhash(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """64-bit difference fingerprint per AUDIO clip — the perceptual
    hash that makes near-duplicate audio visible to the dedup stack,
    completing the modality symmetry with image_dhash: decode real
    16-bit PCM frames (RIFF walk + struct unpack — the
    resample_audio_pcm codec), sum channels per frame (integer, no
    division — stereo and mono of the same content stay comparable
    only to themselves; the hash is channel-layout-aware by design),
    nearest-neighbor sample 65 frame positions (source index
    = i * n_frames // 65, the shared NN mapping — an exact
    frame-repeat upsample of the same clip fingerprints IDENTICALLY
    by the floor identity), one temporal gradient bit per adjacent
    sampled pair (right strictly >), packed LSB-first into 4×16-bit
    chunks so dedup.hamming_pairs_from_chunks pairs audio signatures
    unchanged. All arithmetic integer-exact and oracle-recomputable
    from closed-form PCM fixtures. Non-WAV payloads (and failed or
    empty decodes) yield NULL chunks rather than fabricated bits.
    Scale shape: one streaming Arrow batch per task, per-clip work
    bounded by the PCM decode + 65 sampled frames; output is one
    4-long row per clip — band-joinable at any corpus size."""
    wav_meta, _, _ = _media_codecs()
    _, _, wav_values = _sample_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def one(payload: bytes):
            meta = wav_meta(payload)
            if meta is None:
                return (None,) * 4
            ch = meta[1]
            vals = wav_values(payload)
            if not vals or not ch or len(vals) % ch:
                return (None,) * 4
            nf = len(vals) // ch
            s = [sum(vals[f * ch:(f + 1) * ch])
                 for f in (i * nf // 65 for i in range(65))]
            bits = 0
            for i in range(64):
                if s[i + 1] > s[i]:
                    bits |= 1 << i
            return tuple((bits >> (16 * m)) & 0xFFFF for m in range(4))

        for pdf in batches:
            rows = [one(b if b is not None else b"")
                    for b in pdf[payload_col]]
            out = {"doc_id": pdf[id_col].astype("int64")}
            for m in range(4):
                out[f"c{m}"] = pd.array([r[m] for r in rows],
                                        dtype="Int64")
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, IMAGE_DHASH_SCHEMA)


def synth_scaled_mjpeg_payload(spec: DataFrame, id_col: str = "doc_id",
                               src_col: str = "src_id",
                               scale_col: str = "scale",
                               bump_col: str | None = None,
                               out_col: str = "payload") -> DataFrame:
    """MJPEG-in-MP4 corpus for the video-dedup fixture — the video
    leg of the synth_scaled_{png,wav}_payload family: each spec row
    becomes a real ISO BMFF container (build_mp4_samples — actual
    stsz/stsc/stco/stts tables) whose samples are real baseline JPEG
    frames, frame-repeat UPSAMPLED by the integer ``scale`` (each
    source frame appears ``scale`` times — the frame-rate-doubled
    re-encode a crawl yields):

        frame value v(sf) = ((ka * ((7·sf² + 3·sf + 11) % 1021)
                              + kb * ((5·sf² + 13·sf + 7) % 1019)
                              [+ bump if sf = pb]) % 256),
        sf = k // scale,  ka = src % 251, kb = src % 241,
        n0 = 64 + src % 32 source frames, timescale 1000·scale.

    Frames are 8×8 CONSTANT-luma JPEGs (all-ones quant tables — the
    DC-only regime where decode is bit-exact, the same exactness
    contract mm_video_pixel_stats gates), so the decoded frame mean
    IS the closed form. The quadratic-mod bases carry the same
    avalanche rationale as the audio fixture (a 50k-doc banded scan
    shows 3 false pairs / 377k candidates — the mod-256 birthday
    floor; gate SFs are <= 500 docs). Constant frames are memoized
    per (value, restart-free) — encode cost is <= 256 JPEGs per
    worker, container assembly dominates.

    ``bump_col``: additive perturbation (pre-modulus) on the one
    SOURCE frame the 65-point grid samples at index 32 — pb =
    32·n0 // 65 — at most the 2 adjacent temporal gradient bits
    flip: Hamming in {0, 1, 2}, exactly recomputable."""
    from clif_spark.multimodal import jpeg as _jpeg

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField(out_col, T.BinaryType()),
    ])
    build_mp4_samples, _ = _mp4_sample_codecs()
    cols = [id_col, src_col, scale_col] + ([bump_col] if bump_col else [])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        frame_cache: dict = {}

        def frame_of(val: int) -> bytes:
            got = frame_cache.get(val)
            if got is None:
                got = _jpeg.jpeg_encode_gray(8, 8, lambda x, y: val)
                frame_cache[val] = got
            return got

        def build(src: int, scale: int, bump: int) -> bytes:
            ka, kb = src % 251, src % 241
            n0 = 64 + src % 32
            pb = 32 * n0 // 65
            frames = []
            for k in range(n0 * scale):
                sf = k // scale
                v = (ka * ((7 * sf * sf + 3 * sf + 11) % 1021)
                     + kb * ((5 * sf * sf + 13 * sf + 7) % 1019)
                     + (bump if sf == pb else 0)) % 256
                frames.append(frame_of(v))
            return build_mp4_samples(1000 * scale, 40, frames)

        # Containers run ~25-30 KB (64-192 frames + sample tables) —
        # 3 orders of magnitude over the module's other payloads — so
        # a records-count Arrow batch (65536 default) is a multi-GB
        # buffer at warehouse partition sizes (measured: Arrow
        # OutOfMemoryException at sf10, ~12k-row input batches).
        # Yield BYTE-bounded output slices instead: each yielded
        # frame becomes its own Arrow batch, bounding both this
        # stage's output buffer and the fused consumer's input.
        budget = 32 << 20
        for pdf in batches:
            bumps = (pdf[bump_col] if bump_col
                     else [0] * len(pdf[id_col]))
            ids, payloads, nbytes = [], [], 0
            for d, s, k, b in zip(pdf[id_col], pdf[src_col],
                                  pdf[scale_col], bumps):
                p = build(int(s), int(k), int(b))
                ids.append(int(d))
                payloads.append(p)
                nbytes += len(p)
                if nbytes >= budget:
                    yield pd.DataFrame({"doc_id": pd.array(
                        ids, dtype="int64"), out_col: payloads})
                    ids, payloads, nbytes = [], [], 0
            if ids:
                yield pd.DataFrame({"doc_id": pd.array(
                    ids, dtype="int64"), out_col: payloads})

    return spec.select(*cols).mapInPandas(run, schema)


def video_dhash(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """64-bit TEMPORAL difference fingerprint per VIDEO — the third
    modality joins the dedup stack (image: spatial dHash; audio: PCM
    gradient; video: luma-over-time gradient), through the engine's
    real container + codec boundary: walk the MP4 sample table
    (mp4_extract_samples — stsz/stsc/stco/stts expansion),
    nearest-neighbor sample 65 frame positions (source index
    = i * n_samples // 65, the shared NN mapping — an exact
    frame-repeat upsample of the same video fingerprints IDENTICALLY
    by the floor identity), decode each sampled frame as baseline
    JPEG (MJPEG — the one video codec the engine honestly decodes),
    reduce to its integer mean luma (sum // n — for the DC-only
    bit-exact regime this IS the closed-form frame value), one
    temporal gradient bit per adjacent sampled pair (right strictly
    >), packed LSB-first into 4×16-bit chunks for the shared
    dedup.hamming_pairs_from_chunks banding. Honest-boundary rules:
    non-MP4 payloads, empty sample tables, and videos where ANY
    sampled frame fails JPEG decode yield NULL chunks — a
    fabricated frame mean would hash plausible garbage (H.264
    payloads stay opaque, same stance as mm_video_h264_skip).
    Sampled-frame decodes are memoized by frame BYTES within the
    Arrow batch (identical sample -> identical mean; bounded cap),
    so repeat-heavy containers decode each distinct frame once.
    Scale shape: one streaming Arrow batch per task, per-video work
    bounded by demux + <= 65 frame decodes; output one 4-long row
    per video — band-joinable at any corpus size."""
    import struct as _struct

    from clif_spark.multimodal import jpeg as _jpeg

    _, mp4_extract_samples = _mp4_sample_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        mean_cache: dict = {}

        def frame_mean(frame: bytes):
            if frame in mean_cache:
                return mean_cache[frame]
            try:
                decoded = _jpeg.jpeg_decode(frame)
            except (ValueError, IndexError, KeyError, StopIteration,
                    _struct.error):
                decoded = None
            # The planes access stays under the honest-boundary rule
            # too: a decode that returns an EMPTY planes list must yield
            # NULL chunks, not an uncaught IndexError that fails the
            # task (ADVICE r17).
            if decoded is None or not decoded[2]:
                m = None
            else:
                luma = decoded[2][0]
                m = sum(luma) // len(luma) if luma else None
            if len(frame) <= 4096 and len(mean_cache) < 4096:
                mean_cache[frame] = m
            return m

        def one(payload: bytes):
            got = mp4_extract_samples(payload)
            if got is None or not got[1]:
                return (None,) * 4
            samples = got[1]
            n = len(samples)
            means = []
            for i in range(65):
                m = frame_mean(bytes(samples[i * n // 65][0]))
                if m is None:
                    return (None,) * 4
                means.append(m)
            bits = 0
            for i in range(64):
                if means[i + 1] > means[i]:
                    bits |= 1 << i
            return tuple((bits >> (16 * m)) & 0xFFFF for m in range(4))

        for pdf in batches:
            rows = [one(b if b is not None else b"")
                    for b in pdf[payload_col]]
            out = {"doc_id": pdf[id_col].astype("int64")}
            for m in range(4):
                out[f"c{m}"] = pd.array([r[m] for r in rows],
                                        dtype="Int64")
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, IMAGE_DHASH_SCHEMA)


#: Audio decimation contract: geometry + decimated-sample statistics.
AUDIO_RESAMPLE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate_in", T.LongType()),
    T.StructField("sample_rate_out", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("n_frames_out", T.LongType()),
    T.StructField("n_values", T.LongType()),
    T.StructField("mean_value", T.DoubleType()),
    T.StructField("peak", T.LongType()),
])


def resample_audio_pcm(df: DataFrame, stride: int = 3,
                       id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL audio resample (integer decimation): decode actual 16-bit PCM
    frames, keep every ``stride``-th FRAME (all channels of it — frame
    grain, not flat sample grain, or stereo would desync), and reduce the
    decimated samples — the audio analog of resize_image_pixels, and the
    rate-normalization step an audio training pipeline runs before
    feature extraction. Plain decimation (no anti-alias filter) is the
    deliberate scope: it is exactly reproducible in integer arithmetic
    and therefore oracle-checkable; a production low-pass would be a
    float kernel with engine-specific rounding. Non-WAV payloads yield
    NULL stats. Scale shape: streaming Arrow batches, per-doc work
    linear in kept samples, nothing driver-side."""
    _, _, wav_values = _sample_codecs()
    wav_meta, _, _ = _media_codecs()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def one(payload: bytes):
            vals = wav_values(payload)
            meta = wav_meta(payload)
            if vals is None or meta is None:
                return (None,) * 7
            sr, ch, _ = meta
            ch = max(ch or 1, 1)
            nf = len(vals) // ch
            s = peak = n = 0
            for f in range(0, nf, stride):
                base = f * ch
                for c in range(ch):
                    v = vals[base + c]
                    s += v
                    a = v if v >= 0 else -v
                    if a > peak:
                        peak = a
                    n += 1
            if n == 0:
                return (sr, sr // stride, ch, 0, 0, None, None)
            return (sr, sr // stride, ch, (nf + stride - 1) // stride,
                    n, s / n, peak)

        for pdf in batches:
            rows = [one(b if b is not None else b"")
                    for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "sample_rate_in": pd.array([r[0] for r in rows],
                                           dtype="Int64"),
                "sample_rate_out": pd.array([r[1] for r in rows],
                                            dtype="Int64"),
                "channels": pd.array([r[2] for r in rows], dtype="Int64"),
                "n_frames_out": pd.array([r[3] for r in rows],
                                         dtype="Int64"),
                "n_values": pd.array([r[4] for r in rows], dtype="Int64"),
                "mean_value": pd.array([r[5] for r in rows],
                                       dtype="float64"),
                "peak": pd.array([r[6] for r in rows], dtype="Int64"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, AUDIO_RESAMPLE_SCHEMA)
