"""Multimodal plumbing: the decode stub and its DuckDB oracle must agree
byte-for-byte even on non-ASCII text, where the first UTF-8 byte of the
payload differs from the first codepoint (the trap ADVICE r3 flagged)."""

from __future__ import annotations

import duckdb

from clif_spark import multimodal
from clif_spark.queries import collect_registry


def _oracle_rows(sql: str, docs: list[tuple[int, str]]):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    try:
        return sorted(tuple(r) for r in con.execute(sql).fetchall())
    finally:
        con.close()


# 'Ω' leads with UTF-8 byte 0xCE (206): codepoint math would give 937-based
# width/height and 'jpeg'/'png' flipped. '' exercises the empty-payload guard.
DOCS = [(1, "Ωmega leads non-ascii"), (2, "plain ascii"), (3, ""),
        (4, "éclair")]


def test_decode_meta_stub_matches_oracle_on_non_ascii(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = multimodal.decode_image_meta(multimodal.attach_binary_payload(df))
    got = sorted(tuple(r) for r in out.collect())
    want = _oracle_rows(collect_registry()["mm_decode_meta"].oracle, DOCS)
    assert got == want
    # spot-pin the byte semantics: Ω → 0xCE=206 (even → png, height 207)
    row = {r[0]: r for r in got}[1]
    assert row[2] == "png" and row[4] == 206 % 480 + 1


def test_resize_meta_stub_matches_oracle_on_non_ascii(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = multimodal.resize_image_meta(multimodal.attach_binary_payload(df))
    got = sorted(tuple(r) for r in out.collect())
    want = _oracle_rows(collect_registry()["mm_resize_meta"].oracle, DOCS)
    assert got == want


def _make_png(w: int, h: int) -> bytes:
    """A real, spec-valid PNG built with stdlib only (zlib + byte packing):
    signature, IHDR, one scanline-filtered IDAT, IEND — openable by any
    viewer, no imaging library involved."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _make_jpeg(w: int, h: int) -> bytes:
    """Minimal JPEG marker stream: SOI, an APP0 the parser must skip, then
    SOF0 carrying the dimensions (big-endian height-then-width)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_decode_meta_parses_real_image_headers(spark):
    import pandas as pd

    payloads = [
        (1, _make_png(640, 360), "png", 640, 360),
        (2, _make_jpeg(123, 45), "jpeg", 123, 45),
        (3, b"GIF89a" + (320).to_bytes(2, "little")
            + (200).to_bytes(2, "little") + b"\x00" * 3, "gif", 320, 200),
        (4, b"not an image at all", None, None, None),  # falls to the stub
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, *_ in payloads], ["doc_id", "payload"])
    out = {r.doc_id: r for r in multimodal.decode_image_meta(df).collect()}
    for i, p, fmt, w, h in payloads:
        assert out[i].n_bytes == len(p)
        if fmt is not None:
            assert (out[i].format, out[i].width, out[i].height) == (fmt, w, h)
        else:  # stub fallback keeps the oracle-checkable formula
            assert (out[i].width, out[i].height) == (
                len(p) % 640 + 1, p[0] % 480 + 1)


def test_wav_decode_matches_stdlib_wave_writer(tmp_path):
    """The RIFF parser must agree with a CANONICAL writer, not just our own
    builder: write a WAV with the stdlib ``wave`` module and parse it."""
    import wave

    path = tmp_path / "t.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(b"\x00\x00" * 2 * 44100)  # 2 s of stereo silence
    parsed = multimodal._wav_decode(path.read_bytes())
    assert parsed == (22050, 2, 44100 * 1000 // 22050)  # exactly 2000 ms
    # our own builder agrees with the canonical writer's layout
    ours = multimodal.build_wav_bytes(22050, 2, 44100)
    assert multimodal._wav_decode(ours) == parsed


def test_mp4_decode_box_walk_and_v1_mvhd():
    p = multimodal.build_mp4_bytes(600, 3615, [48, 112, 176])
    assert multimodal._mp4_decode(p) == (3615 * 1000 // 600, 3, 48)

    # version-1 mvhd (64-bit times): timescale u32 at body+20, duration
    # u64 at body+24 — built by hand since the builder emits v0
    import struct

    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    mvhd_v1 = box(b"mvhd", b"\x01" + bytes(3) + bytes(16)
                  + struct.pack(">I", 1000) + struct.pack(">Q", 7250)
                  + bytes(80))
    p1 = box(b"ftyp", b"isom") + box(b"moov", mvhd_v1)
    assert multimodal._mp4_decode(p1) == (7250, None, None)

    assert multimodal._mp4_decode(b"not a box tree") is None
    assert multimodal._wav_decode(b"RIFF\x00\x00\x00\x00JUNK") is None


def test_media_meta_query_round_trip(spark):
    """synth (struct.pack builders) -> decode (byte-walk parsers) across a
    real Spark mapInPandas pipeline; parsed values must equal the
    generator's closed forms for every container kind."""
    df = spark.createDataFrame(
        [(i, f"document {i}") for i in range(8)], ["doc_id", "text"])
    out = {r.doc_id: r for r in multimodal.decode_media_meta(
        multimodal.synth_media_payload(df)).collect()}
    assert len(out) == 8
    for i in range(8):
        r = out[i]
        kind = i % 4
        if kind == 0:
            sr = 8000 + (i % 5) * 4000
            assert (r.container, r.sample_rate, r.channels) == (
                "wav", sr, 1 + (i // 4) % 2)
            assert r.duration_ms == (100 + i % 50) * 1000 // sr
            assert r.width is None and r.n_frames is None
        elif kind == 1:
            ts = 600 * (1 + i % 3)
            dur = (10 + i % 20) * ts + (i % 600)
            assert (r.container, r.duration_ms) == ("mp4", dur * 1000 // ts)
            assert (r.n_frames, r.first_frame_offset) == (3 + i % 5, 40 + (i % 7) * 16)
            assert r.sample_rate is None
        elif kind == 2:
            assert (r.container, r.width, r.height) == ("png", 16 + i % 100, 16 + i % 80)
            assert r.duration_ms is None
        else:
            assert r.container == "unknown"
            assert all(v is None for v in
                       (r.sample_rate, r.channels, r.duration_ms, r.width,
                        r.height, r.n_frames, r.first_frame_offset))


def test_gif_ascii_prefix_text_takes_stub_path(spark):
    """'GIF87a' is plain ASCII, so a text document can legitimately start
    with it; such a payload must take the stub path (matching the oracle
    formula), while a real GIF — whose body never survives a full UTF-8
    decode — still header-decodes."""
    text = b"GIF87a is one of two versions of the GIF standard."
    assert text.decode("utf-8")  # precondition: genuinely text
    real_gif = (b"GIF87a" + (64).to_bytes(2, "little")
                + (48).to_bytes(2, "little") + b"\x91\xff\x00")
    df = spark.createDataFrame(
        [(1, text), (2, real_gif)], ["doc_id", "payload"])
    out = {r.doc_id: r for r in multimodal.decode_image_meta(df).collect()}
    assert out[1].format in ("png", "jpeg")  # stub, not "gif"
    assert (out[1].width, out[1].height) == (
        len(text) % 640 + 1, text[0] % 480 + 1)
    assert (out[2].format, out[2].width, out[2].height) == ("gif", 64, 48)
    # module-level helper agrees with the closure copy
    assert multimodal._header_decode(text) is None
    assert multimodal._header_decode(real_gif) == ("gif", 64, 48)


def test_png_pixel_roundtrip_exercises_all_five_filters():
    """build_png_rich filters scanline y with y%5, so a 10-row image passes
    every spec filter (None/Sub/Up/Average/Paeth) through the encoder and
    the decoder must reverse each exactly."""
    pattern = lambda x, y, c: (3 * x + 5 * y + 11 * c + 7) % 256
    png = multimodal.build_png_rich(13, 10, pattern)
    vals = multimodal.png_pixel_values(png)
    expect = [pattern(x, y, c) % 256
              for y in range(10) for x in range(13) for c in range(3)]
    assert vals == expect


def test_wav_pcm_decode_matches_stdlib_wave_reader():
    """The PCM parser is cross-checked against a file written by the
    stdlib ``wave`` module — an independent writer, not our own builder."""
    import io as _io
    import struct
    import wave

    samples = [((k * 37) % 2000) - 1000 for k in range(300)]
    buf = _io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"".join(struct.pack("<h", v) for v in samples))
    assert multimodal.wav_pcm_values(buf.getvalue()) == samples


def test_sample_codecs_reject_malformed_payloads():
    assert multimodal.png_pixel_values(b"not a png") is None
    assert multimodal.wav_pcm_values(b"RIFFxxxxWAVE") is None
    # truncated IDAT: inflate fails -> None, not garbage stats
    png = multimodal.build_png_rich(8, 8, lambda x, y, c: x + y)
    assert multimodal.png_pixel_values(png[:40] + png[60:]) is None
    # float/compressed WAV (format tag != 1) refuses sample decode
    import struct
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + bytes(4))
    assert multimodal.wav_pcm_values(
        b"RIFF" + struct.pack("<I", len(body)) + body) is None


def test_media_sample_features_end_to_end(spark):
    """Patterned synth -> real decode -> stats, checked against directly
    computed expectations for one wav doc and one png doc."""
    import math

    df = spark.createDataFrame([(4, "x"), (6, "y"), (5, "z")],
                               ["doc_id", "text"])
    payload = multimodal.synth_rich_media_payload(df)
    out = {r.doc_id: r for r in
           multimodal.media_sample_features(payload).collect()}
    # doc 4: wav, STEREO (ch = 1 + (4//4)%2 = 2), nv = 104*2 = 208
    vals = [((4 * 31 + k * 7) % 2048) - 1024 for k in range(208)]
    assert out[4].kind == "wav_pcm" and out[4].n_values == 208
    assert out[4].mean_value == sum(vals) / 208
    assert out[4].rms == math.sqrt(sum(v * v for v in vals) / 208)
    assert out[4].peak == max(abs(v) for v in vals)
    # doc 6: png 22x22 RGB
    pvals = [(6 + x + y + c) % 256
             for y in range(22) for x in range(22) for c in range(3)]
    assert out[6].kind == "png_pixels" and out[6].n_values == len(pvals)
    assert out[6].mean_value == sum(pvals) / len(pvals)
    assert out[6].peak == max(pvals)
    # doc 5: mp4 -> no sample decode, NULL stats
    assert out[5].kind == "other" and out[5].n_values is None


def test_truncated_v1_mvhd_returns_none_not_garbage():
    """A version-1 mvhd cut off before its 64-bit duration must yield no
    metadata (None) rather than a partial big-endian read."""
    import struct

    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # v1 mvhd body: version=1 + flags, then 64-bit ctimes... truncate at
    # body+26 — past the v0 guard (body+20) but inside the v1 duration.
    v1_body = bytes([1, 0, 0, 0]) + bytes(22)
    bad = ftyp + box(b"moov", box(b"mvhd", v1_body))
    assert multimodal._mp4_decode(bad) is None
    # an intact v1 mvhd still parses
    good_body = (bytes([1, 0, 0, 0]) + bytes(16)
                 + struct.pack(">I", 600) + struct.pack(">Q", 3000))
    good = ftyp + box(b"moov", box(b"mvhd", good_body))
    assert multimodal._mp4_decode(good) == (5000, None, None)


def test_gif_lzw_roundtrip_shapes():
    """Encoder↔decoder roundtrip across code sizes and stream shapes:
    empty, single symbol, long run (KwKwK self-reference case), cycling
    pattern (dictionary growth through several width bumps), and a long
    pseudo-random stream that fills the 12-bit table and exercises the
    deferred-clear regime on both sides."""
    import random

    rng = random.Random(7)
    for mcs in (2, 4, 6, 8):
        n_sym = 1 << mcs
        for case in ([], [0], [1] * 500,
                     [i % n_sym for i in range(5000)],
                     [rng.randrange(n_sym) for _ in range(20000)]):
            packed = multimodal.gif_lzw_compress(case, mcs)
            assert multimodal.gif_lzw_decompress(packed, mcs) == case


def test_gif_container_roundtrip_matches_closed_form():
    """build_gif_rich → gif_pixel_values recovers exactly the closed-form
    palette-mapped channel values the mm_gif_pixel_stats oracle states,
    including a frame large enough (38×26) for real LZW width growth."""
    pal = multimodal.gif_palette(64)
    for d in (0, 2, 44, 128, 498):
        w, h = 10 + d % 30, 8 + d % 20
        payload = multimodal.build_gif_rich(
            w, h, lambda x, y, d=d: (d + 3 * x + 5 * y) % 64)
        want = [c for y in range(h) for x in range(w)
                for c in pal[(d + 3 * x + 5 * y) % 64]]
        assert multimodal.gif_pixel_values(payload) == want


def test_gif_pixel_decode_rejects_malformed():
    """Non-GIF, truncated-LZW, interlaced, and wrong-pixel-count payloads
    must all yield None — never partial pixels."""
    good = multimodal.build_gif_rich(12, 9, lambda x, y: (x + y) % 64)
    assert multimodal.gif_pixel_values(b"not a gif") is None
    assert multimodal.gif_pixel_values(good[:40]) is None
    # flip the interlace bit in the image descriptor's packed byte (the
    # descriptor sits right after header+LSD (13) + 64-entry GCT; a byte
    # SEARCH for 0x2C would false-hit palette bytes)
    idesc = 13 + 64 * 3
    assert good[idesc] == 0x2C
    interlaced = good[:idesc + 9] + bytes([good[idesc + 9] | 0x40]) \
        + good[idesc + 10:]
    assert multimodal.gif_pixel_values(interlaced) is None
    # truncate the LZW data stream mid-sub-block (no EOI reachable)
    assert multimodal.gif_pixel_values(good[:-12]) is None
    # decode skips a 0x21 extension block before the image descriptor
    ext = good[:13 + 64 * 3] + b"\x21\xF9\x04\x00\x00\x00\x00\x00" \
        + good[13 + 64 * 3:]
    pal = multimodal.gif_palette(64)
    want = [c for y in range(9) for x in range(12)
            for c in pal[(x + y) % 64]]
    assert multimodal.gif_pixel_values(ext) == want


def test_gif_rejects_hostile_min_code_size():
    """A payload-controlled LZW min-code-size byte outside GIF's 2..11
    range (12-bit code cap) must yield None — not build a 2^mcs base
    table (a crafted 0xFF would otherwise attempt a 2^255-entry dict).
    Also: an LZW stream longer than the declared frame must abort at
    the w*h bound, not decode unboundedly."""
    good = multimodal.build_gif_rich(12, 9, lambda x, y: (x + y) % 64)
    idesc = 13 + 64 * 3
    mcs_at = idesc + 10
    assert good[mcs_at] == 6  # precondition: this IS the mcs byte
    for bad_mcs in (0, 1, 12, 0x80, 0xFF):
        crafted = good[:mcs_at] + bytes([bad_mcs]) + good[mcs_at + 1:]
        assert multimodal.gif_pixel_values(crafted) is None
    # oversized stream: declare a 1x1 frame, keep the 12x9 LZW data
    shrunk = (good[:idesc + 5] + (1).to_bytes(2, "little")
              + (1).to_bytes(2, "little") + good[idesc + 9:])
    assert multimodal.gif_pixel_values(shrunk) is None
