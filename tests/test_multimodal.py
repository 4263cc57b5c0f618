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


# ---------------------------------------------------------------------------
# Baseline JPEG codec (multimodal/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_block_constant_roundtrip_is_exact():
    """The oracle-gated exactness contract: block-constant content under
    all-ones quant tables decodes bit-identically (DC-only blocks), across
    non-multiple-of-8 frames and restart intervals."""
    from clif_spark.multimodal import jpeg as J

    for w, h, ri in [(43, 22, 0), (9, 7, 1), (46, 32, 3), (8, 8, 0)]:
        def px(x, y):
            return (5 + 7 * (x // 8) + 11 * (y // 8)) % 256

        data = J.jpeg_encode_gray(w, h, px, restart_interval=ri)
        W, H, planes = J.jpeg_decode(data)
        assert (W, H) == (w, h)
        assert all(planes[0][y * w + x] == px(x, y)
                   for y in range(h) for x in range(w))


def test_jpeg_random_content_roundtrip_near_lossless():
    """Arbitrary 8-bit content through the FULL pipeline (nonzero AC
    coefficients, ZRL runs, EOB) with unit quant steps: per-pixel error is
    bounded by the coefficient rounding alone (each of 64 coefficients
    rounds by <=0.5; the IDCT basis rows have L1 norm ~1), so maxerr must
    stay tiny — a Huffman/zigzag/dequant bug produces errors of tens."""
    import random

    from clif_spark.multimodal import jpeg as J

    rng = random.Random(7)
    img = [[rng.randrange(256) for _ in range(29)] for _ in range(21)]
    data = J.jpeg_encode_gray(29, 21, lambda x, y: img[y][x])
    _, _, planes = J.jpeg_decode(data)
    maxerr = max(abs(planes[0][y * 29 + x] - img[y][x])
                 for y in range(21) for x in range(29))
    assert maxerr <= 2


def test_jpeg_idct_matches_numpy_reference():
    """Independent check of the hand-rolled transform pair: numpy builds
    the orthonormal 8-point DCT-II matrix from the textbook definition and
    applies it as matrix algebra; our separable FDCT must agree to float
    precision, and IDCT(FDCT(x)) must reproduce x."""
    import numpy as np

    from clif_spark.multimodal import jpeg as J

    # textbook orthonormal DCT-II matrix, scaled to T.81's convention
    # (T.81 F(u) = 2 * C(u)/2 * sum ... -> our _COS is exactly M/2 rows)
    M = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            M[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    rng = np.random.default_rng(3)
    blk = rng.integers(0, 256, size=(8, 8)).astype(float) - 128.0
    ref = M @ blk @ M.T
    ours = np.array(J._fdct2d(list(blk.flatten()))).reshape(8, 8)
    assert np.max(np.abs(ours - ref)) < 1e-9
    back = J._idct2d(list(ref.flatten()))
    assert np.max(np.abs(np.array(back).reshape(8, 8)
                         - (blk + 128.0))) <= 0.5 + 1e-9


def test_jpeg_color_roundtrip_within_ycbcr_budget():
    """4:4:4 and 4:2:0 color: on a per-8x8-block-constant RGB image the
    only loss is YCbCr forward/inverse rounding (and chroma averaging for
    4:2:0, zero for block-constant content), so each channel must come
    back within a few counts."""
    from clif_spark.multimodal import jpeg as J

    def cpx(x, y):
        bx, by = x // 8, y // 8
        return ((40 + 30 * bx) % 256, (90 + 50 * by) % 256,
                (10 + 60 * (bx + by)) % 256)

    for sub in (False, True):
        data = J.jpeg_encode_rgb(24, 16, cpx, subsample=sub)
        rgb = J.jpeg_rgb_values(data)
        assert len(rgb) == 24 * 16 * 3
        maxerr = 0
        for y in range(16):
            for x in range(24):
                want = cpx(x, y)
                got = rgb[3 * (y * 24 + x):3 * (y * 24 + x) + 3]
                maxerr = max(maxerr, *(abs(a - b)
                                       for a, b in zip(got, want)))
        assert maxerr <= 3, (sub, maxerr)


def test_jpeg_rejects_non_baseline_and_malformed():
    """Contract edges: non-JPEG payloads -> None from the chain helper;
    genuinely unsupported SOFs (lossless SOF3, arithmetic SOF9) raise
    (not garbage) and the helper maps them to None; truncated entropy
    data -> None; the other codecs' magics are not claimed by the JPEG
    path."""
    import pytest

    from clif_spark.multimodal import jpeg as J

    assert J.jpeg_gray_values(b"") is None
    assert J.jpeg_gray_values(b"GIF87a\x01\x00\x01\x00") is None
    assert J.jpeg_gray_values(b"\x89PNG\r\n\x1a\n") is None
    assert J.jpeg_gray_values(b"RIFF....WAVE") is None
    good = J.jpeg_encode_gray(10, 9, lambda x, y: (x * y) % 256)
    assert J.jpeg_gray_values(good) is not None
    sof = good.index(b"\xff\xc0")
    for bad in (b"\xff\xc3", b"\xff\xc9"):  # lossless / arithmetic
        flipped = good[:sof] + bad + good[sof + 2:]
        with pytest.raises(ValueError, match="unsupported SOF"):
            J.jpeg_decode(flipped)
        assert J.jpeg_gray_values(flipped) is None
    # SOF2 alone no longer rejects (progressive is supported) — but a
    # baseline stream relabeled SOF2 has a spectrally-invalid SOS
    # (Ss=0, Se=63) and must still fail CLEANLY, not decode garbage
    prog = good[:sof] + b"\xff\xc2" + good[sof + 2:]
    with pytest.raises(ValueError, match="DC scan"):
        J.jpeg_decode(prog)
    assert J.jpeg_gray_values(prog) is None
    assert J.jpeg_gray_values(good[:40]) is None  # truncated mid-header


def test_jpeg_progressive_roundtrip_matches_sequential():
    """Progressive (SOF2) decode, two-sided: the progressive encoder's
    six-scan script (DC first Al=1, two AC bands Al=1, DC refine, two AC
    refines with cross-block EOBRUN + buffered correction bits) must
    reconstruct EXACTLY what the sequential codec produces for the same
    content and quant step — same quantized coefficients, so refinement
    must restore every bit. Covers gray + color 4:4:4, partial blocks,
    flat-quant lossy steps."""
    import random

    from clif_spark.multimodal import jpeg as J

    rng = random.Random(42)
    for (w, h, q) in [(9, 7, None), (17, 13, None), (32, 24, 2),
                      (24, 18, 5), (41, 15, 9)]:
        vals = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        px = lambda x, y: vals[y][x]
        seq = J.jpeg_decode(J.jpeg_encode_gray(w, h, px, quality=q))
        pro = J.jpeg_decode(
            J.jpeg_encode_gray_progressive(w, h, px, quality=q))
        assert pro == seq, (w, h, q)
    for (w, h, q) in [(12, 10, None), (20, 15, 3)]:
        vals = [[(rng.randrange(256), rng.randrange(256),
                  rng.randrange(256)) for _ in range(w)]
                for _ in range(h)]
        px = lambda x, y: vals[y][x]
        seq = J.jpeg_decode(J.jpeg_encode_rgb(w, h, px, quality=q))
        pro = J.jpeg_decode(
            J.jpeg_encode_rgb_progressive(w, h, px, quality=q))
        assert pro == seq, (w, h, q)


def test_jpeg_progressive_multilevel_al_and_band_splits():
    """Scan scripts mainstream encoders emit but the default six-scan
    script never reaches: multi-level successive approximation (Al=2->
    1->0 and Al=3->2->1->0 refinement CHAINS — repeated refinement of
    the same band over partially-built coefficients) and different
    spectral splits (DC-then-full-band ``(1,63)``; a three-way libjpeg
    -style staging). Every combination must reconstruct exactly the
    sequential codec's output — same quantized coefficients, so the
    chain must restore every bit plane. Covers gray, color 4:4:4,
    4:2:0 subsampled, and restart markers inside multi-level scans."""
    import random

    from clif_spark.multimodal import jpeg as J

    rng = random.Random(7)
    splits = (((1, 5), (6, 63)), ((1, 63),), ((1, 2), (3, 10), (11, 63)))
    for (w, h, q) in [(9, 7, None), (17, 13, None), (32, 24, 2),
                      (24, 18, 5)]:
        vals = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        px = lambda x, y: vals[y][x]
        seq = J.jpeg_decode(J.jpeg_encode_gray(w, h, px, quality=q))
        for levels in (2, 3):
            for bands in splits:
                pro = J.jpeg_decode(J.jpeg_encode_gray_progressive(
                    w, h, px, quality=q, levels=levels, ac_bands=bands))
                assert pro == seq, (w, h, q, levels, bands)
    vals = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(20)] for _ in range(15)]
    px = lambda x, y: vals[y][x]
    seq = J.jpeg_decode(J.jpeg_encode_rgb(20, 15, px, quality=3))
    pro = J.jpeg_decode(J.jpeg_encode_rgb_progressive(
        20, 15, px, quality=3, levels=2, ac_bands=((1, 63),)))
    assert pro == seq
    seq420 = J.jpeg_decode(J.jpeg_encode_rgb(20, 15, px, quality=3,
                                             subsample=True))
    pro420 = J.jpeg_decode(J.jpeg_encode_rgb_progressive(
        20, 15, px, quality=3, subsample=True, levels=3))
    assert pro420 == seq420
    # restart markers inside every multi-level scan change nothing
    px2 = lambda x, y: (x * 7 + y * 13) % 256
    with_rst = J.jpeg_decode(J.jpeg_encode_gray_progressive(
        24, 18, px2, levels=2, restart_interval=2))
    without = J.jpeg_decode(J.jpeg_encode_gray_progressive(
        24, 18, px2, levels=2))
    assert with_rst == without


def test_jpeg_progressive_block_constant_is_exact():
    """The oracle contract regime extends to progressive: block-constant
    content under all-ones quant is bit-exact through the six-scan
    stream (DC point transform + refinement restores every DC bit; AC
    scans are pure EOBRUN streams)."""
    from clif_spark.multimodal import jpeg as J

    for (w, h) in [(9, 7), (16, 8), (23, 17), (40, 26)]:
        px = lambda x, y: (3 + 7 * (x // 8) + 11 * (y // 8)) % 256
        want = [px(x, y) for y in range(h) for x in range(w)]
        got = J.jpeg_gray_values(J.jpeg_encode_gray_progressive(w, h, px))
        assert got == want, (w, h)


def test_jpeg_fill_bytes_and_corrupt_table_ids():
    """T.81 B.1.1.2 fill bytes (extra 0xFF before a marker code) must
    decode identically — the padding is spec-legal, not corruption. A
    scan referencing an undefined quant/Huffman table or an unknown
    component id must raise a clean ValueError inside jpeg_decode (not
    KeyError/StopIteration escaping the helper's never-raise contract
    and killing a whole mapInPandas task)."""
    import pytest

    from clif_spark.multimodal import jpeg as J

    good = J.jpeg_encode_gray(10, 9, lambda x, y: (x * y) % 256)
    base = J.jpeg_gray_values(good)
    assert base is not None
    # insert a fill byte before the DQT marker: decode must be identical
    padded = good.replace(b"\xff\xdb", b"\xff\xff\xdb", 1)
    assert padded != good
    assert J.jpeg_gray_values(padded) == base
    # and a run of several fill bytes
    padded3 = good.replace(b"\xff\xdb", b"\xff\xff\xff\xff\xdb", 1)
    assert J.jpeg_gray_values(padded3) == base

    sos = good.index(b"\xff\xda")
    # SOS layout: FF DA | len(2) | ns | (cs, tt)... — grayscale ns=1
    cs_pos, tt_pos = sos + 5, sos + 6
    bad_table = good[:tt_pos] + b"\x33" + good[tt_pos + 1:]
    with pytest.raises(ValueError, match="undefined"):
        J.jpeg_decode(bad_table)
    assert J.jpeg_gray_values(bad_table) is None
    bad_comp = good[:cs_pos] + b"\x99" + good[cs_pos + 1:]
    with pytest.raises(ValueError, match="unknown component"):
        J.jpeg_decode(bad_comp)
    assert J.jpeg_rgb_values(bad_comp) is None


def test_jpeg_payload_query_matches_duckdb_oracle(spark):
    """mm_jpeg_pixel_stats end-to-end at sf0.001 against its closed-form
    DuckDB oracle through the SAME pandas materialization the driver
    uses (int-vs-float representation drift must fail here if it would
    fail there)."""
    import pandas as pd

    sf_dir = "/root/testdata/sf0.001"
    reg = collect_registry()
    qd = reg["mm_jpeg_pixel_stats"]
    sdf = (qd.fn(spark, sf_dir).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    odf = (con.execute(qd.oracle).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(sdf) == len(odf) and len(sdf) > 0
    sdf, odf = sdf[sorted(sdf.columns)], odf[sorted(odf.columns)]
    for c in sdf.columns:
        a = sdf[c].astype(object).where(~pd.isna(sdf[c]), None)
        b = odf[c].astype(object).where(~pd.isna(odf[c]), None)
        assert list(a) == list(b), c
    # and the decode is genuinely exercised: both kinds present
    assert set(sdf["kind"]) == {"jpeg_pixels", "other"}


# ---------------------------------------------------------------------------
# MP4 sample extraction (real demux grain)
# ---------------------------------------------------------------------------


def test_mp4_sample_table_roundtrip_all_chunk_shapes():
    """Builder/extractor pair across the sample-table variants: run-length
    stsc ([2,3,3,...]), single-sample chunks, per-sample and uniform stsz
    — every frame must come back byte-identical with its cumulative stts
    pts."""
    from clif_spark.multimodal import _mp4_sample_codecs

    build, extract = _mp4_sample_codecs()
    for uniform, single in [(False, False), (False, True),
                            (True, False), (True, True)]:
        frames = [bytes((37 * k + i) % 256
                        for i in range(16 if uniform else 10 + 3 * k))
                  for k in range(7)]
        p = build(3000, 125, frames, uniform=uniform,
                  single_sample_chunks=single)
        ts, got = extract(p)
        assert ts == 3000
        assert [f for f, _ in got] == frames, (uniform, single)
        assert [pts for _, pts in got] == [125 * k for k in range(7)]


def test_mp4_sample_extraction_rejects_malformed():
    """Demux contract: no fabricated frames. Non-MP4 payloads, tables
    pointing past EOF, and chunk layouts that do not cover every sample
    all return None."""
    from clif_spark.multimodal import _mp4_sample_codecs

    build, extract = _mp4_sample_codecs()
    assert extract(b"") is None
    assert extract(b"plain text payload") is None
    p = build(1000, 40, [b"abcdef", b"ghijkl"])
    assert extract(p[:40]) is None  # truncated: table points past EOF
    # corrupt stco count to zero chunks: samples uncovered -> None
    import struct
    stco_at = p.index(b"stco")
    broken = bytearray(p)
    struct.pack_into(">I", broken, stco_at + 8, 0)
    assert extract(bytes(broken)) is None


def test_extract_video_frames_strides_and_skips(spark):
    """The 1->N demux operator: MP4 docs explode into every-second-frame
    rows with exact (pts_ms, n_bytes, byte_sum); text docs produce no
    rows; all stats match hand-computed values."""
    from clif_spark import multimodal

    df = spark.createDataFrame(
        [(0, "ignored"), (1, "plain text"), (3, "also ignored")],
        ["doc_id", "text"])
    payload = multimodal.synth_video_payload(df)
    rows = {(r.doc_id, r.frame_idx): r for r in
            multimodal.extract_video_frames(payload, stride=2).collect()}
    # doc 0: n=3, uniform (0%15==0), single-sample chunks; doc 3: n=6
    assert {d for d, _ in rows} == {0, 3}
    assert {k for d, k in rows if d == 0} == {0, 2}
    assert {k for d, k in rows if d == 3} == {0, 2, 4}
    for (d, k), r in rows.items():
        uni = d % 15 == 0
        sz = 16 if uni else 16 + (d + k) % 32
        assert r.n_bytes == sz
        assert r.byte_sum == sum((7 * d + 13 * k + i) % 256
                                 for i in range(sz))
        assert r.pts_ms == (40 * k * 1000) // (1000 * (1 + d % 3))


def test_resize_image_pixels_exact_mapping(spark):
    """Real resize: identity below max_side, exact nearest-neighbor
    source mapping above it, NULL stats for non-PNG payloads."""
    import pandas as pd

    build_png, png_vals, _ = multimodal._sample_codecs()

    def pix(x, y, c):
        return (7 * x + 11 * y + 3 * c) % 256

    small = build_png(6, 4, pix)           # fits: passes through
    big = build_png(32, 8, pix)            # resizes to 16 x 4
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, b"not a png")], ["doc_id", "payload"])
    out = {r.doc_id: r for r in
           multimodal.resize_image_pixels(df, max_side=16).collect()}
    r1 = out[1]
    assert (r1.out_width, r1.out_height, r1.n_values) == (6, 4, 6 * 4 * 3)
    exp1 = [pix(x, y, c) for y in range(4) for x in range(6)
            for c in range(3)]
    assert r1.mean_value == sum(exp1) / len(exp1)
    r2 = out[2]
    assert (r2.width, r2.height, r2.out_width, r2.out_height) == (32, 8, 16, 4)
    exp2 = [pix((x * 32) // 16, (y * 8) // 4, c)
            for y in range(4) for x in range(16) for c in range(3)]
    assert (r2.n_values, r2.peak) == (len(exp2), max(exp2))
    assert r2.mean_value == sum(exp2) / len(exp2)
    assert out[3].n_values is None and out[3].mean_value is None


def test_resample_audio_pcm_frame_grain_decimation(spark):
    """Frame-grain decimation keeps stereo in sync: both channels of a
    kept frame survive together, counts/stats match hand computation,
    and non-WAV payloads yield NULL stats."""
    import struct

    build_wav = multimodal.build_wav_bytes
    # stereo: frame f carries samples (10f, -10f); 7 frames, stride 3
    data = b"".join(struct.pack("<h", v)
                    for f in range(7) for v in (10 * f, -10 * f))
    wav = build_wav(24000, 2, 7, data=data)
    df = spark.createDataFrame(
        [(1, wav), (2, b"definitely not audio")], ["doc_id", "payload"])
    out = {r.doc_id: r for r in
           multimodal.resample_audio_pcm(df, stride=3).collect()}
    r = out[1]
    kept = [(10 * f, -10 * f) for f in (0, 3, 6)]
    flat = [v for fr in kept for v in fr]
    assert (r.sample_rate_in, r.sample_rate_out, r.channels) == (24000, 8000, 2)
    assert (r.n_frames_out, r.n_values) == (3, 6)
    assert r.mean_value == sum(flat) / len(flat)
    assert r.peak == max(abs(v) for v in flat)
    assert out[2].n_values is None


def test_resize_image_pixels_handles_gif_and_jpeg(spark):
    """The resize transform dispatches through ALL three real image
    codecs: a GIF's palette-mapped channels and a JPEG's luma-replicated
    channels resize with the same exact NN mapping as PNG."""
    from clif_spark.multimodal import jpeg as J

    pal = multimodal.gif_palette(64)
    gif = multimodal.build_gif_rich(
        32, 8, lambda x, y: (x + 2 * y) % 64)       # -> 16 x 4
    jpg = J.jpeg_encode_gray(
        24, 6, lambda x, y: (5 + 7 * (x // 8) + 11 * (y // 8)) % 256)
    df = spark.createDataFrame([(1, gif), (2, jpg)], ["doc_id", "payload"])
    out = {r.doc_id: r for r in
           multimodal.resize_image_pixels(df, max_side=16).collect()}
    g = out[1]
    assert (g.width, g.height, g.out_width, g.out_height) == (32, 8, 16, 4)
    exp_g = [c for y in range(4) for x in range(16)
             for c in pal[((x * 32) // 16 + 2 * ((y * 8) // 4)) % 64]]
    assert (g.n_values, g.peak) == (len(exp_g), max(exp_g))
    assert g.mean_value == sum(exp_g) / len(exp_g)
    j = out[2]
    assert (j.width, j.height, j.out_width, j.out_height) == (24, 6, 16, 4)
    exp_j = [(5 + 7 * (((x * 24) // 16) // 8)
              + 11 * (((y * 6) // 4) // 8)) % 256
             for y in range(4) for x in range(16) for _ in range(3)]
    assert (j.n_values, j.peak) == (len(exp_j), max(exp_j))
    assert j.mean_value == sum(exp_j) / len(exp_j)


def test_jpeg_ac_magnitude_extremal_bound():
    """The baseline AC category cap (10) is safe for ALL legal 8-bit
    content: the extremal block — signs aligned with the (4,4) basis,
    full amplitude — achieves |AC| = 1020, the mathematical maximum
    0.125*(32*128 + 32*127), which is category 10. It must encode and
    roundtrip EXACTLY (every coefficient of this pattern lands on the
    DC/(4,4)-harmonic lattice); the category-11 guard is a defensive
    invariant, not a reachable path."""
    import math

    from clif_spark.multimodal import jpeg as J

    def sign4(i):
        return 1 if math.cos((2 * i + 1) * 4 * math.pi / 16) > 0 else -1

    def px(x, y):
        return 255 if sign4(x) * sign4(y) > 0 else 0

    blk = [float(px(x, y) - 128) for y in range(8) for x in range(8)]
    coef = J._fdct2d(blk)
    peak = max(abs(c) for c in coef[1:])
    assert round(peak) == 1020  # the extremal bound, category 10
    data = J.jpeg_encode_gray(16, 16, px)
    _, _, planes = J.jpeg_decode(data)
    assert all(planes[0][y * 16 + x] == px(x, y)
               for y in range(16) for x in range(16))


def test_jpeg_422_subsampling_decodes(spark=None):
    """The decoder's claimed 4:2:2 surface (h=2, v=1 luma sampling),
    which the public encoder helpers never emit: build the component
    planes directly — full-res Y, horizontally-halved Cb/Cr — and decode.
    On a horizontally-constant color image the horizontal chroma
    replication is exact, so every channel must come back within the
    YCbCr rounding budget."""
    from clif_spark.multimodal import jpeg as J

    w, h = 20, 12

    def rgb(x, y):
        # varies only with y: horizontal chroma halving loses nothing
        return ((30 + 15 * y) % 256, (200 - 9 * y) % 256, (60 + 11 * y) % 256)

    ys, cbs, crs = [], [], []
    for yy in range(h):
        for xx in range(w):
            r, g, b = rgb(xx, yy)
            ys.append(max(0, min(255, round(0.299*r + 0.587*g + 0.114*b))))
            cbs.append(max(0, min(255, round(128 - 0.168736*r - 0.331264*g + 0.5*b))))
            crs.append(max(0, min(255, round(128 + 0.5*r - 0.418688*g - 0.081312*b))))
    cw = (w + 1) // 2
    half = lambda p: [p[yy * w + 2 * xx] for yy in range(h) for xx in range(cw)]
    data = J._encode_planes(
        w, h, [(ys, w, h, 2, 1), (half(cbs), cw, h, 1, 1),
               (half(crs), cw, h, 1, 1)],
        quality=None, restart_interval=0)
    rgbv = J.jpeg_rgb_values(data)
    assert rgbv is not None and len(rgbv) == w * h * 3
    maxerr = 0
    for yy in range(h):
        for xx in range(w):
            want = rgb(xx, yy)
            got = rgbv[3 * (yy * w + xx):3 * (yy * w + xx) + 3]
            maxerr = max(maxerr, *(abs(a - b) for a, b in zip(got, want)))
    assert maxerr <= 3, maxerr


def test_video_pixel_stats_decodes_mjpeg_and_skips_opaque(spark):
    """video_frame_pixel_stats closes the demux->decode loop: MJPEG
    frames come back with exact block-constant luma stats; a frame that
    is NOT a decodable JPEG (e.g. an H.264-like opaque payload) is
    skipped rather than fabricated; non-MP4 payloads yield no rows."""
    from clif_spark import multimodal as M
    from clif_spark.multimodal import jpeg as J

    build_mp4, _ = M._mp4_sample_codecs()
    jf = J.jpeg_encode_gray(16, 8, lambda x, y: 50 + 7 * (x // 8))
    mixed = build_mp4(1000, 40, [jf, b"\x00\x01opaque-h264-ish", jf])
    rows = spark.createDataFrame(
        [(1, bytearray(mixed)), (2, bytearray(b"not a video"))],
        "doc_id long, payload binary")
    got = {(r.doc_id, r.frame_idx): r
           for r in M.video_frame_pixel_stats(rows, stride=1).collect()}
    assert set(got) == {(1, 0), (1, 2)}  # frame 1 skipped, doc 2 absent
    r0 = got[(1, 0)]
    assert (r0.width, r0.height, r0.n_pixels) == (16, 8, 128)
    assert r0.mean_value == (50 + 57) / 2  # two blocks: 50 and 57
    assert r0.peak == 57
    assert got[(1, 2)].pts_ms == 80


def test_jpeg_progressive_restart_intervals_two_sided():
    """DRI/RSTn inside progressive scans, both directions: the encoder
    emits restart markers in every scan (DC predictors reset, EOB runs
    flushed at each boundary) and the decoder's progressive restart path
    reconstructs exactly what the unrestarted stream does."""
    import random

    from clif_spark.multimodal import jpeg as J

    rng = random.Random(11)
    for (w, h, q, ri) in [(24, 16, None, 1), (33, 25, 2, 2),
                          (17, 41, 5, 3)]:
        vals = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        px = lambda x, y: vals[y][x]
        plain = J.jpeg_decode(
            J.jpeg_encode_gray_progressive(w, h, px, quality=q))
        restarted_stream = J.jpeg_encode_gray_progressive(
            w, h, px, quality=q, restart_interval=ri)
        assert b"\xff\xd0" in restarted_stream  # markers genuinely emitted
        assert J.jpeg_decode(restarted_stream) == plain, (w, h, q, ri)
    # color with restarts
    vals = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(14)] for _ in range(12)]
    px = lambda x, y: vals[y][x]
    a = J.jpeg_decode(J.jpeg_encode_rgb_progressive(14, 12, px))
    b = J.jpeg_decode(
        J.jpeg_encode_rgb_progressive(14, 12, px, restart_interval=1))
    assert a == b


def test_jpeg_progressive_420_subsampled_matches_sequential():
    """Subsampled progressive, two-sided: the 4:2:0 progressive stream
    (interleaved DC scans covering the luma component's 2x2 MCU blocks
    + the padded chroma grid, per-component AC scans over each REAL
    block grid) must reconstruct exactly what the 4:2:0 sequential
    codec produces — including with restart markers."""
    import random

    from clif_spark.multimodal import jpeg as J

    rng = random.Random(17)
    for (w, h, q, ri) in [(18, 14, None, 0), (25, 33, 2, 1),
                          (16, 16, 5, 2), (9, 21, None, 3)]:
        vals = [[(rng.randrange(256), rng.randrange(256),
                  rng.randrange(256)) for _ in range(w)]
                for _ in range(h)]
        px = lambda x, y: vals[y][x]
        seq = J.jpeg_decode(
            J.jpeg_encode_rgb(w, h, px, quality=q, subsample=True))
        pro = J.jpeg_decode(J.jpeg_encode_rgb_progressive(
            w, h, px, quality=q, subsample=True, restart_interval=ri))
        assert pro == seq, (w, h, q, ri)


def test_image_dhash_closed_form_and_scale_invariance(spark):
    """image_dhash: (1) chunks equal an independently hand-computed
    dHash (decode -> grayscale -> 9x8 NN grid -> gradient bits ->
    LSB-first 16-bit chunks) for a closed-form PNG; (2) an exact 2x
    nearest-neighbor upscale of the same image hashes IDENTICALLY
    (the floor identity (2a div b) div 2 = a div b); (3) GIF and JPEG
    payloads dispatch through their real codecs to non-NULL chunks;
    (4) non-image payloads yield NULL chunks."""
    from clif_spark.multimodal import jpeg as J

    build_png, _, _ = multimodal._sample_codecs()

    def pix(x, y, c):
        return (37 * ((x % 7) * (y % 5)) + 11 * x * x + 23 * y + 5 * c) % 256

    w, h = 14, 11

    def hand_dhash(width, height, val):
        gray = {}
        for cy in range(8):
            sy = cy * height // 8
            for cx in range(9):
                sx = cx * width // 9
                gray[(cx, cy)] = sum(val(sx, sy, c) for c in range(3)) // 3
        bits = 0
        for cy in range(8):
            for cx in range(8):
                if gray[(cx + 1, cy)] > gray[(cx, cy)]:
                    bits |= 1 << (cy * 8 + cx)
        return tuple((bits >> (16 * m)) & 0xFFFF for m in range(4))

    base = build_png(w, h, pix)
    up2 = build_png(2 * w, 2 * h, lambda x, y, c: pix(x // 2, y // 2, c))
    gif = multimodal.synth_gif_payload(
        spark.createDataFrame([(0, "x")], ["doc_id", "text"]))
    gif_payload = gif.collect()[0].payload
    jpg = J.jpeg_encode_gray(16, 16, lambda x, y: (x * 16 + y * 7) % 256)
    df = spark.createDataFrame(
        [(1, base), (2, up2), (3, gif_payload), (4, jpg),
         (5, b"plain text, not an image")],
        ["doc_id", "payload"])
    out = {r.doc_id: (r.c0, r.c1, r.c2, r.c3)
           for r in multimodal.image_dhash(df).collect()}
    assert out[1] == hand_dhash(w, h, pix)
    assert out[2] == out[1]                      # 2x NN upscale invariant
    assert all(v is not None for v in out[3])    # GIF decoded
    assert all(v is not None for v in out[4])    # JPEG decoded
    assert out[5] == (None, None, None, None)


def test_image_phash_pairs_planted_recovery(spark):
    """End-to-end image dedup pairing: a corpus of distinct
    closed-form PNGs plus planted 2x copies — the shared Hamming
    banding must recover exactly the planted pairs at distance 0,
    with zero false pairs among distinct images."""
    from clif_spark import dedup

    ids = list(range(40))
    base = spark.createDataFrame(
        [(i, i, 1) for i in ids], ["doc_id", "src_id", "scale"])
    copies = spark.createDataFrame(
        [(i + 10000000, i, 2) for i in ids if i % 10 == 0],
        ["doc_id", "src_id", "scale"])
    payload = multimodal.synth_scaled_png_payload(
        base.unionByName(copies))
    sig = multimodal.image_dhash(payload)
    got = {(r.a, r.b, r.hamming) for r in
           dedup.hamming_pairs_from_chunks(
               sig, id_col="doc_id", max_hamming=4).collect()}
    assert got == {(i, i + 10000000, 0) for i in ids if i % 10 == 0}


def test_audio_dhash_closed_form_and_scale_invariance(spark):
    """audio_dhash: (1) chunks equal an independently hand-computed
    fingerprint (PCM decode -> channel sum -> 65-point NN grid ->
    temporal gradient bits -> LSB-first 16-bit chunks) for a
    closed-form stereo WAV; (2) an exact 2x frame-repeat upsample of
    the same clip fingerprints IDENTICALLY (the floor identity
    (2a div b) div 2 = a div b on frame sampling); (3) non-audio
    payloads and non-PCM WAVs yield NULL chunks."""
    import struct

    ch, nf = 2, 97

    def sample(f, c):
        return ((31 * f * f + 7 * f + 13 * c + 5) % 1999) - 999

    def wav_of(scale):
        vals = [sample(f // scale, c)
                for f in range(nf * scale) for c in range(ch)]
        return multimodal.build_wav_bytes(
            8000 * scale, ch, nf * scale,
            struct.pack(f"<{len(vals)}h", *vals))

    def hand_fp():
        s = [sum(sample(i * nf // 65, c) for c in range(ch))
             for i in range(65)]
        bits = 0
        for i in range(64):
            if s[i + 1] > s[i]:
                bits |= 1 << i
        return tuple((bits >> (16 * m)) & 0xFFFF for m in range(4))

    # a float-format (tag 3) WAV must decode to NULL, not garbage bits
    pcm = wav_of(1)
    float_wav = pcm.replace(b"fmt " + struct.pack("<IH", 16, 1),
                            b"fmt " + struct.pack("<IH", 16, 3), 1)
    df = spark.createDataFrame(
        [(1, wav_of(1)), (2, wav_of(2)),
         (3, b"plain text, not audio"), (4, float_wav)],
        ["doc_id", "payload"])
    out = {r.doc_id: (r.c0, r.c1, r.c2, r.c3)
           for r in multimodal.audio_dhash(df).collect()}
    assert out[1] == hand_fp()
    assert out[2] == out[1]                    # 2x upsample invariant
    assert out[3] == (None, None, None, None)
    assert out[4] == (None, None, None, None)


def test_audio_fingerprint_pairs_planted_recovery(spark):
    """End-to-end audio dedup pairing: a corpus of distinct
    closed-form WAVs plus planted 2x frame-repeat copies — the shared
    Hamming banding must recover exactly the planted pairs at
    distance 0, with zero false pairs among distinct clips."""
    from clif_spark import dedup

    ids = list(range(40))
    base = spark.createDataFrame(
        [(i, i, 1) for i in ids], ["doc_id", "src_id", "scale"])
    copies = spark.createDataFrame(
        [(i + 10000000, i, 2) for i in ids if i % 10 == 0],
        ["doc_id", "src_id", "scale"])
    payload = multimodal.synth_scaled_wav_payload(
        base.unionByName(copies))
    sig = multimodal.audio_dhash(payload)
    got = {(r.a, r.b, r.hamming) for r in
           dedup.hamming_pairs_from_chunks(
               sig, id_col="doc_id", max_hamming=4).collect()}
    assert got == {(i, i + 10000000, 0) for i in ids if i % 10 == 0}


def test_video_dhash_closed_form_and_invariants(spark):
    """video_dhash: (1) chunks equal an independently hand-computed
    temporal fingerprint (demux -> sampled-frame JPEG decode -> mean
    luma -> gradient bits -> 16-bit chunks) for a closed-form MJPEG
    container; (2) an exact 2x frame-repeat upsample fingerprints
    IDENTICALLY (floor identity on NN frame sampling); (3) a non-MP4
    payload and a container whose sampled frames are not decodable
    JPEGs yield NULL chunks — no fabricated means."""
    from clif_spark.multimodal import jpeg as J

    build_mp4, _ = multimodal._mp4_sample_codecs()
    n0 = 70

    def val(sf):
        return (19 * ((11 * sf * sf + 5 * sf + 3) % 509) + 7) % 256

    def clip(scale):
        frames = [J.jpeg_encode_gray(8, 8,
                                     lambda x, y, k=k: val(k // scale))
                  for k in range(n0 * scale)]
        return build_mp4(1000 * scale, 40, frames)

    def hand_fp():
        means = [val(i * n0 // 65) for i in range(65)]
        bits = 0
        for i in range(64):
            if means[i + 1] > means[i]:
                bits |= 1 << i
        return tuple((bits >> (16 * m)) & 0xFFFF for m in range(4))

    opaque = build_mp4(1000, 40, [b"\x00\x00\x00\x01gNAL" * 4] * 70)
    df = spark.createDataFrame(
        [(1, clip(1)), (2, clip(2)),
         (3, b"plain text, not a video"), (4, opaque)],
        ["doc_id", "payload"])
    out = {r.doc_id: (r.c0, r.c1, r.c2, r.c3)
           for r in multimodal.video_dhash(df).collect()}
    assert out[1] == hand_fp()
    assert out[2] == out[1]                # 2x frame-repeat invariant
    assert out[3] == (None, None, None, None)
    assert out[4] == (None, None, None, None)


def test_video_phash_pairs_planted_recovery(spark):
    """End-to-end video dedup pairing: distinct closed-form MJPEG
    containers plus planted 2x frame-repeat copies — the shared
    Hamming banding must recover exactly the planted pairs at
    distance 0, with zero false pairs among distinct videos."""
    from clif_spark import dedup

    ids = list(range(40))
    base = spark.createDataFrame(
        [(i, i, 1) for i in ids], ["doc_id", "src_id", "scale"])
    copies = spark.createDataFrame(
        [(i + 10000000, i, 2) for i in ids if i % 10 == 0],
        ["doc_id", "src_id", "scale"])
    payload = multimodal.synth_scaled_mjpeg_payload(
        base.unionByName(copies))
    sig = multimodal.video_dhash(payload)
    got = {(r.a, r.b, r.hamming) for r in
           dedup.hamming_pairs_from_chunks(
               sig, id_col="doc_id", max_hamming=4).collect()}
    assert got == {(i, i + 10000000, 0) for i in ids if i % 10 == 0}
