"""Baseline JPEG (ITU T.81 sequential DCT, 8-bit) — pure-stdlib codec.

This closes the repo's last honest media-codec boundary: PNG pixels (zlib
inflate + unfilters), GIF pixels (hand LZW), and WAV PCM were already real;
JPEG was metadata-only because entropy decode needs Huffman + IDCT + chroma
handling. All of that is plain table logic and arithmetic — no codec
library required — so here it is: a spec-shaped encoder/decoder pair over
``bytes``, used by the multimodal layer's Arrow-batched ``mapInPandas``
feature extractors (clif_spark.multimodal.media_sample_features).

Supported surface (decode): sequential SOF0/1 AND progressive SOF2
(spectral selection + successive approximation, T.81 G.2 — EOBRUN /
refinement-bit semantics per the spec's figure G.7 flow), 8-bit
precision, 1 or 3 components, sampling factors 1-2 (4:4:4 / 4:2:2 /
4:2:0; progressive two-sided-tested at 4:4:4 AND 4:2:0), interleaved
and per-component scans, restart intervals (DRI + RSTn), byte stuffing,
APPn/COM skip, Huffman tables parsed from DHT (canonical construction —
any spec-valid table decodes, not just ours). Arithmetic coding,
lossless/hierarchical SOFs and 12-bit precision raise loudly instead of
decoding garbage.

Encode writes what decode reads: grayscale or YCbCr 4:4:4 / 4:2:0, with
caller-chosen quant tables. The Huffman tables it EMITS are deliberately
non-standard-but-valid canonical codes (all 12 DC categories at 4 bits,
all 162 AC run/size symbols at 8 bits — Kraft-satisfying, written to DHT):
the decoder must honor DHT rather than bake in Annex K, which keeps the
pair an honest two-sided test of the table machinery.

Exactness contract the oracle-gated query leans on: an image that is
CONSTANT within each 8x8 block, encoded with an all-ones quant table,
roundtrips BIT-EXACTLY — such a block quantizes to a lone DC coefficient
8*(v-128) (all AC are exactly zero under the FDCT), and the IDCT of a
DC-only block is the constant DC/8 whose float error (~1e-13) vanishes
under the final round-to-int. That makes decoded pixel statistics
closed-form SQL-predictable while still forcing the full real pipeline:
marker walk, DQT/DHT parse, Huffman DC decode with cross-block
prediction, AC EOB decode, dequantize, IDCT, clamp, crop.

Reference parity note: the reference (kaveriC/CLIF) carries no media
handling at all; this module exists for the LLM-pipeline multimodal
requirement (binary payload columns + real decode feature extraction).
"""

from __future__ import annotations

import math
import struct
import sys

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

#: JPEG zigzag order: ZIGZAG[k] = raster index of the k-th zigzag element.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: 1D DCT basis: _COS[u][x] = C(u) * cos((2x+1) u pi / 16) / 2, so a 1D
#: 8-point IDCT is out[x] = sum_u coef[u] * _COS[u][x] and the forward
#: transform is F[u] = sum_x s[x] * _COS[u][x] (the matrix is orthogonal).
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0) / 2.0
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct2d(block: list[float]) -> list[float]:
    """8x8 forward DCT-II (separable, float) of a level-shifted block."""
    tmp = [0.0] * 64
    for y in range(8):
        row = block[y * 8:y * 8 + 8]
        for u in range(8):
            cu = _COS[u]
            tmp[y * 8 + u] = (row[0] * cu[0] + row[1] * cu[1]
                              + row[2] * cu[2] + row[3] * cu[3]
                              + row[4] * cu[4] + row[5] * cu[5]
                              + row[6] * cu[6] + row[7] * cu[7])
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            cv = _COS[v]
            out[v * 8 + u] = (tmp[u] * cv[0] + tmp[8 + u] * cv[1]
                              + tmp[16 + u] * cv[2] + tmp[24 + u] * cv[3]
                              + tmp[32 + u] * cv[4] + tmp[40 + u] * cv[5]
                              + tmp[48 + u] * cv[6] + tmp[56 + u] * cv[7])
    return out


def _idct2d(coef: list[int | float]) -> list[int]:
    """8x8 inverse DCT (DCT-III) -> clamped 0..255 samples.

    DC-only fast path: mathematically the IDCT of a lone DC coefficient
    is the constant DC/8; computing it directly (instead of 1024 basis
    mults) keeps the oracle-gated block-constant fixtures cheap AND makes
    their exactness trivially auditable. The general path's float error
    (~1e-13) rounds to the same integer, pinned by tests.
    """
    if not any(coef[1:]):
        v = int(round(coef[0] / 8.0)) + 128
        v = 0 if v < 0 else (255 if v > 255 else v)
        return [v] * 64
    tmp = [0.0] * 64
    for v in range(8):
        row = coef[v * 8:v * 8 + 8]
        for x in range(8):
            acc = 0.0
            for u in range(8):
                c = row[u]
                if c:
                    acc += c * _COS[u][x]
            tmp[v * 8 + x] = acc
    out = [0] * 64
    for x in range(8):
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            acc = 0.0
            for v in range(8):
                c = col[v]
                if c:
                    acc += c * _COS[v][y]
            s = int(round(acc)) + 128
            out[y * 8 + x] = 0 if s < 0 else (255 if s > 255 else s)
    return out


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol}, per T.81 C.2."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# Emitted tables: every DC category (0..11) at 4 bits (Kraft 12/16), every
# AC run/size symbol at 8 bits (Kraft 162/256). Valid canonical codes that
# are deliberately NOT Annex K — see module docstring.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = (
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)

# Progressive AC table: the sequential table plus the EOBn symbols
# (r<<4 | 0 for r = 1..14) that successive-approximation scans emit for
# end-of-band runs longer than one block. 176 symbols at 8 bits
# (Kraft 176/256) — still canonical, still deliberately non-Annex-K.
_ENC_ACP_BITS = [0] * 7 + [176] + [0] * 8
_ENC_ACP_VALS = (
    [r << 4 for r in range(15)] + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)


def _enc_code_map(bits: list[int], vals: list[int]) -> dict:
    return {sym: (length, code)
            for (length, code), sym in _canonical_codes(bits, vals).items()}


_ENC_DC_MAP = _enc_code_map(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC_MAP = _enc_code_map(_ENC_AC_BITS, _ENC_AC_VALS)
_ENC_ACP_MAP = _enc_code_map(_ENC_ACP_BITS, _ENC_ACP_VALS)


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, width: int) -> None:
        self._acc = (self._acc << width) | (value & ((1 << width) - 1))
        self._n += width
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self._n -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def align_ones(self) -> None:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)


class _BitReader:
    """MSB-first bit reader over entropy-coded data: unstuffs FF 00 and
    stops (returning the marker) at any other FF xx marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False  # real marker: stop feeding bits
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8
        return True

    def bit(self) -> int | None:
        if self._n == 0 and not self._fill():
            return None
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, width: int) -> int | None:
        v = 0
        for _ in range(width):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self._acc = 0
        self._n = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2
        self.marker = None


def _huff_decode(br: _BitReader, table: dict) -> int | None:
    length, code = 0, 0
    while length < 16:
        b = br.bit()
        if b is None:
            return None
        code = (code << 1) | b
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code (corrupt entropy data)")


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` received bits to a signed coeff."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(value: int) -> int:
    return value.bit_length() if value >= 0 else (-value).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _quant_tables(quality: int | None) -> tuple[list[int], list[int]]:
    """(luma, chroma) quant tables in raster order. ``quality=None`` means
    ALL-ONES (mathematically lossless for block-constant content — the
    exactness contract); otherwise a flat table of the given step."""
    step = 1 if quality is None else max(1, min(255, quality))
    t = [step] * 64
    return t, list(t)


def _encode_block(samples: list[int], qt: list[int], pred: int,
                  bw: _BitWriter) -> int:
    """FDCT + quantize + Huffman-encode one block; returns the new DC
    predictor. ``samples`` is a raster 8x8 list of 0..255 ints."""
    shifted = [float(s - 128) for s in samples]
    coef = _fdct2d(shifted)
    q = [int(round(coef[i] / qt[i])) for i in range(64)]
    zz = [q[ZIGZAG[k]] for k in range(64)]
    diff = zz[0] - pred
    size = _category(diff)
    length, code = _ENC_DC_MAP[size]
    bw.put(code, length)
    if size:
        bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            lz, cz = _ENC_AC_MAP[0xF0]
            bw.put(cz, lz)
            run -= 16
        s = _category(zz[k])
        if s > 10:
            # T.81 baseline allows AC magnitude categories 1..10 ONLY.
            # For legal 8-bit input this is UNREACHABLE even at unit
            # quant: each |F(u,v)| <= 0.125 * (32*128 + 32*127) = 1020 <
            # 1024 (the extremal sign-aligned (4,4) pattern; pinned in
            # tests). The guard stays as a defensive invariant for
            # out-of-contract inputs rather than silently emitting a
            # symbol the table cannot code.
            raise ValueError("jpeg encode: AC coefficient category > 10 "
                             "(raise the quant step)")
        la, ca = _ENC_AC_MAP[(run << 4) | s]
        bw.put(ca, la)
        bw.put(zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        le, ce = _ENC_AC_MAP[0x00]
        bw.put(ce, le)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_seg(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))


def _shrink2x2(p: list[int], width: int, height: int):
    """2x2 box-average chroma downsample (4:2:0 prep), half-up rounding;
    returns (plane, cw, ch)."""
    cw, ch = (width + 1) // 2, (height + 1) // 2
    out = []
    for y in range(ch):
        for x in range(cw):
            acc = n = 0
            for dy in range(2):
                for dx in range(2):
                    sy, sx = 2 * y + dy, 2 * x + dx
                    if sy < height and sx < width:
                        acc += p[sy * width + sx]
                        n += 1
            out.append((acc + n // 2) // n)
    return out, cw, ch


def _plane_block(plane: list[int], pw: int, ph: int, bx: int,
                 by: int) -> list[int]:
    """Extract the 8x8 block at block coords (bx, by) from a w*h raster
    plane, edge-replicating past the right/bottom borders (T.81 A.2.4
    recommends replication so partial blocks stay smooth — and for
    block-constant content it keeps them constant, hence exact)."""
    out = []
    for y in range(8):
        sy = min(by * 8 + y, ph - 1)
        row = plane[sy * pw:sy * pw + pw]
        for x in range(8):
            out.append(row[min(bx * 8 + x, pw - 1)])
    return out


def jpeg_encode_gray(width: int, height: int, pixel, *,
                     quality: int | None = None,
                     restart_interval: int = 0) -> bytes:
    """Encode a grayscale baseline JPEG. ``pixel(x, y) -> 0..255``.

    ``quality=None`` writes all-ones quant tables (block-constant content
    then roundtrips exactly); an int is a flat quant step. A nonzero
    ``restart_interval`` (in MCUs) emits DRI + RSTn markers so the decoder's
    restart path is honestly testable."""
    plane = [pixel(x, y) & 0xFF for y in range(height) for x in range(width)]
    return _encode_planes(width, height, [(plane, width, height, 1, 1)],
                          quality=quality, restart_interval=restart_interval)


def jpeg_encode_rgb(width: int, height: int, pixel, *,
                    quality: int | None = None, subsample: bool = False,
                    restart_interval: int = 0) -> bytes:
    """Encode a color baseline JPEG (YCbCr; 4:4:4, or 4:2:0 when
    ``subsample``). ``pixel(x, y) -> (r, g, b)``."""
    ys, cbs, crs = [], [], []
    for yy in range(height):
        for xx in range(width):
            r, g, b = pixel(xx, yy)
            ys.append(max(0, min(255, int(round(
                0.299 * r + 0.587 * g + 0.114 * b)))))
            cbs.append(max(0, min(255, int(round(
                128 - 0.168736 * r - 0.331264 * g + 0.5 * b)))))
            crs.append(max(0, min(255, int(round(
                128 + 0.5 * r - 0.418688 * g - 0.081312 * b)))))
    if subsample:
        cb2, cw, ch = _shrink2x2(cbs, width, height)
        cr2, _, _ = _shrink2x2(crs, width, height)
        planes = [(ys, width, height, 2, 2),
                  (cb2, cw, ch, 1, 1), (cr2, cw, ch, 1, 1)]
    else:
        planes = [(ys, width, height, 1, 1), (cbs, width, height, 1, 1),
                  (crs, width, height, 1, 1)]
    return _encode_planes(width, height, planes, quality=quality,
                          restart_interval=restart_interval)


def _encode_planes(width: int, height: int, planes: list,
                   *, quality: int | None,
                   restart_interval: int) -> bytes:
    """Shared marker/scan writer. ``planes`` is a list of
    (raster, pw, ph, h_factor, v_factor); one entry = grayscale,
    three = YCbCr."""
    lq, cq = _quant_tables(quality)
    ncomp = len(planes)
    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, b"\x00" + bytes(lq[ZIGZAG[k]] for k in range(64)))
    if ncomp == 3:
        out += _seg(0xDB, b"\x01" + bytes(cq[ZIGZAG[k]] for k in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci, (_, _, _, hf, vf) in enumerate(planes):
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _dht_seg(0x00, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht_seg(0x10, _ENC_AC_BITS, _ENC_AC_VALS)
    if ncomp == 3:
        out += _dht_seg(0x01, _ENC_DC_BITS, _ENC_DC_VALS)
        out += _dht_seg(0x11, _ENC_AC_BITS, _ENC_AC_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.align_ones()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, (plane, pw, ph, hf, vf) in enumerate(planes):
                qt = lq if ci == 0 else cq
                for by in range(vf):
                    for bx in range(hf):
                        blk = _plane_block(plane, pw, ph,
                                           mx * hf + bx, my * vf + by)
                        preds[ci] = _encode_block(blk, qt, preds[ci], bw)
            mcu_count += 1
    bw.align_ones()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_gray_progressive(width: int, height: int, pixel, *,
                                 quality: int | None = None,
                                 restart_interval: int = 0,
                                 levels: int = 1,
                                 ac_bands: tuple = ((1, 5), (6, 63))) -> bytes:
    """Progressive (SOF2) grayscale encoder — the two-sided test partner
    of the progressive decoder, spec-faithful rather than minimal: the
    scan script exercises BOTH progressive mechanisms. The default
    script (``levels=1``, two AC bands):

      1. DC first      (Ss=0 Se=0  Ah=0 Al=1)   coarse DC, point-shifted
      2. AC first 1-5  (Ss=1 Se=5  Ah=0 Al=1)   low band, coarse
      3. AC first 6-63 (Ss=6 Se=63 Ah=0 Al=1)   high band, coarse
      4. DC refine     (Ss=0 Se=0  Ah=1 Al=0)   one raw bit per block
      5. AC refine 1-5 (Ss=1 Se=5  Ah=1 Al=0)   correction bits + EOBRUN
      6. AC refine 6-63(Ss=6 Se=63 Ah=1 Al=0)

    ``levels`` deepens the successive-approximation chain the way
    mainstream encoders do: the first scans use Al=levels and each band
    then refines one bit plane at a time (Ah=a+1 -> Al=a for
    a = levels-1 .. 0) — levels=2 produces the Al=2 -> 1 -> 0 chains
    libjpeg's default progressive script emits for DC. ``ac_bands``
    selects the spectral split: ``((1, 63),)`` is the
    DC-then-full-band script, finer tuples mirror libjpeg's
    low/high-frequency staging. Decoder paths only multi-level streams
    reach (repeated refinement of the same band, EOBRUN over
    partially-built coefficients) are therefore two-sided-tested, not
    dead code.

    AC scans use the progressive Huffman table (_ENC_ACP_*: sequential
    symbols + EOBn run codes) and real end-of-band runs spanning blocks,
    with the refinement scans' buffered correction bits — so the decoder
    faces genuine EOBRUN>1 streams, not a degenerate per-block EOB form.
    Same exactness contract as the sequential encoder: block-constant
    content under all-ones quant roundtrips bit-exactly (the point
    transform only touches DC, whose refinement restores every bit).
    A nonzero ``restart_interval`` emits DRI + RSTn in every scan (DC
    predictors reset, EOB runs flushed at each boundary)."""
    plane = [pixel(x, y) & 0xFF for y in range(height) for x in range(width)]
    return _encode_progressive_planes(
        width, height, [(plane, width, height, 1, 1)], quality=quality,
        restart_interval=restart_interval, levels=levels, ac_bands=ac_bands)


def jpeg_encode_rgb_progressive(width: int, height: int, pixel, *,
                                quality: int | None = None,
                                subsample: bool = False,
                                restart_interval: int = 0,
                                levels: int = 1,
                                ac_bands: tuple = ((1, 5), (6, 63))) -> bytes:
    """Progressive color — YCbCr 4:4:4, or 4:2:0 when ``subsample`` —
    same scan script as grayscale, with the DC scans interleaved over
    all three components (each contributing its hf x vf MCU blocks) and
    the six AC scans issued per component over its REAL block grid (the
    non-interleaved dims T.81 prescribes — smaller than the padded MCU
    grid exactly when subsampled)."""
    ys, cbs, crs = [], [], []
    for yy in range(height):
        for xx in range(width):
            r, g, b = pixel(xx, yy)
            ys.append(max(0, min(255, int(round(
                0.299 * r + 0.587 * g + 0.114 * b)))))
            cbs.append(max(0, min(255, int(round(
                128 - 0.168736 * r - 0.331264 * g + 0.5 * b)))))
            crs.append(max(0, min(255, int(round(
                128 + 0.5 * r - 0.418688 * g - 0.081312 * b)))))
    if subsample:
        cb2, cw, ch = _shrink2x2(cbs, width, height)
        cr2, _, _ = _shrink2x2(crs, width, height)
        planes = [(ys, width, height, 2, 2),
                  (cb2, cw, ch, 1, 1), (cr2, cw, ch, 1, 1)]
    else:
        planes = [(ys, width, height, 1, 1), (cbs, width, height, 1, 1),
                  (crs, width, height, 1, 1)]
    return _encode_progressive_planes(
        width, height, planes,
        quality=quality, restart_interval=restart_interval,
        levels=levels, ac_bands=ac_bands)


def _encode_progressive_planes(width: int, height: int, planes: list,
                               *, quality: int | None,
                               restart_interval: int = 0,
                               levels: int = 1,
                               ac_bands: tuple = ((1, 5), (6, 63))) -> bytes:
    """Shared progressive writer; ``planes`` = [(raster, pw, ph, hf,
    vf)] — grayscale, 4:4:4, or subsampled 4:2:0. A nonzero
    ``restart_interval`` (in data units — MCUs for the interleaved DC
    scans, blocks for the per-component AC scans) emits DRI + RSTn in
    EVERY entropy scan, resetting DC predictors and flushing any open
    EOB run at each boundary — the progressive restart path the decoder
    implements is therefore two-sided-tested, not dead code.

    Grid note: the interleaved DC scans cover the MCU-PADDED block
    grid (edge-replicated blocks past a component's real extent — the
    decoder allocates and decodes them too), while the per-component AC
    scans cover only the REAL ceil(pw/8) x ceil(ph/8) grid, exactly the
    non-interleaved dimensions T.81 A.2.4 prescribes."""
    lq, cq = _quant_tables(quality)
    ncomp = len(planes)
    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # quantized zigzag coefficients over each component's PADDED grid,
    # plus its real-grid dims for the AC scans
    zz_all: list[list[list[int]]] = []
    grids: list[tuple[int, int, int, int]] = []  # (bw, bh, bw_real, bh_real)
    for ci, (plane, pw, ph, hf, vf) in enumerate(planes):
        qt = lq if ci == 0 else cq
        bw, bh = mcux * hf, mcuy * vf
        grids.append((bw, bh, -(-pw // 8), -(-ph // 8)))
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                blk = _plane_block(plane, pw, ph, bx, by)
                coef = _fdct2d([float(s - 128) for s in blk])
                q = [int(round(coef[i] / qt[i])) for i in range(64)]
                blocks.append([q[ZIGZAG[k]] for k in range(64)])
        zz_all.append(blocks)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes(lq[ZIGZAG[k]] for k in range(64)))
    if ncomp == 3:
        out += _seg(0xDB, b"\x01" + bytes(cq[ZIGZAG[k]] for k in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci, (_, _, _, hf, vf) in enumerate(planes):
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _dht_seg(0x00, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht_seg(0x10, _ENC_ACP_BITS, _ENC_ACP_VALS)
    if ncomp == 3:
        out += _dht_seg(0x01, _ENC_DC_BITS, _ENC_DC_VALS)
        out += _dht_seg(0x11, _ENC_ACP_BITS, _ENC_ACP_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    class _Rst:
        """Per-scan restart emitter: byte-align, write RSTn, cycle n."""

        def __init__(self, bw, on_boundary=None) -> None:
            self.bw, self.n, self.unit = bw, 0, 0
            self.on_boundary = on_boundary

        def step(self) -> bool:
            self.unit += 1
            if (restart_interval and self.unit % restart_interval == 0
                    and self.unit < self.total):
                if self.on_boundary:
                    self.on_boundary()
                self.bw.align_ones()
                self.bw.out += bytes([0xFF, 0xD0 + self.n])
                self.n = (self.n + 1) % 8
                return True
            return False

    def sos_hdr(comps_tabs: list, Ss: int, Se: int, Ah: int,
                Al: int) -> bytes:
        body = bytes([len(comps_tabs)])
        for (cid, tt) in comps_tabs:
            body += bytes([cid, tt])
        return _seg(0xDA, body + bytes([Ss, Se, (Ah << 4) | Al]))

    # MCU walk shared by both interleaved DC scans: per MCU, each
    # component contributes its hf x vf blocks from the padded grid
    mcu_steps = []
    for my in range(mcuy):
        for mx in range(mcux):
            step = []
            for ci, (_, _, _, hf, vf) in enumerate(planes):
                gbw = grids[ci][0]
                for by in range(vf):
                    for bx in range(hf):
                        step.append(
                            (ci, (my * vf + by) * gbw + mx * hf + bx))
            mcu_steps.append(step)

    # --- scan 1: DC first, interleaved, Al=levels ---
    out += sos_hdr([(ci + 1, 0x00 if ci == 0 else 0x11)
                    for ci in range(ncomp)], 0, 0, 0, levels)
    bw = _BitWriter()
    rst = _Rst(bw)
    rst.total = len(mcu_steps)
    preds = [0] * ncomp
    for step in mcu_steps:
        for (ci, bi) in step:
            # arithmetic shift: the DC point transform (T.81 G.1.2.1)
            v = zz_all[ci][bi][0] >> levels
            diff = v - preds[ci]
            preds[ci] = v
            size = _category(diff)
            length, code = _ENC_DC_MAP[size]
            bw.put(code, length)
            if size:
                bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
        if rst.step():
            preds = [0] * ncomp
    bw.align_ones()
    out += bw.out

    def real_blocks(ci: int) -> list:
        gbw, _, bwr, bhr = grids[ci]
        return [zz_all[ci][by * gbw + bx]
                for by in range(bhr) for bx in range(bwr)]

    def ac_first_scan(ci: int, Ss: int, Se: int, Al: int) -> bytes:
        bw = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            length, code = _ENC_ACP_MAP[r << 4]
            bw.put(code, length)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0

        blocks = real_blocks(ci)
        rst = _Rst(bw, on_boundary=flush_eob)
        rst.total = len(blocks)
        for blk in blocks:
            vals = []
            for k in range(Ss, Se + 1):
                a = abs(blk[k]) >> Al
                vals.append(a if blk[k] >= 0 else -a)
            last_nz = max((i for i, v in enumerate(vals) if v),
                          default=-1)
            if last_nz < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
            else:
                flush_eob()
                run = 0
                for i in range(last_nz + 1):
                    v = vals[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        lz, cz = _ENC_ACP_MAP[0xF0]
                        bw.put(cz, lz)
                        run -= 16
                    s = _category(v)
                    la, ca = _ENC_ACP_MAP[(run << 4) | s]
                    bw.put(ca, la)
                    bw.put(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < Se - Ss:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            rst.step()  # EOB runs may not span a restart: flushed first
        flush_eob()
        bw.align_ones()
        return bytes(bw.out)

    def ac_refine_scan(ci: int, Ss: int, Se: int, Al: int) -> bytes:
        # T.81 G.1.2.3 successive-approximation refinement with real
        # cross-block EOB runs: correction bits for blocks covered by a
        # pending run are buffered and emitted right after the EOBn
        # symbol, exactly where the decoder reads them.
        bw = _BitWriter()
        eobrun = 0
        br_bits: list[int] = []

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            length, code = _ENC_ACP_MAP[r << 4]
            bw.put(code, length)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0
            for b in br_bits:
                bw.put(b, 1)
            br_bits.clear()

        blocks = real_blocks(ci)
        rst = _Rst(bw, on_boundary=flush_eob)
        rst.total = len(blocks)
        for blk in blocks:
            # at this scan: temp = |coef| >> Al; temp == 1 <=> newly
            # nonzero (history = |coef| >> (Al+1) was zero), temp > 1
            # <=> history-nonzero needing a correction bit
            temps = [abs(blk[k]) >> Al for k in range(Ss, Se + 1)]
            signs = [blk[k] >= 0 for k in range(Ss, Se + 1)]
            last_new = max((i for i, t in enumerate(temps) if t == 1),
                           default=-1)
            run = 0
            pending: list[int] = []
            for i, t in enumerate(temps):
                if i > last_new:
                    break
                if t == 0:
                    run += 1
                    continue
                # ZRL emission happens at the FIRST nonzero after >15
                # zero-history skips — whether it is a correction-only
                # coefficient or a newly-nonzero one — so the buffered
                # bits drain in exactly the positional order the
                # decoder's skip-walk reads them
                while run > 15:
                    flush_eob()
                    lz, cz = _ENC_ACP_MAP[0xF0]
                    bw.put(cz, lz)
                    run -= 16
                    for b in pending:
                        bw.put(b, 1)
                    pending.clear()
                if t > 1:  # history-nonzero: one correction bit, r intact
                    pending.append(t & 1)
                    continue
                # newly nonzero (t == 1)
                flush_eob()
                la, ca = _ENC_ACP_MAP[(run << 4) | 1]
                bw.put(ca, la)
                bw.put(1 if signs[i] else 0, 1)
                for b in pending:
                    bw.put(b, 1)
                pending.clear()
                run = 0
            # tail: positions after the last newly-nonzero join the EOB
            # run; their history-nonzero correction bits ride the buffer.
            # A block whose band is COMPLETE at the last newly-nonzero
            # (nothing after it) needs no EOB at all — the decoder's k
            # walks past Se and never looks for one.
            if last_new < len(temps) - 1:
                br_bits.extend(temps[i] & 1
                               for i in range(last_new + 1, len(temps))
                               if temps[i] > 1)
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
            rst.step()  # EOB runs may not span a restart: flushed first
        flush_eob()
        bw.align_ones()
        return bytes(bw.out)

    for (Ss, Se) in ac_bands:
        for ci in range(ncomp):
            out += sos_hdr([(ci + 1, 0x10 if ci == 0 else 0x11)],
                           Ss, Se, 0, levels)
            out += ac_first_scan(ci, Ss, Se, levels)

    # --- refinement chain: one bit plane per pass, Ah=a+1 -> Al=a, until
    # every coefficient's low bit has landed (a=0). levels=1 is the
    # classic single-refinement script; levels>=2 produces the repeated
    # same-band refinements mainstream progressive scripts emit. ---
    for a in range(levels - 1, -1, -1):
        # DC refinement: one raw bit (plane a) per block, interleaved.
        # (v >> a) & 1 is the correct bit for negatives too: Python's
        # arithmetic shift + the decoder's |= reconstruct two's
        # complement exactly.
        out += sos_hdr([(ci + 1, 0x00) for ci in range(ncomp)],
                       0, 0, a + 1, a)
        bw = _BitWriter()
        rst = _Rst(bw)
        rst.total = len(mcu_steps)
        for step in mcu_steps:
            for (ci, bi) in step:
                bw.put((zz_all[ci][bi][0] >> a) & 1, 1)
            rst.step()
        bw.align_ones()
        out += bw.out

        for (Ss, Se) in ac_bands:
            for ci in range(ncomp):
                out += sos_hdr([(ci + 1, 0x10 if ci == 0 else 0x11)],
                               Ss, Se, a + 1, a)
                out += ac_refine_scan(ci, Ss, Se, a)

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _parse_dqt(body: bytes, qts: dict) -> None:
    """DQT segment body -> raster-order tables into ``qts`` (several
    tables may share one segment)."""
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        if pq != 0:
            raise ValueError("jpeg: 16-bit quant tables unsupported")
        zz = list(body[i + 1:i + 65])
        t = [0] * 64
        for k in range(64):
            t[ZIGZAG[k]] = zz[k]
        qts[tq] = t
        i += 65


def _parse_dht(body: bytes, dc_tabs: dict, ac_tabs: dict) -> None:
    """DHT segment body -> canonical decode tables."""
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        bits = list(body[i + 1:i + 17])
        n = sum(bits)
        vals = list(body[i + 17:i + 17 + n])
        (ac_tabs if tc else dc_tabs)[th] = _canonical_codes(bits, vals)
        i += 17 + n


def jpeg_decode(data: bytes):
    """Decode a JPEG — baseline sequential (SOF0/1) or progressive
    (SOF2, spectral selection + successive approximation). Returns
    (width, height, planes) where ``planes`` is a list of per-component
    w*h rasters of 0..255 ints — one plane for grayscale, (Y, Cb, Cr)
    upsampled to full resolution for color. Returns None when the
    payload is not a JPEG at all; raises ValueError on features outside
    this surface (arithmetic coding, lossless/hierarchical SOFs, 12-bit)
    rather than decoding garbage."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = None  # [(id, hf, vf, tq)]
    width = height = 0
    restart_interval = 0
    progressive = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip to the last 0xFF so the byte after it is the
        # actual code (a second 0xFF read as the code would misparse a
        # spec-legal file into a bogus segment length).
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            raise ValueError("jpeg: truncated after fill bytes")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            _parse_dqt(body, qts)
        elif marker == 0xC4:  # DHT
            _parse_dht(body, dc_tabs, ac_tabs)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                hf, vf = hv >> 4, hv & 0x0F
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise ValueError("jpeg: sampling factors beyond 2 "
                                     "unsupported")
                comps.append((cid, hf, vf, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: unsupported SOF (arithmetic/"
                             "lossless/hierarchical)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("jpeg: SOS before SOF")
            if progressive:
                return _decode_progressive(data, pos, body, comps, qts,
                                           dc_tabs, ac_tabs, width,
                                           height, restart_interval)
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                match = [c for c in comps if c[0] == cs]
                if not match:
                    raise ValueError("jpeg: scan references unknown "
                                     "component id")
                (cid, hf, vf, tq) = match[0]
                if (tq not in qts or (tt >> 4) not in dc_tabs
                        or (tt & 0x0F) not in ac_tabs):
                    raise ValueError("jpeg: scan references an undefined "
                                     "quant/Huffman table")
                scan.append((cid, hf, vf, qts[tq],
                             dc_tabs[tt >> 4], ac_tabs[tt & 0x0F]))
            return _decode_scan(data, pos, width, height, scan,
                                restart_interval)
        # APPn / COM / anything else: skipped
    raise ValueError("jpeg: no SOS marker found")


def _decode_scan(data: bytes, pos: int, width: int, height: int,
                 scan: list, restart_interval: int):
    hmax = max(s[1] for s in scan)
    vmax = max(s[2] for s in scan)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component padded plane dims (in blocks)
    planes = []
    for (_, hf, vf, _, _, _) in scan:
        planes.append([0] * (mcux * hf * 8 * mcuy * vf * 8))
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.restart()
                preds = [0] * len(scan)
            for ci, (_, hf, vf, qt, dct, act) in enumerate(scan):
                for by in range(vf):
                    for bx in range(hf):
                        coef = [0] * 64
                        size = _huff_decode(br, dct)
                        if size is None:
                            raise ValueError("jpeg: truncated entropy data")
                        bits = br.bits(size) if size else 0
                        if bits is None:
                            raise ValueError("jpeg: truncated entropy data")
                        preds[ci] += _extend(bits, size)
                        coef[0] = preds[ci] * qt[0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            if rs is None:
                                raise ValueError("jpeg: truncated entropy "
                                                 "data")
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 0x0F
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            bits = br.bits(s)
                            if bits is None:
                                raise ValueError("jpeg: truncated entropy "
                                                 "data")
                            coef[ZIGZAG[k]] = _extend(bits, s) * qt[ZIGZAG[k]]
                            k += 1
                        samples = _idct2d(coef)
                        pw = mcux * hf * 8
                        ox = (mx * hf + bx) * 8
                        oy = (my * vf + by) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row = oy + yy
                            plane[row * pw + ox:row * pw + ox + 8] = \
                                samples[yy * 8:yy * 8 + 8]
            mcu_count += 1
    # crop + upsample each component to full (width, height)
    out = []
    for ci, (_, hf, vf, _, _, _) in enumerate(scan):
        pw = mcux * hf * 8
        sx, sy = hmax // hf, vmax // vf  # 1 or 2 (nearest replication)
        plane = planes[ci]
        full = [0] * (width * height)
        for y in range(height):
            src_row = (y // sy) * pw
            frow = y * width
            for x in range(width):
                full[frow + x] = plane[src_row + x // sx]
        out.append(full)
    return (width, height, out)


def _decode_progressive(data: bytes, pos: int, sos_body: bytes, comps,
                        qts: dict, dc_tabs: dict, ac_tabs: dict,
                        width: int, height: int, restart_interval: int):
    """Progressive (SOF2) decode: T.81 G.2 spectral selection +
    successive approximation, the algorithm of every mainstream decoder
    (run/EOBRUN semantics per the widely-documented libjpeg phuff
    formulation — re-derived here from the spec text, not copied code).

    Coefficients accumulate across scans in per-component block grids;
    dequantize + IDCT + upsample happen once, after the last scan. DC
    scans may be interleaved; AC scans are per-component by spec. DHT /
    DQT / DRI segments between scans update the live tables. Restart
    markers reset DC predictors and the end-of-band run."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    grids = {}
    for (cid, hf, vf, tq) in comps:
        bw, bh = mcux * hf, mcuy * vf
        compw = -(-width * hf // hmax)
        comph = -(-height * vf // vmax)
        grids[cid] = {
            "hf": hf, "vf": vf, "tq": tq, "bw": bw,
            "bw_real": -(-compw // 8), "bh_real": -(-comph // 8),
            "coefs": [[0] * 64 for _ in range(bw * bh)],
        }

    def need(table: dict, idx: int, kind: str) -> dict:
        if idx not in table:
            raise ValueError(f"jpeg: scan references an undefined "
                             f"{kind} table")
        return table[idx]

    def dc_first(br, tabs, Al, order):
        # order: per restart unit, the (scan_ci, block) pairs it covers
        preds = [0] * len(tabs)
        unit = 0
        for step in order:
            if restart_interval and unit and unit % restart_interval == 0:
                br.restart()
                preds = [0] * len(preds)
            for (ci, coef) in step:
                dct = tabs[ci]
                size = _huff_decode(br, dct)
                if size is None:
                    raise ValueError("jpeg: truncated entropy data")
                bits = br.bits(size) if size else 0
                if bits is None:
                    raise ValueError("jpeg: truncated entropy data")
                preds[ci] += _extend(bits, size)
                coef[0] = preds[ci] << Al
            unit += 1

    def dc_refine(br, Al, order):
        unit = 0
        for step in order:
            if restart_interval and unit and unit % restart_interval == 0:
                br.restart()
            for (_, coef) in step:
                b = br.bit()
                if b is None:
                    raise ValueError("jpeg: truncated entropy data")
                if b:
                    coef[0] |= 1 << Al
            unit += 1

    def ac_first(br, act, Ss, Se, Al, blocks):
        eobrun = 0
        unit = 0
        for coef in blocks:
            if restart_interval and unit and unit % restart_interval == 0:
                br.restart()
                eobrun = 0
            unit += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            k = Ss
            while k <= Se:
                rs = _huff_decode(br, act)
                if rs is None:
                    raise ValueError("jpeg: truncated entropy data")
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = 1 << r
                    if r:
                        ext = br.bits(r)
                        if ext is None:
                            raise ValueError("jpeg: truncated entropy "
                                             "data")
                        eobrun += ext
                    eobrun -= 1  # current block is part of the run
                    break
                k += r
                if k > Se:
                    raise ValueError("jpeg: AC band index overflow")
                bits = br.bits(s)
                if bits is None:
                    raise ValueError("jpeg: truncated entropy data")
                coef[ZIGZAG[k]] = _extend(bits, s) << Al
                k += 1

    def ac_refine(br, act, Ss, Se, Al, blocks):
        p1, m1 = 1 << Al, -(1 << Al)

        def correct(coef, z):
            b = br.bit()
            if b is None:
                raise ValueError("jpeg: truncated entropy data")
            if b and not (coef[z] & p1):
                coef[z] += p1 if coef[z] >= 0 else m1

        eobrun = 0
        unit = 0
        for coef in blocks:
            if restart_interval and unit and unit % restart_interval == 0:
                br.restart()
                eobrun = 0
            unit += 1
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    rs = _huff_decode(br, act)
                    if rs is None:
                        raise ValueError("jpeg: truncated entropy data")
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:  # EOBn: run covers this block too
                            eobrun = 1 << r
                            if r:
                                ext = br.bits(r)
                                if ext is None:
                                    raise ValueError("jpeg: truncated "
                                                     "entropy data")
                                eobrun += ext
                            break
                        val = 0  # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("jpeg: refinement scan size "
                                             "must be 1")
                        b = br.bit()
                        if b is None:
                            raise ValueError("jpeg: truncated entropy "
                                             "data")
                        val = p1 if b else m1
                    while k <= Se:
                        z = ZIGZAG[k]
                        if coef[z] != 0:
                            correct(coef, z)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= Se:
                        coef[ZIGZAG[k]] = val
                    k += 1
            if eobrun > 0:
                while k <= Se:
                    z = ZIGZAG[k]
                    if coef[z] != 0:
                        correct(coef, z)
                    k += 1
                eobrun -= 1

    while True:
        # ---- one scan ----
        ns = sos_body[0]
        sc = []
        for si in range(ns):
            cs, tt = sos_body[1 + 2 * si], sos_body[2 + 2 * si]
            if cs not in grids:
                raise ValueError("jpeg: scan references unknown "
                                 "component id")
            sc.append((cs, tt >> 4, tt & 0x0F))
        off = 1 + 2 * ns
        Ss, Se = sos_body[off], sos_body[off + 1]
        Ah, Al = sos_body[off + 2] >> 4, sos_body[off + 2] & 0x0F
        br = _BitReader(data, pos)
        if Ss == 0:  # DC scan
            if Se != 0:
                raise ValueError("jpeg: DC scan must have Se=0")
            if ns > 1:  # interleaved: MCU order
                order = []
                for my in range(mcuy):
                    for mx in range(mcux):
                        step = []
                        for ci, (cid, _, _) in enumerate(sc):
                            g = grids[cid]
                            for by in range(g["vf"]):
                                for bx in range(g["hf"]):
                                    idx = ((my * g["vf"] + by) * g["bw"]
                                           + mx * g["hf"] + bx)
                                    step.append((ci, g["coefs"][idx]))
                        order.append(step)
            else:  # non-interleaved: the component's real grid
                cid = sc[0][0]
                g = grids[cid]
                order = [[(0, g["coefs"][by * g["bw"] + bx])]
                         for by in range(g["bh_real"])
                         for bx in range(g["bw_real"])]
            if Ah == 0:
                tabs = [need(dc_tabs, td, "DC Huffman")
                        for (_, td, _) in sc]
                dc_first(br, tabs, Al, order)
            else:
                dc_refine(br, Al, order)
        else:  # AC scan: single component by spec
            if ns != 1:
                raise ValueError("jpeg: AC scans must be non-interleaved")
            if Se > 63 or Ss > Se:
                raise ValueError("jpeg: bad spectral band")
            cid, _, ta = sc[0]
            g = grids[cid]
            act = need(ac_tabs, ta, "AC Huffman")
            blocks = [g["coefs"][by * g["bw"] + bx]
                      for by in range(g["bh_real"])
                      for bx in range(g["bw_real"])]
            if Ah == 0:
                ac_first(br, act, Ss, Se, Al, blocks)
            else:
                ac_refine(br, act, Ss, Se, Al, blocks)
        # ---- resume the marker walk after this scan's entropy data ----
        p = br.pos
        while p + 1 < len(data) and not (
                data[p] == 0xFF and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)):
            p += 1
        sos_body = None
        pos = p
        while pos + 2 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError("jpeg: expected marker between scans")
            while pos + 1 < len(data) and data[pos + 1] == 0xFF:
                pos += 1
            if pos + 2 > len(data):
                break
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI: done
                pos = len(data)
                break
            if pos + 4 > len(data):
                break
            (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
            body = data[pos + 4:pos + 2 + seglen]
            pos += 2 + seglen
            if marker == 0xDB:
                _parse_dqt(body, qts)
            elif marker == 0xC4:
                _parse_dht(body, dc_tabs, ac_tabs)
            elif marker == 0xDD:
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:
                sos_body = body
                break
            # APPn / COM: skipped
        if sos_body is None:
            break  # EOI or end of data: finalize

    # ---- dequantize + IDCT + assemble ----
    out = []
    for (cid, hf, vf, tq) in comps:
        g = grids[cid]
        qt = need(qts, tq, "quant")
        pw = g["bw"] * 8
        plane = [0] * (pw * mcuy * vf * 8)
        for by in range(g["bh_real"]):
            for bx in range(g["bw_real"]):
                coef = g["coefs"][by * g["bw"] + bx]
                deq = [coef[i] * qt[i] for i in range(64)]
                samples = _idct2d(deq)
                ox, oy = bx * 8, by * 8
                for yy in range(8):
                    row = oy + yy
                    plane[row * pw + ox:row * pw + ox + 8] = \
                        samples[yy * 8:yy * 8 + 8]
        sx, sy = hmax // hf, vmax // vf
        full = [0] * (width * height)
        for y in range(height):
            src_row = (y // sy) * pw
            frow = y * width
            for x in range(width):
                full[frow + x] = plane[src_row + x // sx]
        out.append(full)
    return (width, height, out)


def jpeg_gray_values(data: bytes) -> list[int] | None:
    """Luma/grayscale channel values of a baseline JPEG payload, or None
    when the payload is not a JPEG (the codec-chain contract shared with
    png_pixel_values / gif_pixel_values / wav_pcm_values)."""
    try:
        decoded = jpeg_decode(data)
    except (ValueError, IndexError, KeyError, StopIteration, struct.error):
        # real JPEG magic but outside the baseline surface, or truncated
        return None
    if decoded is None:
        return None
    _, _, planes = decoded
    return planes[0]


def jpeg_rgb_values(data: bytes) -> list[int] | None:
    """Interleaved (r, g, b, r, g, b, ...) values for a 3-component JPEG,
    grayscale replicated to three channels for 1-component payloads."""
    try:
        decoded = jpeg_decode(data)
    except (ValueError, IndexError, KeyError, StopIteration, struct.error):
        return None
    if decoded is None:
        return None
    _, _, planes = decoded
    if len(planes) == 1:
        return [v for v in planes[0] for _ in range(3)]
    yp, cb, cr = planes
    out = []
    for i in range(len(yp)):
        y, b, r = yp[i], cb[i] - 128, cr[i] - 128
        out.append(max(0, min(255, int(round(y + 1.402 * r)))))
        out.append(max(0, min(255, int(round(y - 0.344136 * b
                                             - 0.714136 * r)))))
        out.append(max(0, min(255, int(round(y + 1.772 * b)))))
    return out


# Executor-side import contract: every other codec in this package is a
# factory of NESTED functions precisely so mapInPandas closures cloudpickle
# them by value (workers have no clif_spark on sys.path — the driver loads
# __spark_entry__ by file path from a foreign cwd). This module's
# encoder/decoder pair is too interconnected (shared tables, bit I/O
# classes, mutual calls) for the nested-factory shape to stay readable, so
# it uses cloudpickle's sanctioned alternative: registering the whole
# module for BY-VALUE serialization. Any closure that captures a function
# from here then ships the code itself, not an import reference.
try:  # pragma: no cover - absent only outside a pyspark environment
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # noqa: BLE001 - plain-python use needs no registration
    pass
