"""Pure-stdlib JPEG codec (ITU-T T.81 DCT, Huffman).

Decoder: baseline (SOF0/1) AND progressive (SOF2: spectral selection +
successive approximation, Annex G), 8-bit precision, grayscale or YCbCr
with any integer chroma sampling factors (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0
/ 4:1:1); DQT/DHT/DRI/RSTn honored. Arithmetic coding, 12-bit and
hierarchical streams raise ``NotImplementedError`` with a precise
reason. Two encoders write the subsets the decoder reads — baseline
(``encode_jpeg``, optional subsampling + restart interval) and
progressive (``encode_jpeg_progressive``, the common web scan script) —
and both emit the SAME quantized coefficients, so `decode(progressive)
== decode(baseline)` bit-for-bit at equal settings (pinned in tests);
round-trip error is bounded by quantization alone and testable
end-to-end through the multimodal actor-pool stages.

All constants (zigzag order, Annex K quantization tables, the standard
DC/AC Huffman tables, JFIF color transforms, the IJG quality scaling
formula) are public knowledge from the JPEG specification (ITU-T T.81
Annex K) and JFIF 1.02. The reference repo has no codecs — it treats
media as opaque bytes (SURVEY.md §2.6) — so nothing here derives from it.

Hot-path shape: the DCT/IDCT and (de)quantization are vectorized numpy
einsums over all 8x8 blocks at once; only the entropy (Huffman) layer is
a Python bit loop, which is inherent to the format's bit-serial coding
and sits inside the multimodal actor pool (per-image, not per-batch-row
Python in any relational path).
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants (ITU-T T.81 Annex K / JFIF) --------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# standard Huffman tables: (bits[1..16] counts, symbol values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_DCT = _dct_matrix()


def _canonical_codes(bits, values):
    """(counts per length 1..16, symbols) -> {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """Canonical codes keyed for decoding: {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def quality_tables(quality: int = 75):
    """IJG quality scaling of the Annex K tables; 100 -> all-ones
    (quantization-lossless, only DCT float rounding remains)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((_QUANT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((_QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., 0].astype(np.float64), px[..., 1].astype(np.float64),
               px[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y, cb, cr = planes[..., 0], planes[..., 1] - 128.0, planes[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) float plane -> (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (blocks.reshape(h8 // 8, w8 // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h8, w8))


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _encode_coef_block(zz: np.ndarray, dc_pred: int, dc_codes, ac_codes,
                       w: _BitWriter) -> int:
    """One zigzagged quantized block -> entropy bits; returns new DC."""
    dc = int(zz[0])
    diff = dc - dc_pred
    mag = abs(diff)
    size = mag.bit_length()
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.flatnonzero(zz[1:]) + 1
    prev = 0
    for idx in nz:
        run = int(idx) - prev - 1
        prev = int(idx)
        while run >= 16:
            code, length = ac_codes[0xF0]     # ZRL
            w.write(code, length)
            run -= 16
        v = int(zz[idx])
        mag = abs(v)
        size = mag.bit_length()
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
    if len(nz) == 0 or int(nz[-1]) != 63:
        code, length = ac_codes[0x00]         # EOB
        w.write(code, length)
    return dc


_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _box_downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-average downsample by integer factors (edge-padded to a
    multiple of the factor first) — the conventional JFIF chroma
    decimation."""
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    hh, ww = -(-h // fv) * fv, -(-w // fh) * fh
    p = np.pad(plane, ((0, hh - h), (0, ww - w)), mode="edge")
    return p.reshape(hh // fv, fv, ww // fh, fh).mean(axis=(1, 3))


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF bytes.

    ``subsampling`` selects the chroma layout for color images:
    "444" (no decimation, the original path), "422" (2x1 box-averaged
    chroma) or "420" (2x2 — the dominant web-crawl layout). Gray
    ignores it. Interleaved MCU order per ITU-T.81 A.2.3: the Y
    component contributes v*h blocks per MCU, chroma one each."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8 or px.ndim not in (2, 3) or \
            (px.ndim == 3 and px.shape[2] != 3):
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of "
                         f"{sorted(_SUBSAMPLING)}")
    h, w = px.shape[:2]
    gray = px.ndim == 2
    fh, fv = (1, 1) if gray else _SUBSAMPLING[subsampling]
    planes = (px.astype(np.float64)[..., None] if gray
              else _rgb_to_ycbcr(px))
    qluma, qchroma = quality_tables(quality)
    qtabs = [qluma] if gray else [qluma, qchroma]
    ncomp = 1 if gray else 3
    comp_q = [0] if gray else [0, 1, 1]
    comp_hv = [(fh, fv)] + [(1, 1)] * (ncomp - 1) if not gray \
        else [(1, 1)]

    mcus_x = -(-w // (8 * fh))
    mcus_y = -(-h // (8 * fv))

    # per-component padded planes + zigzagged quantized blocks in
    # raster block order (vectorized DCT once per component)
    zz_comp = []
    grid_cols = []
    for ci in range(ncomp):
        hi, vi = comp_hv[ci]
        plane = planes[..., ci]
        if ci > 0:
            plane = _box_downsample(plane, fh, fv)
        ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
        plane = np.pad(plane,
                       ((0, ph - plane.shape[0]),
                        (0, pw - plane.shape[1])), mode="edge")
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qtabs[comp_q[ci]].reshape(8, 8)
        zz_comp.append(np.round(coef / q).astype(np.int64)
                       .reshape(-1, 64)[:, ZIGZAG])
        grid_cols.append(mcus_x * hi)

    out = bytearray(b"\xFF\xD8")                                  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"        # APP0
    for tq, tab in enumerate(qtabs):                              # DQT
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in tab[ZIGZAG])
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8,
                                     h, w, ncomp)                 # SOF0
    for ci in range(ncomp):
        hi, vi = comp_hv[ci]
        out += struct.pack(">BBB", ci + 1, (hi << 4) | vi, comp_q[ci])
    huffs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        huffs += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, vals) in huffs:                             # DHT
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), tc_th) \
            + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)  # SOS
    for ci in range(ncomp):
        out += struct.pack(">BB", ci + 1,
                           0x00 if comp_q[ci] == 0 else 0x11)
    out += b"\x00\x3F\x00"

    dc_enc = [_canonical_codes(*_DC_LUMA),
              _canonical_codes(*_DC_CHROMA)]
    ac_enc = [_canonical_codes(*_AC_LUMA),
              _canonical_codes(*_AC_CHROMA)]
    writer = _BitWriter()
    preds = [0] * ncomp
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out += bytes(writer.buf)
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci in range(ncomp):
            hi, vi = comp_hv[ci]
            t = comp_q[ci]
            for v in range(vi):
                for hh in range(hi):
                    bidx = (my * vi + v) * grid_cols[ci] + mx * hi + hh
                    preds[ci] = _encode_coef_block(
                        zz_comp[ci][bidx], preds[ci], dc_enc[t],
                        ac_enc[t], writer)
    writer.flush()
    out += bytes(writer.buf)
    out += b"\xFF\xD9"                                            # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _read_symbol(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _destuff(data: bytes):
    """Entropy bytes with 0xFF00 destuffed, split at RSTn markers.
    Returns (segments, n_consumed)."""
    segs = []
    cur = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:       # RSTn: new entropy segment
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                           # real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> (H, W) or (H, W, 3) uint8."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs = {}
    dc_tabs, ac_tabs = {}, {}
    frame = None
    restart = 0
    i = 2
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("marker sync lost")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:              # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, i)
        body = payload[i + 2: i + seglen]
        i += seglen
        if marker == 0xDB:              # DQT (possibly several tables)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(body, dtype=np.uint8,
                                    count=64, offset=j + 1).astype(np.int64)
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = tab
                qtabs[tq] = raster
                j += 65
        elif marker == 0xC4:            # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1: j + 17])
                n = sum(bits)
                vals = list(body[j + 17: j + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:    # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            if nc not in (1, 3):
                raise NotImplementedError("only gray / 3-component YCbCr")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if any(hmax % c["h"] or vmax % c["v"] for c in comps):
                # covers every real-world layout (444/422/420/440/411);
                # fractional ratios would need resampling filters
                raise NotImplementedError(
                    "non-integer chroma sampling ratios")
            frame = {"h": h, "w": w, "comps": comps,
                     "hmax": hmax, "vmax": vmax}
        elif marker == 0xC2:            # SOF2 progressive (huffman)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            if nc not in (1, 3):
                raise NotImplementedError("only gray / 3-component YCbCr")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if any(hmax % c["h"] or vmax % c["v"] for c in comps):
                raise NotImplementedError(
                    "non-integer chroma sampling ratios")
            frame = {"h": h, "w": w, "comps": comps,
                     "hmax": hmax, "vmax": vmax, "progressive": True}
            return _decode_progressive(payload, i, frame, qtabs,
                                       dc_tabs, ac_tabs, restart)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/extended/arithmetic JPEG unsupported "
                "(baseline SOF0/1 + progressive SOF2 only)")
        elif marker == 0xDD:            # DRI
            (restart,) = struct.unpack(">H", body)
        elif marker == 0xDA:            # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 0x0F))
            segs, used = _destuff(payload[i:])
            i += used
            return _decode_scan(frame, scan, qtabs, dc_tabs, ac_tabs,
                                restart, segs)
    raise ValueError("no scan data found")


def _decode_scan(frame, scan, qtabs, dc_tabs, ac_tabs, restart, segs):
    """Interleaved baseline scan, general integer sampling factors
    (ITU-T.81 A.2.3): each MCU carries h*v blocks per component in
    raster order; subsampled components decode on their own block grid
    and are pixel-replicated back to full resolution (nearest-neighbor
    upsampling — JFIF leaves the filter unspecified)."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcu = mcus_x * mcus_y
    ncomp = len(scan)
    # per-component raster block grids
    grid_cols = [mcus_x * comp["h"] for comp, _, _ in scan]
    zz = [np.zeros((n_mcu * comp["h"] * comp["v"], 64), dtype=np.int64)
          for comp, _, _ in scan]

    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = [0] * ncomp
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            reader = _BitReader(segs[seg_idx])
            preds = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (comp, tdc, tac) in enumerate(scan):
            for v in range(comp["v"]):
                for hh in range(comp["h"]):
                    bidx = (my * comp["v"] + v) * grid_cols[ci] \
                        + mx * comp["h"] + hh
                    size = _read_symbol(reader, dc_tabs[tdc])
                    diff = _extend(reader.read_bits(size), size) \
                        if size else 0
                    preds[ci] += diff
                    row = zz[ci][bidx]
                    row[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = _read_symbol(reader, ac_tabs[tac])
                        if sym == 0x00:         # EOB
                            break
                        if sym == 0xF0:         # ZRL
                            k += 16
                            continue
                        run, size = sym >> 4, sym & 0x0F
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        row[k] = _extend(reader.read_bits(size), size)
                        k += 1

    planes = np.empty((h, w, ncomp), dtype=np.float64)
    inv = ZIGZAG.argsort()
    for ci, (comp, _, _) in enumerate(scan):
        q = qtabs[comp["tq"]]
        coef = (zz[ci][:, inv] * q).reshape(-1, 8, 8).astype(np.float64)
        blocks = np.einsum("ji,njk,kl->nil", _DCT, coef, _DCT) + 128.0
        ph, pw = mcus_y * comp["v"] * 8, mcus_x * comp["h"] * 8
        plane = _from_blocks(blocks, ph, pw)
        fv, fhx = vmax // comp["v"], hmax // comp["h"]
        if fv > 1 or fhx > 1:
            plane = np.repeat(np.repeat(plane, fv, axis=0), fhx, axis=1)
        planes[..., ci] = plane[:h, :w]
    if ncomp == 1:
        return np.clip(np.round(planes[..., 0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(planes)


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — ITU-T.81 Annex G, Huffman coding
# ---------------------------------------------------------------------------

def _comp_grid(frame, comp):
    """(grid_rows, grid_cols) of a component's MCU-padded block grid,
    plus its own (non-padded) block dims for non-interleaved scans."""
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    grid_rows, grid_cols = mcus_y * comp["v"], mcus_x * comp["h"]
    comp_w = -(-frame["w"] * comp["h"] // hmax)
    comp_h = -(-frame["h"] * comp["v"] // vmax)
    own_rows, own_cols = -(-comp_h // 8), -(-comp_w // 8)
    return grid_rows, grid_cols, own_rows, own_cols


def _prog_dc_scan(frame, scan, coefs, dc_tabs, ah, al, restart, segs):
    """DC scan (Ss=Se=0): interleaved MCU order when several components
    participate, the component's own block raster otherwise. First pass
    (Ah=0) decodes diffs at point transform Al; refinement ORs one bit
    per block."""
    reader = _BitReader(segs[0])
    seg_idx = 0
    preds = [0] * len(scan)
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))

    def one_block(ci, comp, tdc, bidx):
        nonlocal preds
        row = coefs[comp["id"]][bidx]
        if ah == 0:
            size = _read_symbol(reader, dc_tabs[tdc])
            diff = _extend(reader.read_bits(size), size) if size else 0
            preds[ci] += diff
            row[0] = preds[ci] << al
        else:
            if reader.read_bits(1):
                row[0] |= (1 << al)

    if len(scan) > 1:
        n_mcu = mcus_x * mcus_y
        for m in range(n_mcu):
            if restart and m and m % restart == 0:
                seg_idx += 1
                reader = _BitReader(segs[seg_idx])
                preds = [0] * len(scan)
            my, mx = divmod(m, mcus_x)
            for ci, (comp, tdc, _tac) in enumerate(scan):
                gcols = mcus_x * comp["h"]
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        one_block(ci, comp, tdc,
                                  (my * comp["v"] + v) * gcols
                                  + mx * comp["h"] + hh)
    else:
        comp, tdc, _tac = scan[0]
        _gr, gcols, own_rows, own_cols = _comp_grid(frame, comp)
        for m in range(own_rows * own_cols):
            if restart and m and m % restart == 0:
                seg_idx += 1
                reader = _BitReader(segs[seg_idx])
                preds = [0]
            r, c = divmod(m, own_cols)
            one_block(0, comp, tdc, r * gcols + c)


def _prog_ac_scan(frame, scan, coefs, ac_tabs, ss, se, ah, al,
                  restart, segs):
    """AC scan: single component only (T.81 G.1.1.1.1), blocks in the
    component's own raster order, with EOB-run coding; Ah>0 is the
    successive-approximation refinement pass."""
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    comp, _tdc, tac = scan[0]
    tab = ac_tabs[tac]
    _gr, gcols, own_rows, own_cols = _comp_grid(frame, comp)
    reader = _BitReader(segs[0])
    seg_idx = 0
    eobrun = 0
    p1 = 1 << al
    for m in range(own_rows * own_cols):
        if restart and m and m % restart == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            eobrun = 0
        r0, c0 = divmod(m, own_cols)
        row = coefs[comp["id"]][r0 * gcols + c0]
        if ah == 0:
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _read_symbol(reader, tab)
                rr, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if rr < 15:
                        eobrun = (1 << rr) - 1
                        if rr:
                            eobrun += reader.read_bits(rr)
                        break
                    k += 16                       # ZRL
                else:
                    k += rr
                    if k > se:
                        raise ValueError("AC run past band end")
                    row[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
        else:
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _read_symbol(reader, tab)
                    rr, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if rr < 15:
                            eobrun = 1 << rr
                            if rr:
                                eobrun += reader.read_bits(rr)
                            break
                        val = 0                    # ZRL: skip 16 zeros
                    else:
                        val = p1 if reader.read_bits(1) else -p1
                    while k <= se:
                        if row[k] != 0:
                            if reader.read_bits(1) and \
                                    (row[k] & p1) == 0:
                                row[k] += p1 if row[k] > 0 else -p1
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if s and k <= se:
                        row[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if row[k] != 0:
                        if reader.read_bits(1) and (row[k] & p1) == 0:
                            row[k] += p1 if row[k] > 0 else -p1
                    k += 1
                eobrun -= 1


def _decode_progressive(payload, i, frame, qtabs, dc_tabs, ac_tabs,
                        restart):
    """Continue marker parsing from offset ``i`` (just past SOF2),
    folding every scan into per-component zigzag coefficient arrays,
    then dequantize + IDCT once at EOI."""
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    coefs = {c["id"]: np.zeros((mcus_y * c["v"] * mcus_x * c["h"], 64),
                               dtype=np.int64)
             for c in frame["comps"]}
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("marker sync lost")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:                         # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, i)
        body = payload[i + 2: i + seglen]
        i += seglen
        if marker == 0xC4:                         # DHT (between scans)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1: j + 17])
                n = sum(bits)
                vals = list(body[j + 17: j + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(body, dtype=np.uint8, count=64,
                                    offset=j + 1).astype(np.int64)
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = tab
                qtabs[tq] = raster
                j += 65
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body)
        elif marker == 0xDA:                       # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, used = _destuff(payload[i:])
            i += used
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan with Se != 0")
                _prog_dc_scan(frame, scan, coefs, dc_tabs, ah, al,
                              restart, segs)
            else:
                _prog_ac_scan(frame, scan, coefs, ac_tabs, ss, se,
                              ah, al, restart, segs)
    # reconstruct — same dequantize/IDCT/upsample tail as the baseline
    h, w = frame["h"], frame["w"]
    ncomp = len(frame["comps"])
    planes = np.empty((h, w, ncomp), dtype=np.float64)
    inv = ZIGZAG.argsort()
    for ci, comp in enumerate(frame["comps"]):
        q = qtabs[comp["tq"]]
        zzc = coefs[comp["id"]]
        coef = (zzc[:, inv] * q).reshape(-1, 8, 8).astype(np.float64)
        blocks = np.einsum("ji,njk,kl->nil", _DCT, coef, _DCT) + 128.0
        ph, pw = mcus_y * comp["v"] * 8, mcus_x * comp["h"] * 8
        plane = _from_blocks(blocks, ph, pw)
        fv, fhx = vmax // comp["v"], hmax // comp["h"]
        if fv > 1 or fhx > 1:
            plane = np.repeat(np.repeat(plane, fv, axis=0), fhx, axis=1)
        planes[..., ci] = plane[:h, :w]
    if ncomp == 1:
        return np.clip(np.round(planes[..., 0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(planes)


# ---------------------------------------------------------------------------
# progressive (SOF2) encoding — spectral selection + successive
# approximation (T.81 Annex G), used for fixtures and re-encode pipelines
# ---------------------------------------------------------------------------

def _quantized_blocks(px: np.ndarray, quality: int, subsampling: str):
    """Shared front half of both encoders: returns (gray, ncomp,
    comp_q, comp_hv, qtabs, zz_comp, grid_cols, mcus_x, mcus_y)."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of "
                         f"{sorted(_SUBSAMPLING)}")
    h, w = px.shape[:2]
    gray = px.ndim == 2
    fh, fv = (1, 1) if gray else _SUBSAMPLING[subsampling]
    planes = (px.astype(np.float64)[..., None] if gray
              else _rgb_to_ycbcr(px))
    qluma, qchroma = quality_tables(quality)
    qtabs = [qluma] if gray else [qluma, qchroma]
    ncomp = 1 if gray else 3
    comp_q = [0] if gray else [0, 1, 1]
    comp_hv = [(fh, fv)] + [(1, 1)] * (ncomp - 1) if not gray \
        else [(1, 1)]
    mcus_x = -(-w // (8 * fh))
    mcus_y = -(-h // (8 * fv))
    zz_comp, grid_cols = [], []
    for ci in range(ncomp):
        hi, vi = comp_hv[ci]
        plane = planes[..., ci]
        if ci > 0:
            plane = _box_downsample(plane, fh, fv)
        ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
        plane = np.pad(plane,
                       ((0, ph - plane.shape[0]),
                        (0, pw - plane.shape[1])), mode="edge")
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qtabs[comp_q[ci]].reshape(8, 8)
        zz_comp.append(np.round(coef / q).astype(np.int64)
                       .reshape(-1, 64)[:, ZIGZAG])
        grid_cols.append(mcus_x * hi)
    return (gray, ncomp, comp_q, comp_hv, qtabs, zz_comp, grid_cols,
            mcus_x, mcus_y)


def _own_blocks(h, w, hi, vi, hmax, vmax):
    comp_w = -(-w * hi // hmax)
    comp_h = -(-h * vi // vmax)
    return -(-comp_h // 8), -(-comp_w // 8)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90,
                            subsampling: str = "444") -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> progressive (SOF2) JFIF
    bytes: interleaved DC scan at successive-approximation Al=1 + DC
    refinement, then per component two spectral AC bands (1-5, 6-63) at
    Al=1 with their refinement passes — the common "progressive web
    JPEG" scan script shape. Encodes the SAME quantized coefficients as
    the baseline encoder, so `decode_jpeg(progressive) ==
    decode_jpeg(baseline)` bit-for-bit at equal quality/subsampling
    (the round-trip gate in tests/test_jpeg.py)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8 or px.ndim not in (2, 3) or \
            (px.ndim == 3 and px.shape[2] != 3):
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    h, w = px.shape[:2]
    (gray, ncomp, comp_q, comp_hv, qtabs, zz_comp, grid_cols,
     mcus_x, mcus_y) = _quantized_blocks(px, quality, subsampling)
    hmax = max(hv[0] for hv in comp_hv)
    vmax = max(hv[1] for hv in comp_hv)

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, tab in enumerate(qtabs):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in tab[ZIGZAG])
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8,
                                     h, w, ncomp)                 # SOF2
    for ci in range(ncomp):
        hi, vi = comp_hv[ci]
        out += struct.pack(">BBB", ci + 1, (hi << 4) | vi, comp_q[ci])
    huffs = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        huffs += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, vals) in huffs:
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(vals), tc_th) \
            + bytes(bits) + bytes(vals)

    dc_enc = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_enc = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    def sos_header(comp_ids, ss, se, ah, al):
        ns = len(comp_ids)
        hdr = b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ns, ns)
        for cid in comp_ids:
            t = comp_q[cid - 1]
            hdr += struct.pack(">BB", cid, (t << 4) | t)
        return hdr + struct.pack(">BBB", ss, se, (ah << 4) | al)

    def dc_block_order():
        """(ci, block_index) sequence in interleaved MCU order."""
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for ci in range(ncomp):
                hi, vi = comp_hv[ci]
                for v in range(vi):
                    for hh in range(hi):
                        yield ci, ((my * vi + v) * grid_cols[ci]
                                   + mx * hi + hh)

    # ---- scan 1: DC first, Al=1 ----
    al = 1
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 0, al)
    wtr = _BitWriter()
    preds = [0] * ncomp
    for ci, bidx in dc_block_order():
        val = int(zz_comp[ci][bidx][0]) >> al     # arithmetic shift (G.1.2.1)
        diff = val - preds[ci]
        preds[ci] = val
        mag = abs(diff)
        size = mag.bit_length()
        code, length = dc_enc[comp_q[ci]][size]
        wtr.write(code, length)
        if size:
            wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    wtr.flush()
    out += bytes(wtr.buf)

    # ---- scan 2: DC refinement, Ah=1 Al=0 ----
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    wtr = _BitWriter()
    for ci, bidx in dc_block_order():
        wtr.write(int(zz_comp[ci][bidx][0]) & 1, 1)
    wtr.flush()
    out += bytes(wtr.buf)

    # ---- AC scans per component: bands (1..5), (6..63), Al=1 then refine
    def ac_first(ci, ss, se, al):
        tabe = ac_enc[comp_q[ci]]
        hi, vi = comp_hv[ci]
        own_rows, own_cols = _own_blocks(h, w, hi, vi, hmax, vmax)
        wtr = _BitWriter()
        for m in range(own_rows * own_cols):
            r0, c0 = divmod(m, own_cols)
            row = zz_comp[ci][r0 * grid_cols[ci] + c0]
            run = 0
            last_written = ss - 1
            for k in range(ss, se + 1):
                v = int(row[k])
                t = (abs(v) >> al)                # magnitude shift (G.1.2.2)
                if t == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, length = tabe[0xF0]
                    wtr.write(code, length)
                    run -= 16
                sv = t if v > 0 else -t
                size = t.bit_length()
                code, length = tabe[(run << 4) | size]
                wtr.write(code, length)
                wtr.write(sv if sv >= 0 else sv + (1 << size) - 1, size)
                run = 0
                last_written = k
            if last_written != se:
                code, length = tabe[0x00]         # EOB (run of 1)
                wtr.write(code, length)
        wtr.flush()
        return bytes(wtr.buf)

    def ac_refine(ci, ss, se, al):
        tabe = ac_enc[comp_q[ci]]
        hi, vi = comp_hv[ci]
        own_rows, own_cols = _own_blocks(h, w, hi, vi, hmax, vmax)
        wtr = _BitWriter()
        for m in range(own_rows * own_cols):
            r0, c0 = divmod(m, own_cols)
            row = zz_comp[ci][r0 * grid_cols[ci] + c0]
            # positional event queue since the last emitted symbol:
            # None = zero-history coefficient (counts toward the run),
            # int  = correction bit of an already-significant one.
            # A ZRL covers exactly 16 zero-history positions and ONLY
            # the correction bits interleaved within them — bits beyond
            # the 16th zero belong to the next symbol's walk.
            events: list = []
            for k in range(ss, se + 1):
                v = int(row[k])
                t = abs(v) >> al
                if t == 0:
                    events.append(None)
                    continue
                if t > 1:
                    events.append(t & 1)
                    continue
                while sum(1 for e in events if e is None) >= 16:
                    code, length = tabe[0xF0]     # ZRL
                    wtr.write(code, length)
                    zeros = 0
                    while zeros < 16:
                        e = events.pop(0)
                        if e is None:
                            zeros += 1
                        else:
                            wtr.write(e, 1)
                    # corrections adjacent to the 16th zero (before the
                    # next zero-history position) are consumed by the
                    # decoder's ZRL walk only up TO that zero; leave
                    # the rest queued for the next symbol
                run = sum(1 for e in events if e is None)
                code, length = tabe[(run << 4) | 1]
                wtr.write(code, length)
                wtr.write(1 if v > 0 else 0, 1)   # sign bit
                for e in events:
                    if e is not None:
                        wtr.write(e, 1)
                events = []
            if events:
                code, length = tabe[0x00]         # EOB (run of 1)
                wtr.write(code, length)
                for e in events:
                    if e is not None:
                        wtr.write(e, 1)
        wtr.flush()
        return bytes(wtr.buf)

    bands = [(1, 5), (6, 63)]
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos_header([ci + 1], ss, se, 0, 1)
            out += ac_first(ci, ss, se, 1)
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos_header([ci + 1], ss, se, 1, 0)
            out += ac_refine(ci, ss, se, 0)

    out += b"\xFF\xD9"
    return bytes(out)
