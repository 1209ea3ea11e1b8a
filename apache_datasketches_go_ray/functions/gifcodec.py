"""Pure-stdlib GIF87a/89a codec (LZW, single frame).

Decoder: global or local color table, variable-width LZW per the GIF89a
specification Appendix F, extension blocks skipped (graphic-control
transparency ignored — the pipeline treats frames as opaque RGB).
Interlaced images raise ``NotImplementedError`` with a precise reason.
Output is an (h, w, 3) uint8 array via palette lookup.

Encoder: writes exactly the subset the decoder reads — one frame, a
global color table built from the image's distinct colors (<= 256
required), and the classic fixed-width LZW stream that emits one
literal code per pixel with a clear code before the dictionary would
force a width increase. Larger than real LZW output but fully valid,
deterministic, and round-trips bit-exact (palette lookup is lossless).

The GIF format layout and LZW algorithm are public knowledge from the
CompuServe GIF89a specification. The reference repo has no codecs — it
treats media as opaque bytes (SURVEY.md §2.6) — so nothing here derives
from it.

Hot-path shape: the LZW symbol loop is a Python loop, inherent to the
format's serial dictionary coding; it runs per-image inside the
multimodal actor pool (never per-row in a relational path). Palette
application and de-palettization are vectorized numpy takes.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF87 = b"GIF87a"
_GIF89 = b"GIF89a"


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF89a Appendix F) -> uint8 index array."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader over the whole sub-block-joined stream
    bits = 0
    n_bits = 0
    pos = 0
    width = min_code_size + 1
    # dictionary: store (prefix_code, first_byte, length) and materialize
    # strings lazily via parent chain into the output buffer
    parent = np.full(4096, -1, dtype=np.int32)
    tail = np.zeros(4096, dtype=np.uint8)
    length = np.zeros(4096, dtype=np.int32)
    for c in range(clear):
        tail[c] = c
        length[c] = 1
    next_code = end + 1
    prev = -1

    def emit(code: int, at: int) -> int:
        # walk the parent chain backwards, filling out[at:at+L]
        L = int(length[code])
        i = at + L
        c = code
        while c >= 0:
            i -= 1
            out[i] = tail[c]
            c = int(parent[c])
        return at + L

    data_len = len(data)
    while n_out < n_pixels:
        while n_bits < width:
            if pos >= data_len:
                raise ValueError("truncated LZW stream")
            bits |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = bits & ((1 << width) - 1)
        bits >>= width
        n_bits -= width
        if code == clear:
            next_code = end + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= next_code:
                raise ValueError("invalid first LZW code")
            n_out = emit(code, n_out)
            prev = code
            continue
        if code < next_code:
            n_out = emit(code, n_out)
            first = out[n_out - int(length[code])]
        elif code == next_code:
            # KwKwK case: prev string + its first byte
            first = out[n_out - int(length[prev])]
            n_out = emit(prev, n_out)
            if n_out < n_pixels:
                out[n_out] = first
            n_out += 1
        else:
            raise ValueError("LZW code out of range")
        if next_code < 4096:
            parent[next_code] = prev
            tail[next_code] = (first if code >= next_code
                               else out[n_out - int(length[code])])
            length[next_code] = length[prev] + 1
            next_code += 1
            # early change: the decoder's dictionary lags the encoder's
            # by one code, so the width bump happens at 2^width - 1
            if width < 12 and next_code == (1 << width) - 1:
                width += 1
        prev = code
    return out[:n_pixels]


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a stream -> (h, w, 3) uint8 RGB."""
    if payload[:6] not in (_GIF87, _GIF89):
        raise ValueError("not a GIF stream")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload,
                                                      pos)
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                  offset=pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code_size, w * h)
        if idx.max(initial=0) >= len(table):
            raise ValueError("palette index out of range")
        return table[idx].reshape(h, w, 3)
    raise ValueError("GIF stream has no image block")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_gif(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB with <= 256 distinct colors -> GIF89a bytes.

    Fixed-width LZW: one literal code per pixel, a clear code whenever
    the dictionary counter would widen codes — valid for every decoder,
    bit-exact round-trip through ``decode_gif``.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_gif expects (h, w, 3) RGB")
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise NotImplementedError(
            "encode_gif writes palettized GIF; quantize to <= 256 colors")
    # palette size = 2^(mcs) with mcs >= 2 per the LZW minimum
    mcs = max(2, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << mcs
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[:len(colors)] = colors
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1

    # emit codes LSB-first; clear before next_code hits 2^width so the
    # width never changes
    out_bits = bytearray()
    bits = 0
    n_bits = 0

    def put(code: int):
        nonlocal bits, n_bits
        bits |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out_bits.append(bits & 0xFF)
            bits >>= 8
            n_bits -= 8

    put(clear)
    budget = (1 << width) - end - 2  # codes before a width increase
    counter = 0
    for v in inverse.astype(np.int64):
        put(int(v))
        counter += 1
        if counter >= budget:
            put(clear)
            counter = 0
    put(end)
    if n_bits:
        out_bits.append(bits & 0xFF)

    head = _GIF89 + struct.pack("<HHBBB", w, h, 0x80 | (mcs - 1), 0, 0)
    body = bytearray(head)
    body += pal.tobytes()
    body += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    body += bytes([mcs])
    data = bytes(out_bits)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        body += bytes([len(chunk)]) + chunk
    body += b"\x00\x3B"
    return bytes(body)
