"""Pure-stdlib ISO BMFF (MP4) container codec — box-level, no codec.

Real byte-level parsing of the MP4 container per ISO/IEC 14496-12
(public spec): box walk (moov/trak/mdia/minf/stbl), sample tables
(stsd fourcc + dimensions, stts timing, stsc chunk mapping, stsz sizes,
stco/co64 offsets), and frame extraction as the encoded sample payloads
at their absolute file offsets. This de-stubs video FRAME SAMPLING at
the container level: a pipeline can pull every k-th sample (+timestamp)
out of a real .mp4 without any codec library. Decoding the frame
PAYLOAD itself (h264 etc.) still requires a codec and stays stubbed —
except for the 'rawv' fourcc written by ``encode_mp4``, whose samples
are raw (h, w, 3) uint8 buffers, giving an end-to-end testable
round trip through the actor-pool stages.

The writer emits a minimal valid single-video-track file (ftyp + mdat +
moov with full sample tables, one chunk) so round-trip tests exercise
the same parse path a real camera/encoder file takes.
"""

from __future__ import annotations

import struct

import numpy as np


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B", version)
                + struct.pack(">I", flags)[1:] + payload)


def encode_mp4(frames: list[bytes], fps: int = 12, width: int = 8,
               height: int = 8, codec: bytes = b"rawv") -> bytes:
    """Frames (arbitrary per-sample byte payloads) -> minimal MP4."""
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8          # first sample starts here

    stsd_entry = _box(codec, (
        b"\x00" * 6 + struct.pack(">H", 1)       # data_reference_index
        + b"\x00" * 16                           # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)                   # frame_count
        + b"\x00" * 32                           # compressorname
        + struct.pack(">Hh", 24, -1)))           # depth, pre_defined
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0,
                 struct.pack(">I", 1) + struct.pack(">II", n, 1))
    stsc = _full(b"stsc", 0, 0,
                 struct.pack(">I", 1) + struct.pack(">III", 1, n, 1))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", 0, 0,
                 struct.pack(">I", 1) + struct.pack(">I", chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    dref = _full(b"dref", 0, 0,
                 struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"graft\x00")
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, fps, n)
                 + struct.pack(">HH", 0x55C4, 0))   # und language
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIIII", 0, 0, 1, 0, n)
                 + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, fps, n)
                 + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100)
                 + b"\x00" * 10
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for boxes in [start, end)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", data, i)
        tag = data[i + 4: i + 8]
        body = i + 8
        if size == 1:                     # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, i + 8)
            body = i + 16
        elif size == 0:                   # to end of enclosing box
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError("malformed box")
        yield tag, body, i + size
        i += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def parse_mp4(data: bytes) -> dict:
    """Parse the first video track's sample tables.

    Returns dict with codec (fourcc str), width, height, timescale,
    sample_sizes / sample_offsets / sample_times (numpy arrays).
    Raises ValueError for non-MP4 bytes, NotImplementedError when no
    video track is present."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (missing ftyp)")

    def find_all(tag, start, end, out):
        for t, b, e in _walk(data, start, end):
            if t == tag:
                out.append((b, e))
            elif t in _CONTAINERS:
                find_all(tag, b, e, out)

    traks: list[tuple[int, int]] = []
    find_all(b"trak", 0, len(data), traks)
    for tb, te in traks:
        info = _parse_track(data, tb, te)
        if info is not None:
            return info
    raise NotImplementedError("no video track found")


def _leaf(data, start, end, wanted):
    out = {}

    def rec(s, e):
        for t, b, be in _walk(data, s, e):
            if t in wanted:
                out[t] = (b, be)
            if t in _CONTAINERS:
                rec(b, be)
    rec(start, end)
    return out

def _parse_track(data: bytes, start: int, end: int):
    boxes = _leaf(data, start, end,
                  {b"hdlr", b"mdhd", b"stsd", b"stts", b"stsc",
                   b"stsz", b"stco", b"co64"})
    if b"hdlr" not in boxes:
        return None
    hb, _ = boxes[b"hdlr"]
    if data[hb + 8: hb + 12] != b"vide":
        return None
    for req in (b"mdhd", b"stsd", b"stts", b"stsz", b"stsc"):
        if req not in boxes:
            raise ValueError(f"video track missing {req.decode()}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("video track missing chunk offsets")

    mb, _ = boxes[b"mdhd"]
    version = data[mb]
    timescale = struct.unpack_from(
        ">I", data, mb + (20 if version == 1 else 12))[0]

    sb, _ = boxes[b"stsd"]
    entry_start = sb + 8
    (esize,) = struct.unpack_from(">I", data, entry_start)
    codec = data[entry_start + 4: entry_start + 8].decode("latin1")
    width, height = struct.unpack_from(">HH", data, entry_start + 32)

    tb, _ = boxes[b"stts"]
    (n_ent,) = struct.unpack_from(">I", data, tb + 4)
    ent = np.frombuffer(data, dtype=">u4", count=2 * n_ent,
                        offset=tb + 8).reshape(n_ent, 2).astype(np.int64)
    deltas = np.repeat(ent[:, 1], ent[:, 0])
    times = np.concatenate([[0], np.cumsum(deltas)[:-1]])

    zb, _ = boxes[b"stsz"]
    uniform, n_samples = struct.unpack_from(">II", data, zb + 4)
    if uniform:
        sizes = np.full(n_samples, uniform, dtype=np.int64)
    else:
        sizes = np.frombuffer(data, dtype=">u4", count=n_samples,
                              offset=zb + 12).astype(np.int64)

    if b"stco" in boxes:
        cb, _ = boxes[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", data, cb + 4)
        chunk_off = np.frombuffer(data, dtype=">u4", count=n_chunks,
                                  offset=cb + 8).astype(np.int64)
    else:
        cb, _ = boxes[b"co64"]
        (n_chunks,) = struct.unpack_from(">I", data, cb + 4)
        chunk_off = np.frombuffer(data, dtype=">u8", count=n_chunks,
                                  offset=cb + 8).astype(np.int64)

    scb, _ = boxes[b"stsc"]
    (n_stsc,) = struct.unpack_from(">I", data, scb + 4)
    stsc = np.frombuffer(data, dtype=">u4", count=3 * n_stsc,
                         offset=scb + 8).reshape(n_stsc, 3) \
        .astype(np.int64)
    # expand samples-per-chunk runs to a per-chunk count vector
    firsts = stsc[:, 0]                   # 1-based chunk index
    per = stsc[:, 1]
    run_ends = np.concatenate([firsts[1:], [n_chunks + 1]])
    counts = np.repeat(per, (run_ends - firsts))
    counts = counts[:n_chunks]
    if counts.sum() < n_samples:
        raise ValueError("stsc does not cover all samples")

    # absolute offset per sample: chunk base + cumulative sizes within
    chunk_idx = np.repeat(np.arange(n_chunks), counts)[:n_samples]
    within_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(n_samples) - within_start[chunk_idx]
    csum = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    chunk_sample_start = within_start[chunk_idx]
    offsets = chunk_off[chunk_idx] + (csum - csum[chunk_sample_start])
    _ = within  # within-chunk rank folded into the csum expression

    return {
        "codec": codec,
        "width": int(width),
        "height": int(height),
        "timescale": int(timescale),
        "n_samples": int(n_samples),
        "sample_sizes": sizes,
        "sample_offsets": offsets.astype(np.int64),
        "sample_times": times[:n_samples],
    }


def extract_frames(data: bytes, every_k: int = 1):
    """(frame_idx, time_seconds, payload bytes) for every k-th sample."""
    info = parse_mp4(data)
    idx = np.arange(0, info["n_samples"], every_k)
    out = []
    for i in idx:
        o = int(info["sample_offsets"][i])
        s = int(info["sample_sizes"][i])
        out.append((int(i),
                    float(info["sample_times"][i] / info["timescale"]),
                    data[o: o + s]))
    return info, out
