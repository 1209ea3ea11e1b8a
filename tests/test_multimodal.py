"""Multimodal plumbing: frame sampling emits the right rows and the
feature stage is deterministic (codecs stay stubbed; the Ray-side
schema/batching is what's real and tested)."""

import numpy as np
import ray.data

from apache_datasketches_go_ray.stages.multimodal import (
    frame_pipeline, make_fake_video_batch,
)


def test_frame_sampling_rows_and_determinism(ray_session):
    media = make_fake_video_batch(list(range(6)), n_frames=24)
    out = frame_pipeline(ray.data.from_arrow(media), every_k=6,
                         batch_size=3).to_pandas() \
        .sort_values(["media_id", "frame_idx"], ignore_index=True)
    # 24 frames sampled every 6 -> frames 0, 6, 12, 18 per video
    assert len(out) == 6 * 4
    assert sorted(out["frame_idx"].unique()) == [0, 6, 12, 18]
    # per-frame features: 3-channel mean + std = 6 floats
    feats = [np.frombuffer(x, dtype=np.float32) for x in out["features"]]
    assert all(len(f) == 6 for f in feats)
    # deterministic across runs
    out2 = frame_pipeline(ray.data.from_arrow(media), every_k=6,
                          batch_size=3).to_pandas() \
        .sort_values(["media_id", "frame_idx"], ignore_index=True)
    feats2 = [np.frombuffer(x, dtype=np.float32) for x in out2["features"]]
    assert all((a == b).all() for a, b in zip(feats, feats2))


def test_wav_bmp_roundtrip_exact():
    """Real self-contained codecs: encode -> decode reproduces the
    arrays bit-exactly (no codec libraries involved)."""
    import numpy as np

    from apache_datasketches_go_ray.stages.multimodal import (
        _decode_bmp,
        _decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(5)
    mono = rng.integers(-30000, 30000, size=1234).astype(np.int16)
    assert np.array_equal(_decode_wav(encode_wav(mono, 8000)), mono)
    stereo = rng.integers(-30000, 30000, size=(500, 2)).astype(np.int16)
    assert np.array_equal(_decode_wav(encode_wav(stereo, 44100)), stereo)
    # odd width forces BMP row padding
    px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert np.array_equal(_decode_bmp(encode_bmp(px)), px)


def test_decode_stage_real_formats(ray_session):
    """DecodeStage on REAL WAV/BMP payloads through Ray: decoded bytes
    reconstruct the original arrays exactly."""
    import json

    import numpy as np
    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        DecodeStage,
        _decode_wav,
        make_real_media_batch,
    )

    tbl = make_real_media_batch(list(range(24)), kind="audio/wav")
    out = (ray.data.from_arrow(tbl)
           .map_batches(DecodeStage, fn_constructor_args=(False,),
                        batch_size=8, concurrency=2,
                        batch_format="pyarrow", zero_copy_batch=True)
           .to_pandas().sort_values("media_id", ignore_index=True))
    assert len(out) == 24
    for _, row in out.iterrows():
        shape = json.loads(row["decoded_shape"])
        arr = np.frombuffer(row["decoded"], dtype=shape["dtype"]) \
            .reshape(shape["shape"])
        assert np.array_equal(arr, _decode_wav(row["media"]))

    btbl = make_real_media_batch(list(range(8)), kind="image/bmp")
    bout = (ray.data.from_arrow(btbl)
            .map_batches(DecodeStage, fn_constructor_args=(False,),
                         batch_size=4, concurrency=2,
                         batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas())
    assert len(bout) == 8
    sh = json.loads(bout.loc[0, "decoded_shape"])
    assert sh["shape"] == [12, 17, 3] and sh["dtype"] == "uint8"


def test_png_roundtrip_exact():
    """Pure-stdlib PNG codec: encode -> decode is bit-exact for
    non-interlaced 8-bit gray / gray+alpha / RGB / RGBA."""
    import numpy as np

    from apache_datasketches_go_ray.stages.multimodal import (
        _decode_png,
        encode_png,
    )

    rng = np.random.default_rng(9)
    for shape in [(7, 11), (7, 11, 2), (9, 13, 3), (5, 8, 4), (1, 1, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(_decode_png(encode_png(px)), px), shape


def test_png_all_filter_types_decode():
    """Hand-build a PNG whose scanlines use every filter type (None,
    Sub, Up, Average, Paeth) and check the decoder reconstructs the
    target image — the unfilter path, not just the filter-0 fast path."""
    import struct
    import zlib

    import numpy as np

    from apache_datasketches_go_ray.stages.multimodal import (
        _PNG_SIG,
        _decode_png,
        _png_chunk,
    )

    rng = np.random.default_rng(3)
    h, w, c = 5, 6, 3
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    flat = px.reshape(h, w * c).astype(np.int32)
    rows = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            filt = cur - ((left + prev) >> 1)
        else:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            filt = cur - pred
        rows.append(bytes([ftype]) + (filt & 0xFF).astype(np.uint8)
                    .tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + _png_chunk(b"IEND", b""))
    assert np.array_equal(_decode_png(payload), px)


def test_decode_stage_real_png(ray_session):
    """DecodeStage on REAL PNG payloads through Ray: the former stub
    path now decodes without fake=True."""
    import json

    import numpy as np
    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        DecodeStage,
        make_real_media_batch,
    )

    tbl = make_real_media_batch(list(range(6)), kind="image/png")
    out = (ray.data.from_arrow(tbl)
           .map_batches(DecodeStage, fn_constructor_args=(False,),
                        concurrency=2, batch_size=3,
                        batch_format="pyarrow")
           .take_all())
    assert len(out) == 6
    for r in out:
        info = json.loads(r["decoded_shape"])
        assert tuple(info["shape"]) == (12, 17, 3)
        assert info["dtype"] == "uint8"
        arr = np.frombuffer(r["decoded"], dtype=np.uint8) \
            .reshape(info["shape"])
        assert arr.shape == (12, 17, 3)


# ---------------------------------------------------------------------------
# GIF codec
# ---------------------------------------------------------------------------

def _lzw_encode_greedy(indices, mcs):
    """Real (dictionary-building) LZW encoder, test-local: exercises the
    decoder's KwKwK and width-growth paths our fixed-width engine
    encoder never produces."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out, bits, n_bits, width = bytearray(), 0, 0, mcs + 1

    def put(code):
        nonlocal bits, n_bits, width
        bits |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            n_bits -= 8

    table = {(c,): c for c in range(clear)}
    next_code = end + 1
    put(clear)
    cur = ()
    for v in indices:
        cand = cur + (int(v),)
        if cand in table:
            cur = cand
            continue
        put(table[cur])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code < 4096 and next_code == (1 << width):
                width += 1
        cur = (int(v),)
    if cur:
        put(table[cur])
    put(end)
    if n_bits:
        out.append(bits & 0xFF)
    return bytes(out)


def test_gif_roundtrip_and_real_lzw():
    import numpy as np

    from apache_datasketches_go_ray.functions.gifcodec import (
        _lzw_decode, decode_gif, encode_gif)

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 7, size=(23, 31))]
    assert np.array_equal(decode_gif(encode_gif(px)), px)
    # 1-color and 256-color edges
    one = np.full((4, 5, 3), 9, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(one)), one)
    big_pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    bigpx = big_pal[rng.integers(0, 256, size=(16, 16))]
    assert np.array_equal(decode_gif(encode_gif(bigpx)), bigpx)
    # real greedy-LZW streams (KwKwK + width growth) decode correctly,
    # including the classic KwKwK opener and long repetitive runs
    for seq in ([0, 1, 0, 1, 0, 1, 0],
                [1, 1, 1, 1, 1, 1, 1, 1, 1],
                list(rng.integers(0, 4, size=5000))):
        enc = _lzw_encode_greedy(seq, 2)
        got = _lzw_decode(enc, 2, len(seq))
        assert got.tolist() == [int(x) for x in seq]


def test_decode_stage_real_gif(ray_session):
    import json

    import numpy as np
    import ray.data

    from apache_datasketches_go_ray.functions.gifcodec import decode_gif
    from apache_datasketches_go_ray.stages.multimodal import (
        DecodeStage, make_real_media_batch)

    tbl = make_real_media_batch([1, 2, 3], kind="image/gif")
    out = ray.data.from_arrow(tbl).map_batches(
        DecodeStage, fn_constructor_kwargs={"fake": False},
        batch_format="pyarrow", concurrency=(1, 2)).take_all()
    assert len(out) == 3
    for r in out:
        meta = json.loads(r["decoded_shape"])
        assert meta["shape"] == [12, 17, 3]
        arr = np.frombuffer(r["decoded"], dtype=meta["dtype"]) \
            .reshape(meta["shape"])
        ref = decode_gif(r["media"])
        assert np.array_equal(arr, ref)
