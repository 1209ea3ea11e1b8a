"""Pure-stdlib baseline JPEG codec + DecodeStage integration.

The codec is lossy by construction, so the round-trip contract is
error-bounded, not bit-exact: at quality=100 the quantization tables are
all ones (IJG scaling), leaving only DCT float rounding, which keeps
every pixel within ±1 for grayscale and within ±2 for RGB (the extra
step is the YCbCr color transform's rounding). Structural paths —
restart markers, odd (non-multiple-of-8) sizes, grayscale vs color,
progressive rejection — are pinned exactly.
"""

import numpy as np
import pytest

from apache_datasketches_go_ray.functions.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def test_quality_scaling_endpoints():
    l100, c100 = quality_tables(100)
    assert (l100 == 1).all() and (c100 == 1).all()
    l50, _ = quality_tables(50)
    # IJG: quality 50 is the unscaled Annex K table
    assert l50[0] == 16 and l50[63] == 99


def test_gray_roundtrip_q100_bounded():
    rng = np.random.default_rng(11)
    for shape in [(8, 8), (16, 24), (33, 41), (1, 1), (7, 9)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1, shape


def test_constant_and_gradient_exact():
    img = np.full((16, 24), 130, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)
    img = np.tile(np.arange(64, dtype=np.uint8) * 4, (40, 1))[:, :48]
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)


def test_rgb_roundtrip_q100_bounded():
    rng = np.random.default_rng(13)
    for shape in [(8, 8, 3), (12, 17, 3), (31, 9, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2, shape


def test_lossy_quality_reasonable():
    """At quality 85 a random image survives with bounded mean error and
    a smooth image with small max error — sanity that quantization is
    actually wired through (not ignored)."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=85))
    err = np.abs(out.astype(int) - img.astype(int))
    assert 0 < err.mean() < 40
    x = np.linspace(40, 200, 32)
    smooth = np.stack([np.tile(x, (32, 1))] * 3, axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth, quality=85))
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 12


def test_restart_interval_parity():
    """DRI/RSTn segmentation must not change decoded output."""
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=100))
    for ri in (1, 3, 7):
        seg = decode_jpeg(encode_jpeg(img, quality=100,
                                      restart_interval=ri))
        assert np.array_equal(seg, plain), ri
    rgb = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb, quality=90, restart_interval=2)),
        decode_jpeg(encode_jpeg(rgb, quality=90)))


def test_unsupported_streams_raise():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    buf = bytearray(encode_jpeg(img, quality=90))
    i = buf.find(b"\xFF\xC0")
    buf[i + 1] = 0xC2  # progressive SOF2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_decode_stage_real_jpeg(ray_session):
    """DecodeStage on REAL baseline-JPEG payloads through the actor
    pool: the former stub path decodes without fake=True and the output
    matches a local decode of the same payload byte-for-byte."""
    import json

    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        DecodeStage,
        make_real_media_batch,
    )

    tbl = make_real_media_batch(list(range(6)), kind="image/jpeg")
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
        assert np.array_equal(arr, decode_jpeg(r["media"]))
