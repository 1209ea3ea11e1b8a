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
    buf[i + 1] = 0xC3  # lossless SOF3 — still out of scope
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


def test_subsampled_roundtrip_bounded():
    """4:2:0 / 4:2:2 encode -> decode: shape-exact, error bounded.
    Luma is untouched by decimation, so its error matches the 4:4:4
    bound; chroma pays the box-average + pixel-replicate cycle, which
    on a smooth image stays small."""
    yy, xx = np.mgrid[0:37, 0:53]
    smooth = np.clip(np.stack(
        [60 + yy * 1.5, 120 + xx * 0.9, 90 + (yy + xx) * 0.5],
        axis=-1), 0, 255).astype(np.uint8)
    for ss in ("422", "420"):
        out = decode_jpeg(encode_jpeg(smooth, quality=95, subsampling=ss))
        assert out.shape == smooth.shape
        err = np.abs(out.astype(int) - smooth.astype(int))
        assert err.mean() < 2.0, (ss, err.mean())
        assert err.max() <= 40, (ss, err.max())


def test_subsampled_with_restart_markers():
    yy, xx = np.mgrid[0:40, 0:72]
    img = np.clip(np.stack([yy * 3, xx * 2, yy + xx], axis=-1),
                  0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsampling="420",
                                  restart_interval=2))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_subsampled_luma_matches_444_closely():
    """Decimation must not perturb the Y path: the decoded luma of a
    4:2:0 stream tracks the 4:4:4 decode of the same input."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=90, subsampling="444"))
    b = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    # compare luma of both decodes (BT.601 weights)
    la = a @ np.array([0.299, 0.587, 0.114])
    lb = b @ np.array([0.299, 0.587, 0.114])
    assert np.abs(la - lb).mean() < 4.0


def test_dhash_stable_across_subsampling():
    """The perceptual near-dup fingerprint (9x8 dHash) must see a
    4:2:0 copy of an image as a near-dup of its 4:4:4 form — the
    mixed-subsampling crawl scenario image_near_dups exercises."""
    from apache_datasketches_go_ray.stages.multimodal import dhash64

    yy, xx = np.mgrid[0:64, 0:64]
    img = np.clip(np.stack(
        [100 + 80 * np.sin(yy / 9.0), 120 + 60 * np.cos(xx / 7.0),
         (yy * 2 + xx) % 256], axis=-1), 0, 255).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=90, subsampling="444"))
    b = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    ha, hb = dhash64(a), dhash64(b)
    assert bin(ha ^ hb).count("1") <= 3


def test_progressive_decodes_bit_identical_to_baseline():
    """Progressive (SOF2: spectral selection + successive approximation,
    DC+AC refinement passes, EOB runs) encodes the same quantized
    coefficients as baseline, so decodes must agree BIT-FOR-BIT."""
    from apache_datasketches_go_ray.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    cases = [((16, 16, 3), "444"), ((45, 67, 3), "420"),
             ((24, 17, 3), "422"), ((33, 41), "444")]
    for shape, ss in cases:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for q in (75, 90, 100):
            kw = {} if len(shape) == 2 else {"subsampling": ss}
            b = decode_jpeg(encode_jpeg(img, quality=q, **kw))
            p = decode_jpeg(encode_jpeg_progressive(img, quality=q, **kw))
            assert np.array_equal(b, p), (shape, ss, q)


def test_progressive_roundtrip_bounded():
    from apache_datasketches_go_ray.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, (20, 28), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
