"""ISO-BMFF (MP4) box-level container codec + frame-sample stage."""

import numpy as np
import pytest

from apache_datasketches_go_ray.functions.mp4box import (
    encode_mp4,
    extract_frames,
    parse_mp4,
)


def _frames(n=10, h=8, w=8, seed=1):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
            for _ in range(n)]


def test_roundtrip_all_samples():
    frames = _frames(12)
    mp4 = encode_mp4(frames, fps=24, width=8, height=8)
    info = parse_mp4(mp4)
    assert info["codec"] == "rawv"
    assert (info["width"], info["height"]) == (8, 8)
    assert info["timescale"] == 24
    assert info["n_samples"] == 12
    _, out = extract_frames(mp4, 1)
    assert [p for _, _, p in out] == frames
    # uniform 1-tick deltas at timescale=fps
    times = [t for _, t, _ in out]
    assert np.allclose(times, np.arange(12) / 24.0)


def test_variable_sample_sizes():
    frames = _frames(5) + [b"tiny", b"x" * 999]
    mp4 = encode_mp4(frames, fps=12)
    _, out = extract_frames(mp4, 1)
    assert [p for _, _, p in out] == frames
    _, sampled = extract_frames(mp4, 3)
    assert [i for i, _, _ in sampled] == [0, 3, 6]
    assert sampled[2][2] == b"x" * 999


def test_rejects_and_missing_track():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError):
        parse_mp4(b"PK\x03\x04 definitely a zip")


def test_frame_sample_stage_mp4(ray_session):
    import json

    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        FrameSampleStage,
        make_real_video_batch,
    )

    tbl = make_real_video_batch(list(range(6)), n_frames=24)
    out = (ray.data.from_arrow(tbl)
           .map_batches(FrameSampleStage, fn_constructor_args=(6,),
                        batch_size=3, concurrency=2,
                        batch_format="pyarrow")
           .take_all())
    assert len(out) == 6 * 4          # every 6th of 24 frames
    for r in out:
        sh = json.loads(r["decoded_shape"])
        assert sh["shape"] == [8, 8, 3] and sh["dtype"] == "uint8"
        # the sampled payload equals the original frame bytes
        rng = np.random.default_rng(1000 + r["media_id"])
        arr = rng.integers(0, 256, (24, 8, 8, 3), dtype=np.uint8)
        assert r["decoded"] == arr[r["frame_idx"]].tobytes()


def test_compressed_codec_raises(ray_session):
    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        FrameSampleStage,
    )
    from apache_datasketches_go_ray.stages.multimodal import pa, json

    mp4 = encode_mp4(_frames(4), fps=12, codec=b"avc1")
    tbl = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "media_type": pa.array(["video/mp4"]),
        "payload": pa.array([mp4], type=pa.large_binary()),
        "meta": pa.array([json.dumps({"fps": 12})]),
    })
    ds = ray.data.from_arrow(tbl).map_batches(
        FrameSampleStage, fn_constructor_args=(2,),
        batch_format="pyarrow", concurrency=1)
    with pytest.raises(Exception, match="codec"):
        ds.take_all()
