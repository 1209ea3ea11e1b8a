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
