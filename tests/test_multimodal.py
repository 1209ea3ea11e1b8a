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
