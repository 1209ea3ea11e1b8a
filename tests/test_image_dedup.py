"""image_dhash_near_dups vs a brute dHash Hamming scan: the engine's
banded pairs must equal the all-pairs set within the radius (exact
recall by pigeonhole for hamming <= 3), across >=2 partitionings."""

import numpy as np
import pyarrow as pa
import pytest


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


@pytest.mark.parametrize("blocks", [1, 3])
def test_image_dhash_near_dups_matches_brute(ray_session, blocks):
    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        DecodeStage, dhash64, image_dhash_near_dups,
        make_near_dup_image_batch, _decode_payload,
    )
    import json

    tbl = make_near_dup_image_batch(40, 20, kind="image/bmp")
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    got = image_dhash_near_dups(ds, fake=False, max_hamming=3,
                                num_partitions=4).to_pandas()
    got_pairs = {(int(r.doc_a), int(r.doc_b)): int(r.hamming)
                 for r in got.itertuples()}

    # brute: decode + dhash every image locally, all-pairs scan
    hashes = {}
    for i in range(len(tbl)):
        payload = tbl.column("media").to_pylist()[i]
        meta = json.loads(tbl.column("media_meta").to_pylist()[i])
        arr = _decode_payload(payload, "image/bmp", meta, fake=False)
        hashes[int(tbl.column("media_id").to_pylist()[i])] = dhash64(arr)
    want = {}
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = _hamming(hashes[ids[x]], hashes[ids[y]])
            if h <= 3:
                want[(ids[x], ids[y])] = h
    assert got_pairs == want
    # the fixture actually planted findable near-dups
    planted = {(k % 40, 40 + k) for k in range(20)}
    found_planted = planted & set(want)
    assert len(found_planted) >= 15


@pytest.mark.parametrize("blocks", [1, 3])
def test_audio_near_dups_matches_brute(ray_session, blocks):
    import json

    import ray.data

    from apache_datasketches_go_ray.stages.multimodal import (
        audio_fingerprint64, audio_near_dups, make_near_dup_audio_batch,
        _decode_payload,
    )

    tbl = make_near_dup_audio_batch(30, 15)
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    got = audio_near_dups(ds, fake=False, max_hamming=3,
                          num_partitions=4).to_pandas()
    got_pairs = {(int(r.doc_a), int(r.doc_b)): int(r.hamming)
                 for r in got.itertuples()}

    fps = {}
    for i in range(len(tbl)):
        payload = tbl.column("media").to_pylist()[i]
        meta = json.loads(tbl.column("media_meta").to_pylist()[i])
        arr = _decode_payload(payload, "audio/wav", meta, fake=False)
        fps[int(tbl.column("media_id").to_pylist()[i])] = \
            audio_fingerprint64(arr)
    want = {}
    ids = sorted(fps)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = _hamming(fps[ids[x]], fps[ids[y]])
            if h <= 3:
                want[(ids[x], ids[y])] = h
    assert got_pairs == want
    planted = {(k % 30, 30 + k) for k in range(15)}
    assert len(planted & set(want)) >= 12


@pytest.mark.parametrize("blocks", [1, 3])
def test_video_near_dups_matches_brute(ray_session, blocks):
    import ray.data

    from apache_datasketches_go_ray.functions.mp4box import extract_frames
    from apache_datasketches_go_ray.stages.multimodal import (
        dhash64, make_near_dup_video_batch, video_near_dups,
    )

    tbl = make_near_dup_video_batch(25, 12)
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    got = video_near_dups(ds, every_k=3, max_hamming=3,
                          num_partitions=4).to_pandas()
    got_pairs = {(int(r.doc_a), int(r.doc_b)): int(r.hamming)
                 for r in got.itertuples()}

    # brute: sample the same frames, majority-vote fingerprint
    fps = {}
    for i in range(len(tbl)):
        payload = tbl.column("payload").to_pylist()[i]
        info, samples = extract_frames(payload, 3)
        hs = []
        for _f, _ts, blob in samples:
            arr = np.frombuffer(blob, dtype=np.uint8).reshape(
                info["height"], info["width"], 3)
            hs.append(dhash64(arr))
        bits = np.unpackbits(
            np.array(hs, dtype=np.uint64)[:, None].view(np.uint8),
            axis=1, bitorder="little").astype(np.int64)
        maj = (bits.sum(axis=0) * 2 >= len(hs)).astype(np.uint8)
        fps[int(tbl.column("media_id").to_pylist()[i])] = int(
            np.packbits(maj, bitorder="little").view(np.uint64)[0])
    want = {}
    ids = sorted(fps)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = _hamming(fps[ids[x]], fps[ids[y]])
            if h <= 3:
                want[(ids[x], ids[y])] = h
    assert got_pairs == want
    planted = {(k % 25, 25 + k) for k in range(12)}
    assert len(planted & set(want)) >= 10
