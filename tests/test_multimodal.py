import numpy as np
import pytest

from linkgraph.operators.multimodal import (
    decode_image_real,
    extract_features,
    fake_decode,
    frame_sample_plan,
    synth_media,
)


def test_feature_extraction_plumbing(spark):
    media = synth_media(spark, 30, partitions=3)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feat"]) == 8
        assert r["n_bytes"] > 0
    # deterministic across partitionings
    again = extract_features(synth_media(spark, 30, partitions=7), dim=8).collect()
    a = {r["media_id"]: r["feat"] for r in feats}
    b = {r["media_id"]: r["feat"] for r in again}
    assert a == b


def test_fake_decode_matches_batch_path(spark):
    media = synth_media(spark, 6).collect()
    feats = {r["media_id"]: r["feat"] for r in extract_features(synth_media(spark, 6)).collect()}
    for m in media:
        want = fake_decode(bytes(m["payload"]), 8)
        assert np.allclose(feats[m["media_id"]], want, atol=1e-6)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff")


def test_frame_sampling(spark):
    media = synth_media(spark, 30)
    samples = frame_sample_plan(media, every_ms=500).collect()
    assert all(r["sample_ts_ms"] % 500 == 0 for r in samples)
    vids = {r["media_id"] for r in media.filter("kind = 'video'").collect()}
    assert {r["media_id"] for r in samples} == vids


def test_resize_images_stride_semantics(spark):
    """Target dims and strided payload match the closed form:
    k = ceil(max(w,h)/max_side), out = payload[::k]."""
    import math

    from linkgraph.operators.multimodal import resize_images, synth_media

    media = synth_media(spark, 32).persist()
    src = {r["media_id"]: r for r in media.filter("kind = 'image'").collect()}
    out = resize_images(media, max_side=16).collect()
    assert {r["media_id"] for r in out} == set(src)
    for r in out:
        s = src[r["media_id"]]
        k = max(1, math.ceil(max(s["width"], s["height"]) / 16))
        assert r["target_w"] == math.ceil(s["width"] / k)
        assert r["target_h"] == math.ceil(s["height"] / k)
        assert bytes(r["payload"]) == bytes(s["payload"])[::k]
    media.unpersist()
