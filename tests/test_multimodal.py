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


def test_codec_roundtrips_and_errors():
    """Pure-numpy codecs: encode→decode identity for BMP (incl. odd
    widths exercising 4-byte row padding), PPM/PGM (comment-tolerant
    headers), WAV PCM (mono/stereo, 8→16-bit widening); loud failures
    for truncated/compressed payloads."""
    import struct

    import numpy as np
    import pytest

    from linkgraph.operators.multimodal import (
        decode_audio_real,
        decode_bmp,
        decode_image_real,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (3, 2), (5, 7), (13, 11)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()
        assert (decode_image_real(encode_bmp(px)) == px).all()
        assert (decode_ppm(encode_ppm(px)) == px).all()
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(g)) == g).all()
    # PPM header with comments and mixed whitespace
    p = b"P6 # c\n# c2\n 3\t2\n255\n" + bytes(range(18))
    assert decode_ppm(p).shape == (2, 3, 3)
    for ch in (1, 2):
        s = rng.integers(-32768, 32767, (64, ch)).astype(np.int16)
        rate, out = decode_wav(encode_wav(s, 22050))
        assert rate == 22050 and (out == s).all()
    # 8-bit PCM widens centered
    wav8 = (
        struct.pack("<4sI4s", b"RIFF", 46, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
        + struct.pack("<4sI", b"data", 10)
        + bytes(range(10))
    )
    assert (decode_audio_real(wav8)[1].reshape(-1) == np.arange(10) - 128).all()
    # loud failures
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))[:-8])
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image_real(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image_real(b"GIF89a" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="PCM"):
        bad = bytearray(encode_wav(np.zeros(4, dtype=np.int16), 8000))
        bad[20] = 3  # format tag: IEEE float
        decode_wav(bytes(bad))


def test_real_decoder_feature_path(spark):
    """extract_features(use_real_decoder=True) decodes genuine
    BMP/WAV payloads; features equal chunk-means of the decoded
    signal computed independently."""
    import numpy as np

    from linkgraph.operators.multimodal import (
        decode_bmp,
        decode_wav,
        extract_features,
        synth_bmp_media,
        synth_wav_media,
    )

    media = synth_bmp_media(spark, 9).unionByName(synth_wav_media(spark, 9))
    src = {(r["kind"], r["media_id"]): bytes(r["payload"]) for r in media.collect()}
    out = extract_features(media, dim=4, use_real_decoder=True).collect()
    assert len(out) == 18
    for r in out:
        raw = src[(r["kind"], r["media_id"])]
        sig = (
            decode_bmp(raw).reshape(-1)
            if r["kind"] == "image"
            else decode_wav(raw)[1].reshape(-1)
        )
        want = [float(c.mean()) for c in np.array_split(sig.astype(np.float64), 4)]
        assert np.allclose(r["feat"], want, atol=1e-5)
        assert r["n_bytes"] == len(raw)
