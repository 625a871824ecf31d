"""Real media decode tests: WAV/BMP/Y4M payloads are genuine container bytes
(cross-checked against the stdlib `wave` module and hand-computed pixel
math), decoded by the engine's numpy/struct parsers through the same
mapInPandas plumbing the fake path uses."""

from __future__ import annotations

import io
import wave

import numpy as np

from wikipath_spark.functions.multimodal import (
    decode_bmp,
    decode_wav,
    decode_y4m_probe,
    encode_bmp,
    encode_wav,
    encode_y4m,
    extract_media_features,
    frame_sample,
    resize_images,
    synthetic_media,
)


def test_wav_roundtrip_against_stdlib():
    samples = (np.sin(np.arange(4000) * 0.1) * 12000).astype(np.int16)
    payload = encode_wav(samples, sample_rate=16000)
    # stdlib `wave` must accept our encoder's bytes verbatim
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 4000
        assert np.array_equal(np.frombuffer(w.readframes(4000), dtype="<i2"), samples)
    parsed = decode_wav(payload)
    assert parsed["sample_rate"] == 16000 and parsed["n_frames"] == 4000
    assert abs(parsed["mean_value"] - np.abs(samples.astype(np.float64)).mean()) < 1e-9


def test_bmp_roundtrip_exact_pixels():
    px = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
        dtype=np.uint8,
    )  # 2 rows × 3 cols (width 3 forces row padding: 9 bytes → 12)
    payload = encode_bmp(px)
    parsed = decode_bmp(payload)
    assert parsed["width"] == 3 and parsed["height"] == 2
    assert np.array_equal(parsed["pixels"], px)
    assert abs(parsed["mean_value"] - px.astype(np.float64).mean()) < 1e-9


def test_y4m_probe():
    frames = (np.arange(3 * 4 * 6, dtype=np.uint8) % 200).reshape(3, 4, 6)
    payload = encode_y4m(frames)
    parsed = decode_y4m_probe(payload)
    assert (parsed["width"], parsed["height"], parsed["n_frames"]) == (6, 4, 3)
    assert abs(parsed["mean_value"] - frames[0].astype(np.float64).mean()) < 1e-9


def test_decoders_reject_garbage():
    for dec in (decode_wav, decode_bmp, decode_y4m_probe):
        assert dec(b"") is None
        assert dec(b"not a media file at all, definitely " * 4) is None
    # truncated real headers must also be rejected, not crash
    wavb = encode_wav(np.zeros(100, dtype=np.int16))
    assert decode_wav(wavb[:20]) is None
    bmpb = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    assert decode_bmp(bmpb[:40]) is None


def test_real_decode_end_to_end(spark):
    media = synthetic_media(spark, n=30)
    feats = {r.media_id: r for r in extract_media_features(media, decoder="real").collect()}
    assert len(feats) == 30
    assert all(r.decode_ok for r in feats.values())
    for mid, r in feats.items():
        kind = ("image", "audio", "video")[mid % 3]
        assert r.kind == kind
        if kind == "audio":
            assert r.sample_rate == 8000 and r.n_frames == 2000 + (mid % 5) * 500
            assert r.width is None
        elif kind == "image":
            assert (r.width, r.height) == (8 + mid % 9, 6 + mid % 7)
        else:
            assert (r.width, r.height) == (8 + mid % 5 * 2, 6 + mid % 3 * 2)
            assert r.n_frames == 3 + mid % 4


def test_resize_images_real(spark):
    media = synthetic_media(spark, n=9).filter("kind = 'image'")
    resized = resize_images(media, 4, 3)
    feats = extract_media_features(resized, decoder="real").collect()
    assert feats and all(r.decode_ok and (r.width, r.height) == (4, 3) for r in feats)


def test_frame_sample_real(spark):
    media = synthetic_media(spark, n=9).filter("kind = 'video'")
    ids = {r.media_id for r in media.select("media_id").collect()}
    frames = frame_sample(media, every_n=2).collect()
    by_id: dict[int, list] = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    for mid in ids:
        n_frames = 3 + mid % 4
        expected = -(-n_frames // 2)  # every 2nd frame: 0, 2, ...
        got = sorted(f.frame_no for f in by_id[mid])
        assert got == list(range(0, n_frames, 2)) and len(got) == expected
        # payload is the actual luma plane: w*h bytes
        w, h = 8 + mid % 5 * 2, 6 + mid % 3 * 2
        assert all(len(bytes(f.frame_payload)) == w * h for f in by_id[mid])
