"""Property-based tests (hypothesis) over the engine's pure driver-side
kernels: redirect-compression semantics on arbitrary functional graphs,
media encode/decode roundtrips on arbitrary payload content, and the
minhash permutation family's range/overflow guarantees."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from wikipath_spark.functions.multimodal import (
    decode_bmp,
    decode_wav,
    decode_y4m_probe,
    encode_bmp,
    encode_wav,
    encode_y4m,
)
from wikipath_spark.functions.text import MINHASH_P31, minhash_perm_consts
from wikipath_spark.operators.compress import _compress_driver_side

# ------------------------------------------------------ compression walk


def _oracle(m: dict[int, int]) -> dict[int, int]:
    """Independent formulation: follow each chain with an explicit visited
    set; terminal ⇒ map, revisit ⇒ the whole walk dies."""
    out = {}
    for s in m:
        seen, cur = {s}, m[s]
        while cur in m and cur not in seen:
            seen.add(cur)
            cur = m[cur]
        if cur not in m:  # terminal reached (not a source)
            out[s] = cur
    return out


@settings(max_examples=300, deadline=None)
@given(st.dictionaries(st.integers(0, 40), st.integers(0, 45), max_size=40))
def test_compress_driver_walk_matches_oracle(m):
    got = dict(_compress_driver_side(list(m.items())))
    assert got == _oracle(m)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.integers(0, 30), st.integers(0, 35), max_size=30))
def test_compress_results_point_at_terminals(m):
    got = dict(_compress_driver_side(list(m.items())))
    for s, t in got.items():
        assert t not in m, f"{s} -> {t} is not terminal"
        assert s in m


# ------------------------------------------------------ media roundtrips


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=500),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, rate):
    arr = np.array(samples, dtype=np.int16)
    parsed = decode_wav(encode_wav(arr, rate))
    assert parsed is not None
    assert parsed["sample_rate"] == rate and parsed["n_frames"] == len(arr)
    assert abs(parsed["mean_value"] - np.abs(arr.astype(np.float64)).mean()) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip(w, h, seed):
    # deterministic pseudo-random pixels from the seed (no RNG state)
    idx = np.arange(h * w * 3, dtype=np.uint64)
    px = ((idx * 2654435761 + seed) % 251).astype(np.uint8).reshape(h, w, 3)
    parsed = decode_bmp(encode_bmp(px))
    assert parsed is not None
    assert (parsed["width"], parsed["height"]) == (w, h)
    assert np.array_equal(parsed["pixels"], px)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 5), st.integers(2, 12), st.integers(2, 12), st.integers(0, 1000))
def test_y4m_roundtrip(nf, w, h, seed):
    w, h = w * 2, h * 2  # 4:2:0 chroma wants even dims
    idx = np.arange(nf * h * w, dtype=np.uint64)
    frames = ((idx * 1099087573 + seed) % 256).astype(np.uint8).reshape(nf, h, w)
    parsed = decode_y4m_probe(encode_y4m(frames))
    assert parsed is not None
    assert (parsed["width"], parsed["height"], parsed["n_frames"]) == (w, h, nf)
    assert abs(parsed["mean_value"] - frames[0].astype(np.float64).mean()) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_decoders_never_crash_on_garbage(payload):
    for dec in (decode_wav, decode_bmp, decode_y4m_probe):
        dec(payload)  # may return None; must never raise


# ------------------------------------------------------ minhash permutation


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**30 - 1), st.integers(0, 2**30 - 1), st.integers(0, 63))
def test_minhash_perm_range_and_overflow(h1, h2, i):
    a, b = minhash_perm_consts(i)
    assert 0 < a < MINHASH_P31 and 0 <= b < MINHASH_P31
    prod = a * h1 + b * h2 + i
    assert prod < 2**63, "permutation arithmetic must stay in signed 64-bit"
    assert 0 <= prod % MINHASH_P31 < MINHASH_P31
