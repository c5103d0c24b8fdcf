"""Simple8b + Elias-Fano codec conformance (operators/intcodec.py):
hypothesis property roundtrips, boundary values, selector behavior,
and space sanity on posting-shaped inputs."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tse_spark.operators import intcodec as ic


# ----------------------------------------------------------- simple8b


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
             max_size=300)
)
def test_simple8b_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    got = ic.simple8b_decode_bytes(ic.simple8b_encode_bytes(v))
    assert got.dtype == np.uint64
    assert got.tolist() == vals


def test_simple8b_run_selectors_compress_ones():
    v = np.ones(1000, dtype=np.uint64)
    words = ic.simple8b_encode(v)
    # 4x240 + 120 = 960+120 > 1000 -> 4 run words + tail words; far
    # fewer than the 17 words 60x1bit packing would need
    assert len(words) <= 8
    assert (ic.simple8b_decode(words) == 1).all()
    assert ic.simple8b_decode(words).size == 1000


def test_simple8b_boundaries():
    for v in ([], [0], [(1 << 60) - 1], [0] * 61, [1] * 240, [1] * 241):
        arr = np.array(v, dtype=np.uint64)
        got = ic.simple8b_decode_bytes(ic.simple8b_encode_bytes(arr))
        assert got.tolist() == list(map(int, v))


def test_simple8b_rejects_oversized():
    with pytest.raises(ValueError, match="60 bits"):
        ic.simple8b_encode(np.array([1 << 60], dtype=np.uint64))


def test_simple8b_mixed_magnitudes_word_alignment():
    # alternate tiny/huge so greedy must fall back to wide selectors
    v = np.array([1, (1 << 59), 2, (1 << 40), 3] * 20, dtype=np.uint64)
    got = ic.simple8b_decode_bytes(ic.simple8b_encode_bytes(v))
    assert (got == v).all()


# ---------------------------------------------------------- elias-fano


@settings(max_examples=200, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=(1 << 40)), max_size=300)
)
def test_elias_fano_roundtrip_property(ids):
    v = np.array(sorted(ids), dtype=np.uint64)
    got = ic.elias_fano_decode(ic.elias_fano_encode(v))
    assert got.tolist() == sorted(ids)


def test_elias_fano_boundaries():
    for v in ([], [0], [12345678901234], list(range(100))):
        arr = np.array(v, dtype=np.uint64)
        got = ic.elias_fano_decode(ic.elias_fano_encode(arr))
        assert got.tolist() == list(map(int, v))


def test_elias_fano_rejects_non_increasing():
    with pytest.raises(ValueError, match="strictly increasing"):
        ic.elias_fano_encode(np.array([3, 3], dtype=np.uint64))
    with pytest.raises(ValueError, match="strictly increasing"):
        ic.elias_fano_encode(np.array([5, 2], dtype=np.uint64))


def test_elias_fano_space_near_optimal_dense():
    # n ids over universe u: EF uses ~ 2 + log2(u/n) bits/id
    ids = np.arange(0, 1_000_000, 8, dtype=np.uint64)  # u/n = 8
    data = ic.elias_fano_encode(ids)
    bits_per_id = 8.0 * len(data) / ids.size
    assert bits_per_id < 2 + 3 + 0.5  # 2 + log2(8) + slack


def test_gap_simple8b_beats_raw_on_dense_postings():
    ids = np.arange(0, 100_000, 2, dtype=np.uint64)
    gaps = np.diff(np.concatenate([[0], ids])).astype(np.uint64)
    s8 = ic.simple8b_encode_bytes(gaps)
    assert len(s8) < ids.size * 8 / 3  # >= 3x smaller than raw int64
    back = ic.simple8b_decode_bytes(s8).cumsum()
    assert (back == ids).all()
