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


def test_codec_advisor_laws_match_real_encoders(spark):
    """The advisor's closed-form byte columns equal the REAL encoder
    outputs for every posting list: len(elias_fano_encode(ids)) and
    len(varint_encode(gaps)) — so the report prices exactly what the
    codecs would write."""
    import numpy as np
    from tse_spark.operators import index_build as ib
    from tse_spark.operators import intcodec as ic

    docs = spark.createDataFrame(
        [
            (i, " ".join(
                ["dense"] * 1
                + (["sparse"] if i % 97 == 0 else [])
                + ([f"mid{i % 7}"] if i % 3 == 0 else [])
            ))
            for i in range(800)
        ],
        "doc_id long, text string",
    )
    tf = ib.build_tf_ws(docs)
    report = {
        r["term"]: (r["n_postings"], r["varint_bytes"], r["ef_bytes"],
                    r["winner"])
        for r in ic.codec_advisor(tf).collect()
    }
    ids_by_term = {}
    for r in tf.collect():
        ids_by_term.setdefault(r["term"], []).append(r["doc_id"])
    assert set(report) == set(ids_by_term)
    for term, ids in ids_by_term.items():
        ids = np.sort(np.array(ids, dtype=np.int64))
        n, vb, eb, winner = report[term]
        assert n == len(ids)
        gaps = np.diff(ids, prepend=np.int64(-1))
        assert vb == len(ic_varint(gaps)), term
        assert eb == len(ic.elias_fano_encode(ids)), term
        assert winner == ("elias_fano" if eb < vb else "varint"), term
    # both codecs must win somewhere on this corpus or the report
    # proves nothing
    winners = {w for (_, _, _, w) in report.values()}
    assert winners == {"elias_fano", "varint"}


def ic_varint(values):
    from tse_spark.operators import codec

    return codec.varint_encode(values)
