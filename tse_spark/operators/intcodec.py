"""Alternative posting-list integer codecs: Simple8b and Elias-Fano.

The default shard codec is delta-gap varint with per-block max scores
(operators/codec.py — the layout the north_star mandates).  Production
engines additionally use word-aligned and quasi-succinct codecs for
doc-id lists; this module provides the two classics so the posting
store can trade decode speed vs space per shard:

- **Simple8b** (Anh & Moffat): pack as many values as possible into
  each 64-bit word, a 4-bit selector choosing among 16 layouts — two
  run-length selectors for runs of the value 1 (240 and 120 long; the
  common case for doc-id GAPS in dense posting lists) and fourteen
  fixed-width layouts from 60x1bit to 1x60bit.  Decode groups words by
  selector and unpacks each group with vectorized shifts — no
  per-value Python.
- **Elias-Fano**: the quasi-succinct monotone-list codec (Vigna,
  "Quasi-succinct indices"): low ``l = floor(log2(u/n))`` bits stored
  packed, high bits as a unary bitmap; space within ~half a bit of the
  information-theoretic optimum for a sorted id list, with O(1)
  skip-by-rank — the codec behind modern freshness-tier indexes.
  Applied to ABSOLUTE doc ids (no gap transform needed — monotonicity
  is the transform).

Both are exact roundtrips (property-tested with hypothesis) and are
wired into a driver query (``postings_codec``) that re-encodes every
posting list of the bench vocabulary through BOTH codecs inside the
task and emits the decoded lists, so the DuckDB oracle catches a
single wrong id at any position.  Encode is per-list Python over numpy
buffers (build path, one call per (term, shard) list — the same
granularity as the varint encoder); decode is the serving-path shape.
"""

from __future__ import annotations

import struct

import numpy as np

# selector -> (count, bits); selectors 0/1 are runs of the value 1
S8B_N = (240, 120, 60, 30, 20, 15, 12, 10, 8, 7, 6, 5, 4, 3, 2, 1)
S8B_B = (0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 15, 20, 30, 60)
_MAX_S8B = (1 << 60) - 1


def simple8b_encode(values: np.ndarray) -> np.ndarray:
    """Non-negative int array (< 2**60) -> uint64 word array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size and int(v.max()) > _MAX_S8B:
        raise ValueError("simple8b value exceeds 60 bits")
    # bit length per value (0 -> 1 bit: a zero still occupies a slot)
    bl = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(1)
    while tmp.any():
        bl += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(1)
    words: list[int] = []
    i = 0
    n_total = v.size
    while i < n_total:
        packed = False
        for sel in range(16):
            n, b = S8B_N[sel], S8B_B[sel]
            if i + n > n_total:
                continue
            if b == 0:
                # run of n ones
                if (v[i:i + n] == 1).all():
                    words.append(sel << 60)
                    i += n
                    packed = True
                    break
                continue
            if int(bl[i:i + n].max()) <= b:
                w = np.uint64(sel) << np.uint64(60)
                chunk = v[i:i + n]
                shifts = (np.arange(n, dtype=np.uint64)
                          * np.uint64(b))
                w |= np.bitwise_or.reduce(chunk << shifts)
                words.append(int(w))
                i += n
                packed = True
                break
        if not packed:  # cannot happen: sel 15 is 1x60bit
            raise AssertionError("simple8b packing failed")
    return np.array(words, dtype=np.uint64)


def simple8b_decode(words: np.ndarray) -> np.ndarray:
    """uint64 word array -> the original value array (vectorized by
    selector group; word order preserved via per-word output offsets)."""
    w = np.asarray(words, dtype=np.uint64)
    if w.size == 0:
        return np.zeros(0, dtype=np.uint64)
    sels = (w >> np.uint64(60)).astype(np.int64)
    counts = np.array(S8B_N, dtype=np.int64)[sels]
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out = np.empty(int(counts.sum()), dtype=np.uint64)
    for sel in np.unique(sels):
        grp = np.flatnonzero(sels == sel)
        n, b = S8B_N[sel], S8B_B[sel]
        pos = offs[grp][:, None] + np.arange(n, dtype=np.int64)[None, :]
        if b == 0:
            out[pos.ravel()] = np.uint64(1)
            continue
        shifts = (np.arange(n, dtype=np.uint64) * np.uint64(b))[None, :]
        mask = np.uint64((1 << b) - 1)
        vals = (w[grp][:, None] >> shifts) & mask
        out[pos.ravel()] = vals.ravel()
    return out


def simple8b_encode_bytes(values: np.ndarray) -> bytes:
    words = simple8b_encode(values)
    return struct.pack("<I", int(np.asarray(values).size)) + words.tobytes()


def simple8b_decode_bytes(buf: bytes) -> np.ndarray:
    (count,) = struct.unpack_from("<I", buf, 0)
    words = np.frombuffer(buf, dtype=np.uint64, offset=4)
    out = simple8b_decode(words)
    if out.size != count:
        raise ValueError("simple8b stream count mismatch")
    return out


# ------------------------------------------------------------ elias-fano


def _pack_bits(values: np.ndarray, b: int) -> bytes:
    """Pack b-bit values little-endian into a byte stream."""
    if b == 0 or values.size == 0:
        return b""
    v = values.astype(np.uint64)
    nbits = int(v.size) * b
    bits = np.zeros(nbits, dtype=np.uint8)
    for k in range(b):
        bits[k::b] = ((v >> np.uint64(k)) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits, bitorder="little").tobytes()


def _unpack_bits(buf: bytes, b: int, n: int) -> np.ndarray:
    if b == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), bitorder="little"
    )[: n * b].astype(np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for k in range(b):
        out |= bits[k::b] << np.uint64(k)
    return out


def elias_fano_encode(ids: np.ndarray) -> bytes:
    """Strictly-increasing non-negative int64 ids -> EF bytes."""
    v = np.asarray(ids, dtype=np.uint64)
    n = int(v.size)
    if n == 0:
        return struct.pack("<IQB", 0, 0, 0)
    if n > 1 and not (v[1:] > v[:-1]).all():
        raise ValueError("elias_fano needs strictly increasing ids")
    u = int(v[-1]) + 1
    l = max(0, int(np.floor(np.log2(u / n))) if u > n else 0)
    low = _pack_bits(v & np.uint64((1 << l) - 1), l)
    high = (v >> np.uint64(l)).astype(np.int64)
    # unary bitmap: bit (high[i] + i) set
    nbits = int(high[-1]) + n
    bits = np.zeros(nbits + 1, dtype=np.uint8)
    bits[high + np.arange(n, dtype=np.int64)] = 1
    hi = np.packbits(bits, bitorder="little").tobytes()
    return (
        struct.pack("<IQB", n, u, l)
        + struct.pack("<I", len(low))
        + low
        + hi
    )


def elias_fano_decode(buf: bytes) -> np.ndarray:
    n, u, l = struct.unpack_from("<IQB", buf, 0)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off = struct.calcsize("<IQB")
    (low_len,) = struct.unpack_from("<I", buf, off)
    off += 4
    low = _unpack_bits(buf[off:off + low_len], l, n)
    bits = np.unpackbits(
        np.frombuffer(buf[off + low_len:], dtype=np.uint8),
        bitorder="little",
    )
    pos = np.flatnonzero(bits)[:n].astype(np.int64)
    high = (pos - np.arange(n, dtype=np.int64)).astype(np.uint64)
    return (high << np.uint64(l)) | low


def codec_advisor(tf) -> "DataFrame":
    """Per-term codec choice report (pairs X94/X95 with the X104 byte
    law): for every posting list, the exact byte cost under (a) LEB128
    varint delta-gaps and (b) Elias-Fano — closed-form columns, all
    whole-stage codegen, no UDF (the closed forms are pytest-pinned
    byte-exact against :func:`elias_fano_encode` / the varint codec's
    own output law).  ``winner`` picks the smaller stream (ties to
    varint, the default tier).  Dense lists (n close to the universe)
    favor EF's ~2 + log2(u/n) bits/id; sparse lists favor varint.

    Laws (mirroring the encoders exactly):
      varint_bytes = sum over gaps of LEB128 size (first gap = id+1)
      l            = u > n ? max(0, floor(log2(u/n))) : 0, u = last+1
      ef_bytes     = 17 header + (l ? ceil(n*l/8) : 0)
                     + ceil(((last >> l) + n + 1) / 8)
    """
    from pyspark.sql import DataFrame, Window, functions as F

    w = Window.partitionBy("term").orderBy("doc_id")
    gap = F.col("doc_id") - F.coalesce(
        F.lag("doc_id").over(w), F.lit(-1)
    )
    vb = (
        F.when(gap < 128, 1)
        .when(gap < 16384, 2)
        .when(gap < 2097152, 3)
        .when(gap < 268435456, 4)
        .otherwise(5)
        .cast("long")
    )
    agg = (
        tf.select("term", "doc_id")
        .withColumn("__vb", vb)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.max("doc_id").alias("__last"),
            F.sum("__vb").alias("varint_bytes"),
        )
    )
    n, last = F.col("n_postings"), F.col("__last")
    u = last + 1
    l = F.when(
        u > n,
        F.greatest(
            F.lit(0),
            F.floor(F.log2(u.cast("double") / n.cast("double"))),
        ),
    ).otherwise(0).cast("long")
    low_bytes = F.when(
        l > 0, F.floor((n * l + 7) / 8)
    ).otherwise(0).cast("long")
    hi_bits = F.floor(last / F.pow(F.lit(2.0), l.cast("double"))).cast(
        "long"
    ) + n + 1
    ef_bytes = (F.lit(17) + low_bytes + F.floor((hi_bits + 7) / 8)).cast(
        "long"
    )
    return agg.select(
        "term",
        "n_postings",
        "varint_bytes",
        ef_bytes.alias("ef_bytes"),
        F.when(ef_bytes < F.col("varint_bytes"), F.lit("elias_fano"))
        .otherwise(F.lit("varint"))
        .alias("winner"),
    )
