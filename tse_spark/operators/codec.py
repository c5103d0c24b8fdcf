"""Posting-list codec: delta-gap + varint blocks with per-block max-score.

Replaces the reference's ASCII posting lines (``term \\t docid docid ...``,
index/CrtInvertedIdx.cpp:29-47, format MyNotes.txt:8-10) with the
compressed layout the north_star mandates:

  shard row = (term, shard, df, cf, max_score, blocks: binary)

``blocks`` is a concatenation of self-delimiting blocks of up to
BLOCK_SIZE postings, each:

  header '<HIIIQQf': count, gaps_len, tfs_len, dls_len,
                     first_doc, last_doc, max_score
  payload: varint(delta-gaps) ++ varint(tfs) ++ varint(doclens)

- gaps[0] == 0 (first_doc is absolute in the header); postings are
  doc_id-ascending, so all gaps >= 0 and a block is skippable via
  (last_doc, section lengths) without decoding — the skip pointers for
  block-max WAND.
- ``max_score`` is the exact *idf-free* BM25 upper bound of the block:
  max over the block of tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)).  The
  query engine multiplies by the term idf — storing the idf-free
  component means encoding needs no df join and the bound survives
  incremental df updates.
- doclens ride inline so scoring needs no join at query time.

Varint encode/decode are numpy-vectorized (no per-value Python in the
hot loop): encode scatters 7-bit groups level-by-level; decode delimits
on continuation bits and accumulates level-by-level.
"""

from __future__ import annotations

import struct

import numpy as np

from tse_spark import oracle

BLOCK_SIZE = 128
_HDR = struct.Struct("<HIIIQQf")
HEADER_SIZE = _HDR.size


# ---------------------------------------------------------------------------
# vectorized varint
# ---------------------------------------------------------------------------

def _varint_encode_sizes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a non-negative int64 array, vectorized.
    Returns (byte array, per-value byte counts) so callers can slice the
    stream at arbitrary value boundaries without re-encoding."""
    v = values.astype(np.uint64, copy=True)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    max_len = int(nbytes.max())
    for j in range(max_len):
        mask = nbytes > j
        idx = offsets[:-1][mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64 array, vectorized."""
    out, _ = _varint_encode_sizes(values)
    return out.tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints from ``buf`` (consuming all of it)."""
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero((b & 0x80) == 0)
    assert ends.size == count, f"varint count mismatch: {ends.size} != {count}"
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(count, dtype=np.uint64)
    max_len = int(lengths.max())
    for j in range(max_len):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals.astype(np.int64)


# ---------------------------------------------------------------------------
# block codec
# ---------------------------------------------------------------------------

def bm25_tf_component(
    tf: np.ndarray, dl: np.ndarray, avgdl: float
) -> np.ndarray:
    k1, b = oracle.BM25_K1, oracle.BM25_B
    tf = tf.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_many(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    group_bounds: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> tuple[list[bytes], np.ndarray]:
    """Encode MANY posting runs in one vectorized pass.

    ``group_bounds`` delimits the runs (len = n_groups + 1); each run
    must be doc_id-ascending.  The whole chunk gets ONE varint encode
    per section and ``np.maximum.reduceat`` for the block maxima; only
    the final header-pack/slice assembly loops in Python, once per
    block.  This is what makes a 4k-term x 500k-row chunk encode in
    ~10 ms instead of ~200 us per tiny group.

    Returns (list of per-group blobs, per-group max score component).
    """
    n = int(doc_ids.size)
    counts = np.diff(group_bounds)
    if n == 0:
        return [b""] * len(counts), np.zeros(len(counts))
    pos_in_group = np.arange(n) - np.repeat(group_bounds[:-1], counts)
    bstart_mask = (pos_in_group % block_size) == 0
    bstarts = np.flatnonzero(bstart_mask)
    bends = np.concatenate((bstarts[1:], [n]))

    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = 0
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    gaps[bstarts] = 0

    g_bytes, g_sz = _varint_encode_sizes(gaps)
    t_bytes, t_sz = _varint_encode_sizes(tfs)
    d_bytes, d_sz = _varint_encode_sizes(dls)
    g_off = np.concatenate(([0], np.cumsum(g_sz)))
    t_off = np.concatenate(([0], np.cumsum(t_sz)))
    d_off = np.concatenate(([0], np.cumsum(d_sz)))

    comp = bm25_tf_component(tfs, dls, avgdl)
    bmax = np.maximum.reduceat(comp, bstarts)
    gmax = np.maximum.reduceat(comp, group_bounds[:-1].clip(max=n - 1))
    gmax[counts == 0] = 0.0

    first = doc_ids[bstarts]
    last = doc_ids[bends - 1]
    gv = g_bytes.tobytes()
    tv = t_bytes.tobytes()
    dv = d_bytes.tobytes()
    # which group each block belongs to
    bgroup = np.searchsorted(group_bounds[:-1], bstarts, side="right") - 1
    pack = _HDR.pack
    parts: list[list[bytes]] = [[] for _ in counts]
    for i in range(len(bstarts)):
        s, e = int(bstarts[i]), int(bends[i])
        ga, gb = int(g_off[s]), int(g_off[e])
        ta, tb = int(t_off[s]), int(t_off[e])
        da, db = int(d_off[s]), int(d_off[e])
        parts[int(bgroup[i])].append(
            pack(
                e - s, gb - ga, tb - ta, db - da,
                int(first[i]), int(last[i]), float(bmax[i]),
            )
            + gv[ga:gb]
            + tv[ta:tb]
            + dv[da:db]
        )
    return [b"".join(p) for p in parts], gmax


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> tuple[bytes, float]:
    """Encode one term-shard posting run into concatenated blocks
    (sorts by doc_id).  Returns (blocks, max idf-free component)."""
    order = np.argsort(doc_ids, kind="stable")
    bounds = np.array([0, doc_ids.size], dtype=np.int64)
    blobs, gmax = encode_many(
        doc_ids[order], tfs[order], dls[order], bounds, avgdl, block_size
    )
    return blobs[0], float(gmax[0])


class BlockRef:
    """Parsed block header + payload offsets (no payload decode)."""

    __slots__ = ("count", "first_doc", "last_doc", "max_score",
                 "g_off", "g_len", "t_len", "d_len")

    def __init__(self, count, g_off, g_len, t_len, d_len,
                 first_doc, last_doc, max_score):
        self.count = count
        self.g_off = g_off
        self.g_len = g_len
        self.t_len = t_len
        self.d_len = d_len
        self.first_doc = first_doc
        self.last_doc = last_doc
        self.max_score = max_score


def scan_blocks(blocks: bytes) -> list[BlockRef]:
    """Parse headers only — the skip-pointer directory."""
    refs = []
    pos = 0
    n = len(blocks)
    while pos < n:
        count, g_len, t_len, d_len, first, last, mx = _HDR.unpack_from(
            blocks, pos
        )
        refs.append(
            BlockRef(count, pos + HEADER_SIZE, g_len, t_len, d_len,
                     first, last, mx)
        )
        pos += HEADER_SIZE + g_len + t_len + d_len
    return refs


def decode_block(blocks: bytes, ref: BlockRef):
    """-> (doc_ids, tfs, dls) int64 arrays for one block."""
    g0 = ref.g_off
    gaps = varint_decode(blocks[g0 : g0 + ref.g_len], ref.count)
    docs = np.cumsum(gaps) + ref.first_doc
    t0 = g0 + ref.g_len
    tfs = varint_decode(blocks[t0 : t0 + ref.t_len], ref.count)
    d0 = t0 + ref.t_len
    dls = varint_decode(blocks[d0 : d0 + ref.d_len], ref.count)
    return docs, tfs, dls


def decode_blocks(blocks: bytes, refs: list[BlockRef]):
    """Batch-decode a subset of blocks — (doc_ids, tfs, dls) concatenated.

    One varint_decode per SECTION across all requested blocks (varints
    are self-delimiting, so concatenated streams decode in one pass),
    not per block — numpy call overhead on ~128-value blocks otherwise
    dominates query latency.  Per-block delta-gap reset is applied with
    a segmented cumsum (global cumsum + per-block offset repeat).
    """
    if not refs:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    counts = np.array([r.count for r in refs], dtype=np.int64)
    total = int(counts.sum())
    g_buf = b"".join(blocks[r.g_off : r.g_off + r.g_len] for r in refs)
    t_buf = b"".join(
        blocks[r.g_off + r.g_len : r.g_off + r.g_len + r.t_len] for r in refs
    )
    d_buf = b"".join(
        blocks[
            r.g_off + r.g_len + r.t_len
            : r.g_off + r.g_len + r.t_len + r.d_len
        ]
        for r in refs
    )
    gaps = varint_decode(g_buf, total)
    tfs = varint_decode(t_buf, total)
    dls = varint_decode(d_buf, total)
    c = np.cumsum(gaps)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    firsts = np.array([r.first_doc for r in refs], dtype=np.int64)
    # docs[j in block i] = first_i + (c[j] - c[start_i]); gaps[start_i]==0
    offset = firsts - c[starts]
    docs = c + np.repeat(offset, counts)
    return docs, tfs, dls


def decode_all(blocks: bytes):
    """Decode every block — (doc_ids, tfs, dls) concatenated."""
    return decode_blocks(blocks, scan_blocks(blocks))
