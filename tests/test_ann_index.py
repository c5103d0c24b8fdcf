"""Materialized ANN indexes: identical results to the on-the-fly paths,
and a physical proof that queries read only probed partitions.

The pruning proof corrupts every NON-probed bucket's parquet files on
disk after the build: a partition-pruned scan never opens them, so the
query still succeeds and matches — a full scan would throw.  This is
stronger than asserting on the explain() text (which proves intent, not
behavior); the explain assertion is kept as a plan-shape check too.
"""

import os

import pytest

from tse_spark.operators import similarity

SF = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def qv(emb):
    return similarity.get_query_vec(emb, 0)


@pytest.fixture(scope="module")
def lsh_index(emb, qv, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lsh_idx"))
    similarity.build_lsh_signature_table(
        emb, out, dim=len(qv), n_planes=2, n_bands=8, seed=7
    )
    return out


@pytest.fixture(scope="module")
def ivf_index(emb, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivf_idx"))
    similarity.build_ivf_cell_table(emb, out, n_cells=8)
    return out


def _rows(df):
    return [
        (r["vec_id"], r["label"], r["cos"])
        for r in df.collect()
    ]


def test_lsh_indexed_equals_on_the_fly(spark, emb, qv, lsh_index):
    fly = similarity.lsh_ann_topk(
        spark, emb, qv, K, n_planes=2, n_bands=8, seed=7
    )
    idx = similarity.lsh_ann_topk_indexed(spark, lsh_index, qv, K)
    assert _rows(idx) == _rows(fly)


def test_ivf_indexed_equals_on_the_fly(spark, emb, qv, ivf_index):
    fly = similarity.ivf_ann_topk(
        emb, qv, K, n_cells=8, n_probe=2, exclude_id=0
    )
    idx = similarity.ivf_ann_topk_indexed(
        spark, ivf_index, qv, K, n_probe=2, exclude_id=0
    )
    assert _rows(idx) == _rows(fly)


def _corrupt_unprobed(data_dir: str, keep_dirs: set[str]) -> int:
    """Overwrite parquet files in every partition dir NOT in keep_dirs
    with garbage; returns how many files were corrupted."""
    n = 0
    for root, _dirs, files in os.walk(data_dir):
        rel = os.path.relpath(root, data_dir)
        if rel == "." or any(rel == k or rel.startswith(k + os.sep)
                             for k in keep_dirs):
            continue
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "wb") as fh:
                    fh.write(b"not a parquet file")
                n += 1
    return n


def test_lsh_indexed_scan_prunes_to_probed_buckets(spark, qv, lsh_index):
    import json

    with open(os.path.join(lsh_index, "meta.json")) as f:
        meta = json.load(f)
    probes = similarity._lsh_probes(
        qv, meta["n_planes"], meta["n_bands"], meta["seed"], 1
    )
    keep = {os.path.join(f"band={b}", f"sig={s}") for b, s in probes}
    data_dir = os.path.join(lsh_index, "data")
    # plan shape: the partition predicate must reach the scan
    explained = similarity.lsh_ann_topk_indexed(
        spark, lsh_index, qv, K
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in explained and "band" in explained
    # physical proof: poison every non-probed bucket; a pruned scan
    # never opens them
    n = _corrupt_unprobed(data_dir, keep)
    assert n > 0, "expected at least one non-probed bucket to corrupt"
    out = similarity.lsh_ann_topk_indexed(spark, lsh_index, qv, K)
    got = _rows(out)
    assert len(got) == K and got[0][0] == 0  # vec 0 is its own nearest


def test_ivf_indexed_scan_prunes_to_probed_cells(spark, qv, ivf_index):
    import json

    with open(os.path.join(ivf_index, "meta.json")) as f:
        meta = json.load(f)
    probe = similarity._ivf_probe_cells(meta["centroids"], qv, 2)
    keep = {f"cell={c}" for c in probe}
    data_dir = os.path.join(ivf_index, "data")
    n = _corrupt_unprobed(data_dir, keep)
    assert n > 0
    out = similarity.ivf_ann_topk_indexed(
        spark, ivf_index, qv, K, n_probe=2, exclude_id=0
    )
    assert len(_rows(out)) == K


def test_indexed_rejects_wrong_dim(spark, lsh_index):
    with pytest.raises(ValueError, match="dim"):
        similarity.lsh_ann_topk_indexed(spark, lsh_index, [1.0, 2.0], K)


# ---------------------------------------------------------------------------
# O(delta) append + compaction
# ---------------------------------------------------------------------------

def _split(emb, cut=300):
    return emb.filter(emb.vec_id < cut), emb.filter(emb.vec_id >= cut)


@pytest.fixture()
def appended_lsh(spark, emb, qv, tmp_path):
    """base(vec_id<300) + appended rest, plus a full one-shot build."""
    base, delta = _split(emb)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    similarity.build_lsh_signature_table(
        base, inc, dim=len(qv), n_planes=2, n_bands=8, seed=7
    )
    similarity.append_ann_index(spark, inc, delta)
    similarity.build_lsh_signature_table(
        emb, full, dim=len(qv), n_planes=2, n_bands=8, seed=7
    )
    return inc, full


def test_lsh_append_equals_full_build(spark, qv, appended_lsh):
    inc, full = appended_lsh
    got = _rows(similarity.lsh_ann_topk_indexed(spark, inc, qv, K))
    want = _rows(similarity.lsh_ann_topk_indexed(spark, full, qv, K))
    assert got == want


def test_ivf_append_equals_full_build(spark, emb, qv, tmp_path):
    base, delta = _split(emb)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    # centroid seeds (vec_id < 8) are all in the base slice, so the
    # incremental index assigns deltas with the SAME centroids as full
    similarity.build_ivf_cell_table(base, inc, n_cells=8)
    similarity.append_ann_index(spark, inc, delta)
    similarity.build_ivf_cell_table(emb, full, n_cells=8)
    got = _rows(
        similarity.ivf_ann_topk_indexed(spark, inc, qv, K, n_probe=2)
    )
    want = _rows(
        similarity.ivf_ann_topk_indexed(spark, full, qv, K, n_probe=2)
    )
    assert got == want


def test_append_antijoin_drops_resent_vectors(spark, emb, qv, appended_lsh):
    import json

    inc, _ = appended_lsh
    # re-send an overlapping slice: all of it must be dropped
    similarity.append_ann_index(spark, inc, emb.filter(emb.vec_id < 350))
    with open(os.path.join(inc, "meta.json")) as f:
        meta = json.load(f)
    rows = similarity._read_pinned(
        spark, meta, similarity._index_dirs(inc, meta)
    )
    n_vecs = emb.count()
    assert rows.count() == n_vecs * meta["n_bands"]
    assert rows.select("vec_id", "band").distinct().count() == (
        n_vecs * meta["n_bands"]
    )


def test_append_crash_before_publish_leaves_index_intact(
    spark, emb, qv, tmp_path, monkeypatch
):
    base, delta = _split(emb)
    inc = str(tmp_path / "inc")
    similarity.build_lsh_signature_table(
        base, inc, dim=len(qv), n_planes=2, n_bands=8, seed=7
    )
    before = _rows(similarity.lsh_ann_topk_indexed(spark, inc, qv, K))

    def boom(*a, **k):
        raise OSError("injected crash before meta publish")

    monkeypatch.setattr(similarity, "_publish_meta", boom)
    with pytest.raises(OSError, match="injected"):
        similarity.append_ann_index(spark, inc, delta)
    monkeypatch.undo()
    # torn append invisible: readers see exactly the pre-append index
    assert _rows(
        similarity.lsh_ann_topk_indexed(spark, inc, qv, K)
    ) == before
    # retry overwrites the orphan delta dir and succeeds
    similarity.append_ann_index(spark, inc, delta)
    full = str(tmp_path / "full")
    similarity.build_lsh_signature_table(
        emb, full, dim=len(qv), n_planes=2, n_bands=8, seed=7
    )
    assert _rows(
        similarity.lsh_ann_topk_indexed(spark, inc, qv, K)
    ) == _rows(similarity.lsh_ann_topk_indexed(spark, full, qv, K))


def test_compact_folds_deltas_to_one_dir(spark, emb, qv, tmp_path):
    import json

    base, delta = _split(emb)
    d1, d2 = _split(delta, 400)
    inc = str(tmp_path / "inc")
    similarity.build_lsh_signature_table(
        base, inc, dim=len(qv), n_planes=2, n_bands=8, seed=7
    )
    similarity.append_ann_index(spark, inc, d1)
    similarity.append_ann_index(spark, inc, d2)
    before = _rows(similarity.lsh_ann_topk_indexed(spark, inc, qv, K))
    similarity.compact_ann_index(spark, inc)
    with open(os.path.join(inc, "meta.json")) as f:
        meta = json.load(f)
    assert meta["data_dirs"] == ["data_v0001"]
    assert not os.path.exists(os.path.join(inc, "data"))
    assert not os.path.exists(os.path.join(inc, "data_delta_0001"))
    assert _rows(
        similarity.lsh_ann_topk_indexed(spark, inc, qv, K)
    ) == before


# ---------------------------------------------------------------------------
# int8 code table
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def int8_index(emb, qv, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("int8_idx"))
    similarity.build_int8_code_table(emb, out, dim=len(qv))
    return out


def test_int8_indexed_equals_on_the_fly(spark, emb, qv, int8_index):
    fly = [
        (r["vec_id"], r["label"], r["qcos"], r["qscale"])
        for r in similarity.int8_ann_topk(emb, qv, K, exclude_id=0).collect()
    ]
    idx = [
        (r["vec_id"], r["label"], r["qcos"], r["qscale"])
        for r in similarity.int8_ann_topk_indexed(
            spark, int8_index, qv, K, exclude_id=0
        ).collect()
    ]
    # BLAS matmul over exact-integer codes == JVM left fold, bit for bit
    assert idx == fly


def test_int8_indexed_rerank_recovers_exact(spark, emb, qv, int8_index):
    exact = [
        (r["vec_id"], r["cos"])
        for r in similarity.cosine_topk(emb, qv, K, exclude_id=0).collect()
    ]
    got = [
        (r["vec_id"], r["cos"])
        for r in similarity.int8_ann_topk_rerank_indexed(
            spark, int8_index, emb, qv, K, mult=4, exclude_id=0
        ).collect()
    ]
    assert got == exact


def test_int8_coarse_never_reads_float_table(spark, qv, int8_index):
    # the coarse plan's only scan location is the code table
    plan = similarity.int8_ann_topk_indexed(
        spark, int8_index, qv, K
    )._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in plan
    assert int8_index in plan


def test_int8_codes_are_smaller_than_floats(int8_index):
    code_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(int8_index, "data"))
        for f in fs if f.endswith(".parquet")
    )
    float_bytes = os.path.getsize(f"{SF}/embeddings.parquet")
    # dim bytes vs dim*4 float32 — parquet encodings blur the exact 4x,
    # but the code table must be decisively smaller
    assert code_bytes < 0.6 * float_bytes


def test_int8_indexed_rejects_wrong_dim(spark, int8_index):
    with pytest.raises(ValueError):
        similarity.int8_ann_topk_indexed(spark, int8_index, [1.0, 2.0], K)


def test_int8_append_and_compact_equal_full_build(
    spark, emb, qv, int8_index, tmp_path
):
    out = str(tmp_path / "int8_appended")
    similarity.build_int8_code_table(
        emb.filter(emb.vec_id % 2 == 0), out, dim=len(qv)
    )
    similarity.append_ann_index(
        spark, out, emb.filter(emb.vec_id % 2 == 1), assume_disjoint=True
    )
    full = [
        tuple(r)
        for r in similarity.int8_ann_topk_indexed(
            spark, int8_index, qv, K, exclude_id=0
        ).collect()
    ]
    appended = [
        tuple(r)
        for r in similarity.int8_ann_topk_indexed(
            spark, out, qv, K, exclude_id=0
        ).collect()
    ]
    assert appended == full
    # compaction folds base + delta into one dir, results unchanged
    similarity.compact_ann_index(spark, out)
    import json as _json

    with open(os.path.join(out, "meta.json")) as f:
        assert _json.load(f)["data_dirs"] == ["data_v0001"]
    compacted = [
        tuple(r)
        for r in similarity.int8_ann_topk_indexed(
            spark, out, qv, K, exclude_id=0
        ).collect()
    ]
    assert compacted == full


def test_delete_vectors_masks_then_compacts(spark, emb, qv, tmp_path):
    """Vector deletion (the ANN twin of plans/delete.py): tombstoned
    vectors vanish from indexed serving immediately, the top-k refills
    with the next survivor, redeletes are no-ops, and compaction folds
    the deletes physically and clears the mask."""
    out = str(tmp_path / "lsh_del")
    similarity.build_lsh_signature_table(
        emb, out, dim=len(qv), n_planes=2, n_bands=8, seed=7
    )
    full = _rows(
        similarity.lsh_ann_topk_indexed(spark, out, qv, K, exclude_id=0)
    )
    dead = [full[0][0], full[1][0]]
    n = similarity.delete_vectors(spark, out, dead)
    assert n == 2
    masked = _rows(
        similarity.lsh_ann_topk_indexed(spark, out, qv, K, exclude_id=0)
    )
    assert not {v for v, _, _ in masked} & set(dead)
    # stale-free refill: masked == full minus dead, shifted up
    want = [r for r in full if r[0] not in dead]
    assert masked[: len(want)] == want
    # redelete: no new version
    import json

    with open(os.path.join(out, "meta.json")) as f:
        v1 = json.load(f)["tombstone_version"]
    assert similarity.delete_vectors(spark, out, dead) == 2
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f)["tombstone_version"] == v1
    # compact folds: mask cleared, rows physically gone, serving equal
    similarity.compact_ann_index(spark, out)
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert "tombstones_dir" not in meta
    live = similarity._read_pinned(
        spark, meta, similarity._index_dirs(out, meta)
    )
    assert live.filter(live.vec_id.isin([int(d) for d in dead])).count() == 0
    after = _rows(
        similarity.lsh_ann_topk_indexed(spark, out, qv, K, exclude_id=0)
    )
    assert after == masked
    # int8 tier: same contract through the shared live-read
    out2 = str(tmp_path / "int8_del")
    similarity.build_int8_code_table(emb, out2, dim=len(qv))
    coarse = similarity.int8_ann_topk_indexed(spark, out2, qv, K).collect()
    v0 = coarse[0]["vec_id"]
    similarity.delete_vectors(spark, out2, [int(v0)])
    coarse2 = similarity.int8_ann_topk_indexed(spark, out2, qv, K).collect()
    assert all(r["vec_id"] != v0 for r in coarse2) and len(coarse2) == K
