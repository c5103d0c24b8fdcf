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
