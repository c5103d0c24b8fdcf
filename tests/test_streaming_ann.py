"""Streaming ANN ingest (streaming/ann_ingest.py): a drained vector
stream serves identically to a full build, restart over the same
checkpoint is a no-op, and periodic compaction folds the deltas."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tse_spark.operators import similarity
from tse_spark.streaming import ann_ingest

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
def streamed(tmp_path_factory, spark, emb, qv):
    root = tmp_path_factory.mktemp("ann_stream")
    # base index over even ids; odd ids arrive via the stream in 3 files
    idx = str(root / "idx")
    similarity.build_lsh_signature_table(
        emb.filter(F.col("vec_id") % 2 == 0), idx,
        dim=len(qv), n_planes=2, n_bands=8, seed=7,
    )
    stream_dir = str(root / "in")
    os.makedirs(stream_dir)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    for i in range(3):
        odd.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(stream_dir, f"f{i}"))
    # flatten: file source wants files under one dir
    import shutil

    for i in range(3):
        sub = os.path.join(stream_dir, f"f{i}")
        for name in os.listdir(sub):
            if name.endswith(".parquet"):
                shutil.move(
                    os.path.join(sub, name),
                    os.path.join(stream_dir, f"part{i}.parquet"),
                )
        shutil.rmtree(sub)
    ckpt = str(root / "ckpt")
    q = ann_ingest.ann_append_stream(
        ann_ingest.read_vectors_stream(
            spark, stream_dir, max_files_per_trigger=1
        ),
        idx,
        checkpoint_dir=ckpt,
        compact_every=2,
    )
    q.awaitTermination(600)
    return idx, stream_dir, ckpt


def test_streamed_serving_equals_full_build(
    spark, emb, qv, streamed, tmp_path
):
    idx, _, _ = streamed
    full = str(tmp_path / "full")
    similarity.build_lsh_signature_table(
        emb, full, dim=len(qv), n_planes=2, n_bands=8, seed=7
    )
    a = [
        (r["vec_id"], round(r["cos"], 9))
        for r in similarity.lsh_ann_topk_indexed(
            spark, idx, qv, K, exclude_id=0
        ).collect()
    ]
    b = [
        (r["vec_id"], round(r["cos"], 9))
        for r in similarity.lsh_ann_topk_indexed(
            spark, full, qv, K, exclude_id=0
        ).collect()
    ]
    assert a == b and len(a) == K


def test_compact_every_folded_deltas(streamed):
    idx, _, _ = streamed
    with open(os.path.join(idx, "meta.json")) as f:
        meta = json.load(f)
    # 3 batches with compact_every=2: compaction ran after batch 2,
    # batch 3 added one delta on top of the compacted base
    assert len(meta["data_dirs"]) <= 2
    assert any(d.startswith("data_v") for d in meta["data_dirs"])


def test_stream_restart_is_noop(spark, streamed):
    idx, stream_dir, ckpt = streamed
    with open(os.path.join(idx, "meta.json")) as f:
        before = json.load(f)
    q = ann_ingest.ann_append_stream(
        ann_ingest.read_vectors_stream(spark, stream_dir),
        idx,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(300)
    with open(os.path.join(idx, "meta.json")) as f:
        after = json.load(f)
    assert after["data_dirs"] == before["data_dirs"]
