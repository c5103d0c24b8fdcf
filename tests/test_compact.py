"""compact_index: deltas fold into single base dirs, rankings invariant,
crash before the meta publish leaves the uncompacted index intact."""

import json
import os

import pytest

from tse_spark import fixtures
from tse_spark.plans import append as ap
from tse_spark.plans import compact as cm
from tse_spark.plans import pipeline as pl

GB = "gb2312"
QUERIES = ["web search", "搜索引擎", "spark data query", "w0001", "数据 query"]


@pytest.fixture(scope="module")
def idx(tmp_path_factory, spark):
    """Base build + two appends (the second with longer docs so avgdl
    drifts and bound_scale engages pre-compact)."""
    d = tmp_path_factory.mktemp("cmp_data")
    srcs = []
    for name, (n, start, ls) in {
        "a": (200, 0, 1), "b": (100, 200, 1), "c": (80, 300, 3)
    }.items():
        p = str(d / name)
        spark.createDataFrame(
            fixtures.gen_pages(n, start=start, length_scale=ls)
        ).write.mode("overwrite").parquet(p)
        srcs.append(p)
    out = str(tmp_path_factory.mktemp("cmp_idx"))
    pipe = pl.IndexPipeline(
        spark, out, tokenizer="tse", dictionary=fixtures.mini_dict_bytes(),
        num_shards=5, block_size=32, num_partitions=4,
    )
    pipe.run_from_pages(srcs[0], resume=False)
    ap.append_pages(spark, out, srcs[1], fixtures.mini_dict_bytes())
    h = ap.append_pages(spark, out, srcs[2], fixtures.mini_dict_bytes())
    return out, h, srcs


def _search_all(h, k=500):
    h.engine.warm()
    return {
        q: [(d, round(s, 9)) for d, s in h.engine.search_local(q, k)]
        for q in QUERIES
    }


def test_compact_collapses_and_preserves_rankings(spark, idx):
    out, h_pre, _ = idx
    assert h_pre.engine.bound_scale > 1.0  # deltas drifted avgdl
    before = _search_all(h_pre)
    stats_before = {
        r["term"]: (r["df"], r["cf"])
        for r in h_pre.term_stats.collect()
    }
    h = cm.compact_index(spark, out, fixtures.mini_dict_bytes())
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert len(meta["docs_dirs"]) == 1 and len(meta["postings_dirs"]) == 1
    assert meta["enc_avgdl"] == meta["avgdl"]
    assert h.engine.bound_scale == 1.0
    assert h.n_docs == h_pre.n_docs
    assert h.avgdl == pytest.approx(h_pre.avgdl, rel=1e-12)
    # doc ids are NOT renumbered -> rankings compare directly
    assert _search_all(h) == before
    stats_after = {
        r["term"]: (r["df"], r["cf"]) for r in h.term_stats.collect()
    }
    assert stats_after == stats_before
    # re-sharded to the uniform decomposition over the live doc range
    shards = sorted(
        r["shard"]
        for r in h.postings.select("shard").distinct().collect()
    )
    assert max(shards) < meta["num_shards"]


def test_compact_is_noop_on_fresh_index(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("noop_src") / "p")
    spark.createDataFrame(
        fixtures.gen_pages(80, start=0)
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path_factory.mktemp("noop_idx"))
    pl.IndexPipeline(
        spark, out, tokenizer="tse", dictionary=fixtures.mini_dict_bytes(),
        num_shards=4, block_size=32, num_partitions=4,
    ).run_from_pages(src, resume=False)
    h = cm.compact_index(spark, out, fixtures.mini_dict_bytes())
    assert h.n_docs > 0
    assert not any(
        d.startswith(("docs_base_v", "postings_base_v"))
        for d in os.listdir(out)
    )


def test_crash_before_publish_leaves_old_index(spark, idx, monkeypatch):
    out, _, _ = idx
    # fresh appended state: rebuild a small delta chain in a copy? No —
    # idx was already compacted by the first test; append once more so
    # there is again something to compact
    src_dir = os.path.join(out, "_recrawl_src")
    spark.createDataFrame(
        fixtures.gen_pages(60, start=500)
    ).write.mode("overwrite").parquet(src_dir)
    h_pre = ap.append_pages(spark, out, src_dir, fixtures.mini_dict_bytes())
    before = _search_all(h_pre)
    with open(os.path.join(out, "meta.json")) as f:
        meta_before = f.read()

    real_replace = os.replace

    def boom(src, dst):
        if str(dst).endswith("meta.json"):
            raise OSError("injected crash before publish")
        return real_replace(src, dst)

    monkeypatch.setattr(cm.os, "replace", boom)
    with pytest.raises(OSError, match="injected"):
        cm.compact_index(spark, out, fixtures.mini_dict_bytes())
    monkeypatch.undo()

    with open(os.path.join(out, "meta.json")) as f:
        assert f.read() == meta_before  # publish never happened
    h_after_crash = pl.load_index(spark, out, fixtures.mini_dict_bytes())
    assert _search_all(h_after_crash) == before
    # retry overwrites the same version dirs and succeeds
    h = cm.compact_index(spark, out, fixtures.mini_dict_bytes())
    assert _search_all(h) == before


def test_append_after_compact_chains(spark, idx):
    out, _, _ = idx
    src_dir = os.path.join(out, "_post_compact_src")
    spark.createDataFrame(
        fixtures.gen_pages(50, start=700)
    ).write.mode("overwrite").parquet(src_dir)
    h0 = pl.load_index(spark, out, fixtures.mini_dict_bytes())
    h1 = ap.append_pages(spark, out, src_dir, fixtures.mini_dict_bytes())
    assert h1.n_docs > h0.n_docs
    # delta shards land strictly above the compacted decomposition
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert len(meta["postings_dirs"]) == 2
