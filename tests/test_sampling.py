"""Unit tests for training-mix sampling, sequence packing, and PII
redaction — hand-computed expectations on tiny corpora; sf0.01 oracle
equivalence lives in test_entry_contract."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tse_spark.operators import sampling, textops


def _docs(spark, rows, schema="doc_id long, text string, source string"):
    return spark.createDataFrame(rows, schema)


def test_mix_sample_deterministic_and_nested(spark):
    rows = [(i, "t", "a" if i % 2 == 0 else "b") for i in range(200)]
    docs = _docs(spark, rows)
    kept_lo = {
        r["doc_id"]
        for r in sampling.mix_sample(docs, {"a": 0.3, "b": 0.0}).collect()
    }
    # same law, different partitioning -> identical membership
    kept_lo2 = {
        r["doc_id"]
        for r in sampling.mix_sample(
            docs.repartition(7), {"a": 0.3, "b": 0.0}
        ).collect()
    }
    assert kept_lo == kept_lo2 and kept_lo
    # raising a source's rate only ADDS docs (hash thresholds nest)
    kept_hi = {
        r["doc_id"]
        for r in sampling.mix_sample(docs, {"a": 0.7, "b": 0.0}).collect()
    }
    assert kept_lo <= kept_hi and len(kept_hi) > len(kept_lo)
    # source b at rate 0 contributes nothing
    assert all(i % 2 == 0 for i in kept_hi)
    # a different salt draws an independent mix
    kept_salt = {
        r["doc_id"]
        for r in sampling.mix_sample(
            docs, {"a": 0.3, "b": 0.0}, salt="other"
        ).collect()
    }
    assert kept_salt != kept_lo


def test_mix_report_counts(spark):
    rows = [(i, "t", "a" if i % 2 == 0 else "b") for i in range(200)]
    docs = _docs(spark, rows)
    rep = {
        r["source"]: r.asDict()
        for r in sampling.mix_report(docs, {"a": 0.3, "b": 0.0}).collect()
    }
    kept = sampling.mix_sample(docs, {"a": 0.3, "b": 0.0}).count()
    assert rep["a"]["n_total"] == 100 and rep["b"]["n_total"] == 100
    assert rep["a"]["n_kept"] == kept and rep["b"]["n_kept"] == 0
    assert rep["a"]["target_rate"] == pytest.approx(0.3)
    assert rep["a"]["observed_rate"] == pytest.approx(kept / 100)


def test_pack_sequences_exact_boundaries(spark):
    # one shard (ids all % 8 == 0): token counts 4, 8, 5 at budget 10
    # -> doc spans [0,4) [4,12) [12,17):
    #    seq 0 = 4 + 6 = 10 tokens / 2 docs (doc 2 straddles)
    #    seq 1 = 2 + 5 =  7 tokens / 2 docs
    docs = _docs(
        spark,
        [
            (0, "a b c d", "s"),
            (8, "e f g h i j k l", "s"),
            (16, "m n o p q", "s"),
        ],
    )
    out = {
        (r["shard"], r["seq_id"]): r.asDict()
        for r in sampling.pack_sequences(docs, budget=10, n_shards=8)
        .collect()
    }
    assert set(out) == {(0, 0), (0, 1)}
    assert out[(0, 0)]["n_tokens"] == 10 and out[(0, 0)]["n_docs"] == 2
    assert out[(0, 1)]["n_tokens"] == 7 and out[(0, 1)]["n_docs"] == 2


def test_pack_sequences_conserves_tokens(spark):
    docs = _docs(
        spark,
        [(i, " ".join(f"w{j}" for j in range(1 + i % 13)), "s")
         for i in range(100)],
    )
    packed = sampling.pack_sequences(docs, budget=32, n_shards=4)
    total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    want = sum(1 + i % 13 for i in range(100))
    assert total == want
    # every interior sequence is exactly full
    interior = (
        packed.withColumn(
            "last",
            F.col("seq_id")
            == F.max("seq_id").over(Window.partitionBy("shard")),
        )
        .filter(~F.col("last"))
        .select("n_tokens")
        .collect()
    )
    assert interior and all(r["n_tokens"] == 32 for r in interior)


def test_pii_redact(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob@example.com ip 10.0.0.1 ph 555-867-5309 done"),
            (2, "clean text only"),
            # phone-shaped digits inside an email count once, as email
            (3, "x 555-123-4567@mail.example.org y"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in textops.pii_redact(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ip"] == 1
    assert out[1]["n_phone"] == 1
    assert out[1]["redacted"] == "mail <EMAIL> ip <IP> ph <PHONE> done"
    assert out[2]["redacted"] == "clean text only"
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[3]["n_email"] == 1 and out[3]["n_phone"] == 0
    assert out[3]["redacted"] == "x <EMAIL> y"
