"""Unit tests for the training-data pipeline filters:
benchmark decontamination (n-gram overlap) and Gopher-style
repetition stats.  Hand-computed expectations on tiny corpora; the
sf0.01 oracle equivalence lives in test_entry_contract."""

import pytest

from tse_spark.operators import dedup, textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_contamination_counts(spark):
    bench = _docs(spark, [(100, "a b c d e f")])  # grams: abcde, bcdef
    train = _docs(
        spark,
        [
            # contains 'a b c d e' once (distinct), 5 grams total
            (1, "x a b c d e y z w v"),
            # contains both bench grams, 2 grams total
            (2, "a b c d e f"),
            # no overlap
            (3, "p q r s t u v"),
            # too short for any 5-gram
            (4, "a b c"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.ngram_contamination(train, bench, n=5).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 6 and out[1]["n_contaminated"] == 1
    assert out[2]["n_grams"] == 2 and out[2]["n_contaminated"] == 2
    assert out[2]["contam_frac"] == 1.0


def test_ngram_contamination_min_frac(spark):
    bench = _docs(spark, [(100, "a b c d e")])
    train = _docs(spark, [(1, "a b c d e x y z w v u t s r q p")])
    # 1 hit / 12 grams = 0.083...; a 0.5 floor drops it
    assert (
        dedup.ngram_contamination(train, bench, n=5, min_frac=0.5).count()
        == 0
    )


def test_repetition_stats_flags_repeats(spark):
    docs = _docs(
        spark,
        [
            # 'spam ham' bigram 5x in 10 tokens -> top_bigram_frac 1.0;
            # trigrams all dup after the first two distinct
            (1, "spam ham spam ham spam ham spam ham spam ham"),
            # all-distinct tokens: top bigram count 1, no dup trigrams
            (2, "a b c d e f g h i j"),
            # below the 3-token floor: excluded entirely
            (3, "x y"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in textops.repetition_stats(docs).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["dup_trigram_frac"] == pytest.approx(0.75)
    assert out[1]["keep"] == 0
    # 10 all-distinct tokens: 2*1/10 = 0.2 still trips the 0.18 bigram
    # threshold — the short-doc floor Gopher pairs with a length filter
    assert out[2]["top_bigram_frac"] == pytest.approx(0.2)
    assert out[2]["dup_trigram_frac"] == 0.0
    assert out[2]["keep"] == 0


def test_repetition_stats_keep_threshold(spark):
    # 20 distinct tokens: top bigram 2/20 = 0.1 <= 0.18, dup tri 0 -> keep
    text = " ".join(f"t{i}" for i in range(20))
    docs = _docs(spark, [(1, text)])
    row = textops.repetition_stats(docs).collect()[0]
    assert row["keep"] == 1
