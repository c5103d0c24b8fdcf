"""bigram_counts edge cases: adjacency inside the token array, docs
with 0 or 1 tokens contribute nothing, whitespace runs collapse."""

from tse_spark.operators import textops


def test_bigram_counts(spark):
    rows = [
        (1, "big data big data big"),
        (2, "  one  "),          # 1 token -> no bigrams
        (3, ""),                 # empty -> no bigrams
        (4, "Big\tdata\nrocks"), # case-folded, any whitespace
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["bigram"], r["n"]) for r in textops.bigram_counts(df).collect()
    }
    assert got == {
        ("big data", 3),
        ("data big", 2),
        ("data rocks", 1),
    }
