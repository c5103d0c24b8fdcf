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


def test_phrase_match_two_words(spark):
    rows = [
        (1, "big data big data"),   # 2 hits
        (2, "big and data"),        # not adjacent
        (3, "BIG  DATA"),           # case/whitespace folded -> 1 hit
        (4, "data big"),            # wrong order
        (5, "big"),                 # shorter than the phrase
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["n_hits"])
        for r in textops.phrase_match(df, "Big Data").collect()
    }
    assert got == {(1, 2), (3, 1)}


def test_phrase_match_three_words_overlapping(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a b a a a")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["n_hits"])
        for r in textops.phrase_match(df, "a a a").collect()
    }
    # doc 1: starts at 1 and 2; doc 2: only the trailing run
    assert got == {(1, 2), (2, 1)}


def test_spell_suggest(spark):
    rows = [
        (1, "spark spark spark sparse spars park ship"),
        (2, "spark sharp spam"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from tse_spark.operators import index_build as ib

    tf = ib.build_tf_ws(docs)
    got = [
        (r["term"], r["dist"], r["df"])
        for r in textops.spell_suggest(
            ib.build_df_stats(tf), "spakr", k=3
        ).collect()
    ]
    # dist 1: none; dist 2: spark (df 2) wins over spars/sharp...
    assert got[0] == ("spark", 2, 2)
    assert all(d <= 2 for _, d, _ in got)
