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


def test_phrase_match_indexed_identical(spark):
    """Index-pruned quoted-query == full-scan matcher, including phrases
    with index-ineligible words (1-byte / >= 9-byte: absent from tf, so
    they cannot prune and must be verified by the adjacency scan)."""
    from tse_spark.operators import index_build as ib
    from tse_spark.operators import textops

    rows = [
        (1, "big data wins big data loses"),
        (2, "big data"),
        (3, "data big"),
        (4, "a big data x"),          # 1-byte neighbors
        (5, "wonderful9 big data"),   # >= 9-byte neighbor
        (6, "big whatever data"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    tf = ib.build_tf_ws(docs)

    def got(phrase, **kw):
        out = textops.phrase_match_indexed(docs, tf, phrase, **kw)
        return {(r["doc_id"], r["n_hits"]) for r in out.collect()}

    def want(phrase):
        out = textops.phrase_match(docs, phrase)
        return {(r["doc_id"], r["n_hits"]) for r in out.collect()}

    for phrase in ["big data", "a big data", "wonderful9 big", "x", "a x"]:
        assert got(phrase) == want(phrase), phrase
    # sanity on the values themselves
    assert got("big data") == {(1, 2), (2, 1), (4, 1), (5, 1)}
    # non-broadcast join path returns the same thing
    assert got("big data", broadcast_candidates=False) == {
        (1, 2), (2, 1), (4, 1), (5, 1)
    }


def test_phrase_match_indexed_plan_barrier(spark):
    """The adjacency zip_with must NOT be pushed below the candidate
    join: everything under the join on the docs side is scan+isnotnull,
    so only hash-join survivors pay the token-array match."""
    from tse_spark.operators import index_build as ib
    from tse_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "big data"), (2, "data big")], ["doc_id", "text"]
    )
    tf = ib.build_tf_ws(docs)
    out = textops.phrase_match_indexed(docs, tf, "big data")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan
    # the match may live in the post-join Project or as the join's
    # residual condition — but never in a pre-join Filter node
    bad = [
        ln
        for ln in plan.splitlines()
        if "zip_with" in ln and ln.lstrip(" :+-").startswith("Filter")
    ]
    assert not bad, "\n".join(bad)


def test_doc_keywords_tfidf_ranking(spark):
    import math

    from tse_spark.operators import index_build as ib
    from tse_spark.operators import textops

    rows = [
        (1, "spark spark spark join rare1"),
        (2, "spark join join table"),
        (3, "spark table table table"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tf = ib.build_tf_ws(docs)
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["score"])
        for r in textops.doc_keywords(tf, n_docs=3, k=2).collect()
    }
    # brute-force tf-idf over the same token law (2..8-byte terms)
    def s(tf_, df_):
        return round(tf_ * math.log(3 / df_), 4)

    # doc 1: spark tf3 df3 -> 0; join tf1 df2; rare1 tf1 df1
    assert got[(1, 1)] == ("rare1", s(1, 1))
    assert got[(1, 2)] == ("join", s(1, 2))
    # doc 2: join tf2 df2 beats table tf1 df2; spark 0
    assert got[(2, 1)] == ("join", s(2, 2))
    assert got[(2, 2)] == ("table", s(1, 2))
    # doc 3: table tf3 df2
    assert got[(3, 1)] == ("table", s(3, 2))
    # every doc has exactly k rows
    assert len(got) == 6


def test_keyset_page_partitions_ranking(spark):
    """Keyset pages tile the ranking exactly like offset paging —
    page1 + page2(after=page1 tail) == ordered top-2k, disjoint —
    including resume INSIDE a score tie (several rows share score)."""
    from pyspark.sql import functions as F

    from tse_spark.operators import textops as tx

    rows = [(i, float(s)) for i, s in enumerate([9, 7, 7, 7, 7, 5, 5, 3, 2, 1])]
    scored = spark.createDataFrame(rows, "doc_id long, score double")
    k = 3
    p1 = tx.keyset_page(scored, k)
    p2 = tx.keyset_page(scored, k, after=tx.page_tail(p1))
    got1 = [(r.doc_id, r.score) for r in p1.collect()]
    got2 = [(r.doc_id, r.score) for r in p2.collect()]
    want = [
        (r.doc_id, r.score)
        for r in scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(2 * k)
        .collect()
    ]
    assert got1 == want[:k]
    assert got2 == want[k : 2 * k]
    assert not set(d for d, _ in got1) & set(d for d, _ in got2)


def test_keyset_page_deep_cursor_empty_past_end(spark):
    """A cursor at the ranking's last row yields an empty page —
    termination is data-driven, no offset arithmetic."""
    from tse_spark.operators import textops as tx

    scored = spark.createDataFrame(
        [(1, 2.0), (2, 1.0)], "doc_id long, score double"
    )
    last = tx.page_tail(tx.keyset_page(scored, 2))
    assert tx.keyset_page(scored, 2, after=last).count() == 0


# ---------------------------------------------------------------------------
# X110 next-word index
# ---------------------------------------------------------------------------

def test_nextword_tf_counts_overlaps(spark):
    from tse_spark.operators import textops

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "x y x y"), (2, "b")],
        "doc_id long, text string",
    )
    got = {
        (r["bigram"], r["doc_id"]): r["tf"]
        for r in textops.nextword_tf(docs).collect()
    }
    assert got == {
        ("a a", 0): 2,  # overlapping adjacency counts twice
        ("a b", 0): 1,
        ("x y", 1): 2,
        ("y x", 1): 1,
    }


def test_phrase_nextword_equals_scan(spark, pages_df):
    """The next-word paths reproduce phrase_match exactly on the
    fixture corpus for 2- and 3-word phrases (incl. a repeated-word
    phrase, where the pair set dedups)."""
    from tse_spark.operators import index_build as ib
    from tse_spark.operators import textops

    docs = ib.build_docs(pages_df).select("doc_id", "text")
    nw = textops.nextword_tf(docs).cache()
    for phrase in ["web search", "search engine", "the web search",
                   "web web"]:
        want = {
            (r["doc_id"], r["n_hits"])
            for r in textops.phrase_match(docs, phrase).collect()
        }
        got = {
            (r["doc_id"], r["n_hits"])
            for r in textops.phrase_match_nextword(
                nw, phrase, docs=docs
            ).collect()
        }
        assert got == want, phrase
    nw.unpersist()


def test_phrase_nextword_guards(spark):
    from tse_spark.operators import textops
    import pytest as _pt

    nw = spark.createDataFrame([], "bigram string, doc_id long, tf long")
    with _pt.raises(ValueError):
        textops.phrase_match_nextword(nw, "single")
    with _pt.raises(ValueError):
        textops.phrase_match_nextword(nw, "three word phrase")  # no docs
