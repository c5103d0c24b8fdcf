"""Text-analysis operators over clean text tables (training-data pipeline).

All SQL-expressible (whole-stage codegen, no Python): token counting,
quality scoring, language-ID heuristic, fingerprinting, snippets and the
grep-style scan search (reference Q12, tse/Search.cpp).  Each has an
equivalent ANSI-SQL oracle in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Heuristic stopword sets for language scoring.  Deterministic toy sets —
# the contract is the operator shape (per-language hit counts -> argmax),
# not linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "de", "que", "los"),
}

STOPWORDS: tuple[str, ...] = LANG_STOPWORDS["en"]


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term) — lowercase whitespace tokens, empties dropped."""
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.octet_length("term") > 0)


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct) per document."""
    return (
        tokens(docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("term").alias("n_distinct"),
        )
    )


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(bigram, n) — corpus counts of adjacent token pairs (same
    lowercase whitespace tokenization as :func:`tokens`), the phrase
    statistic collocation mining / phrase suggesters start from.

    Adjacency is computed INSIDE the token array (``zip_with`` over two
    slices of the same array) so no positions ever shuffle — only the
    (bigram, partial count) pairs after the map-side combine.  At 100 TB
    that means one hash-agg shuffle over the bigram vocabulary, never an
    occurrence-level exchange or a positional self-join."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )
    bigrams = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def phrase_match(
    docs: DataFrame, phrase: str, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_hits) for documents containing the exact token-adjacent
    phrase — the serving-side "quoted query" feature.  The n-gram is
    matched inside each doc's token array (the same zip_with-over-slices
    construction as :func:`bigram_counts`, generalized to len(phrase)
    words), so matching is pure codegen and positions never shuffle;
    only matching (doc_id, n_hits) rows leave the scan.

    Tokenization matches :func:`tokens` (lowercase, whitespace), so
    "big data" matches "Big  DATA" but not "bigdata"."""
    words = _phrase_words(phrase)
    n_hits = _phrase_hits_expr(words, text_col)
    return (
        docs.select("doc_id", n_hits.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


def _phrase_words(phrase: str) -> list[str]:
    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("empty phrase")
    return words


def _phrase_hits_expr(words: list[str], text_col: str):
    """Occurrence count of the token-adjacent word n-gram inside
    ``text_col``'s (lowercase, whitespace) token array, as one codegen
    expression shared by the scan and index-pruned matchers."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )
    n = len(words)
    # acc[i] = true iff the phrase starts at token position i+1: start
    # from word-0 equality over the window slice, then AND in each
    # subsequent word's shifted slice
    win_len = F.greatest(F.size(arr) - (n - 1), F.lit(0))
    acc = F.transform(
        F.slice(arr, 1, win_len), lambda a: a == F.lit(words[0])
    )
    def _and_word(word: str):
        # zip_with inspects the lambda's arity: keep it strictly binary
        return lambda m, w: m & (w == F.lit(word))

    for i in range(1, n):
        acc = F.zip_with(
            acc, F.slice(arr, 1 + i, win_len), _and_word(words[i])
        )
    return F.size(F.filter(acc, lambda m: m))


def phrase_match_indexed(
    docs: DataFrame,
    tf: DataFrame,
    phrase: str,
    text_col: str = "text",
    broadcast_candidates: bool = True,
) -> DataFrame:
    """:func:`phrase_match` through the index — the 10^12-doc serving
    plan.  The plain operator re-tokenizes every document per quoted
    query; here the prebuilt ``(term, doc_id, tf)`` table prunes first:
    candidates are the docs containing ALL index-eligible phrase words
    (pushed-down ``term IN`` filter — an index probe when tf is stored
    partitioned/bucketed by term, exactly how the posting shards are
    laid out), and the codegen adjacency check then runs only on the
    candidate docs via a semi-join into the docs scan.

    Result-identical to :func:`phrase_match` (the driver oracle is
    shared): words outside the index's 2..8-byte eligibility window
    (reference CrtInvertedIdx.cpp:25) cannot prune — they are skipped
    at the candidate stage and verified by the adjacency scan, the same
    contains-all-then-verify shape every positional-index engine uses.
    With no eligible word the operator degrades to the full scan.

    ``broadcast_candidates`` fits the quoted-query case (candidate sets
    are small for selective phrases); set it False for stopword-only
    phrases so Catalyst/AQE picks the join side."""
    from tse_spark import oracle as _o

    words = _phrase_words(phrase)
    eligible = {
        w
        for w in words
        if _o.MIN_TERM_BYTES <= len(w.encode("utf-8")) <= _o.MAX_TERM_BYTES
    }
    if not eligible:
        return phrase_match(docs, phrase, text_col)
    cand = (
        tf.filter(F.col("term").isin(list(eligible)))
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("term")).alias("nt"))
        .filter(F.col("nt") == len(eligible))
        .select("doc_id", "nt")
    )
    if broadcast_candidates:
        cand = F.broadcast(cand)
    n_hits = _phrase_hits_expr(words, text_col)
    # guard the adjacency count with the build-side nt column (a real
    # aggregate, not a literal a constant-folder would erase) so the
    # predicate references both join sides: Catalyst cannot push it
    # below the join, so the expensive zip_with runs ONLY on hash-join
    # survivors (unguarded, PushPredicateThroughJoin moves it under the
    # join and every doc pays the scan cost the pruning was built to
    # avoid — pinned via .explain in tests).  The nt == len check is
    # always true post-filter; it exists purely as the barrier.
    guarded = F.when(
        F.col("nt") == len(eligible), n_hits
    ).otherwise(F.lit(0))
    return (
        docs.join(cand, "doc_id", "inner")
        .select("doc_id", guarded.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


def doc_keywords(tf: DataFrame, n_docs: int, k: int = 5) -> DataFrame:
    """Top-k tf-idf keywords per document: score = tf * ln(n_docs/df),
    the classic document-descriptor extraction over the same
    (doc_id, term, tf) relation the index build produces — keywords
    come from index statistics, not a second tokenization pass.

    The score is ROUNDED (4 dp) before ranking so the order is
    reproducible across engines (ties broken by term ascending); df is
    a vocabulary-sized aggregate joined back onto tf, and the per-doc
    ranking is one window — at 100 TB that is a hash-agg over the
    vocabulary plus a single repartition by doc_id, no self-joins.

    Returns (doc_id, term, score, rank) with rank 1..k."""
    from pyspark.sql import Window

    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
        4,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        tf.join(dfreq, "term")
        .select("doc_id", "term", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def spell_suggest(
    vocab: DataFrame, term: str, k: int = 5, max_dist: int = 2
) -> DataFrame:
    """(term, dist, df) — the ``k`` vocabulary terms closest to a
    (possibly misspelled) query term by Levenshtein distance, ties
    broken by higher df then lexicographic: the "did you mean" feature
    every search box grew after this reference's era.

    ``vocab`` is any (term, df) table — the df aggregate at analysis
    time, or a built index's term_stats at serving time (the CLI's
    --suggest path).  Vocabulary-sized (tiny next to the corpus), with
    a cheap codegen length-window prefilter ahead of the O(len^2)
    levenshtein so the distance only runs on plausible candidates.  At
    web scale the vocabulary is still only millions of rows — a single
    narrow scan, no shuffle before the top-k."""
    q = term.lower()
    cand = vocab.select("term", "df").filter(
        (F.length("term") >= len(q) - max_dist)
        & (F.length("term") <= len(q) + max_dist)
    )
    out = cand.withColumn(
        "dist", F.levenshtein(F.col("term"), F.lit(q))
    ).filter(F.col("dist") <= max_dist)
    return (
        out.select("term", "dist", "df")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, avg_token_len, quality) — a
    length/stopword-ratio quality heuristic; quality = tokens-capped
    score damped by stopword deficit."""
    t = tokens(docs).withColumn(
        "is_stop", F.col("term").isin(*STOPWORDS).cast("int")
    )
    agg = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("is_stop").alias("stop_ratio_raw"),
        F.avg(F.length("term")).alias("avg_len_raw"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.round("stop_ratio_raw", 4).alias("stop_ratio"),
        F.round("avg_len_raw", 4).alias("avg_token_len"),
        F.round(
            F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
            * (F.lit(0.5) + F.col("stop_ratio_raw")),
            4,
        ).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_guess) — stopword-hit argmax across language sets,
    alphabetical tie-break (deterministic)."""
    t = tokens(docs)
    aggs = [
        F.sum(F.col("term").isin(*ws).cast("long")).alias(f"hits_{lang}")
        for lang, ws in sorted(LANG_STOPWORDS.items())
    ]
    scored = t.groupBy("doc_id").agg(*aggs)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("unknown")
    # reverse order so the FIRST alphabetical max wins
    for lang in reversed(langs):
        guess = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(
            guess
        )
    guess = F.when(best == 0, F.lit("unknown")).otherwise(guess)
    return scored.select("doc_id", guess.alias("lang_guess"))


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — md5 of lowercased text (C7-style content key)."""
    return docs.select(
        "doc_id",
        F.md5(F.encode(F.lower(F.col("text")), "utf-8")).alias("fp"),
    )


def scan_search(docs: DataFrame, needle: str) -> DataFrame:
    """Q12 linear-scan search (reference tse/Search.cpp:14-120): full-scan
    substring match — the correctness cross-check of the index path."""
    return docs.filter(F.col("text").contains(needle)).select(
        "doc_id", "lang", "n_chars"
    )


def snippet(docs: DataFrame, needle: str, width: int = 40) -> DataFrame:
    """T8 snippet: fixed window starting at the first occurrence of the
    term (reference index/DisplayRst.cpp:211-249 context windows)."""
    pos = F.instr(F.col("text"), needle)
    return (
        docs.filter(pos > 0)
        .select(
            "doc_id",
            F.substring(
                F.col("text"), F.greatest(pos - width, F.lit(1)), 2 * width
            ).alias("snip"),
        )
    )


# GPT-2-flavoured pretokenizer regex (contractions, letter runs, short
# digit groups, punctuation runs) — plain alternation so the same
# pattern runs under Java regex (Spark) and RE2 (DuckDB oracle)
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]{1,3}|[^\sa-z0-9]+"


def bpe_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bpe_tokens) — BPE-ish pretokenization count, fully
    JVM-side via regexp_extract_all (complements the whitespace counter
    in :func:`token_count`; a real BPE merges would follow this split)."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), F.lit(0)
    )
    return docs.select(
        "doc_id", F.size(toks).cast("long").alias("n_bpe_tokens")
    )


def collapse_by_host(
    ranked: DataFrame,
    per_host: int = 2,
    k: int = 10,
    url_col: str = "url",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Site-collapsed ranking: keep at most ``per_host`` results per
    host, then take the global top-k — the result-diversity rule every
    web engine applies so one site cannot fill the page.

    One window over (host) ordered by (score desc, id asc) — the input
    is an already-small ranked candidate list (top-N for N a small
    multiple of k), so the window is cheap; at scale the candidate list
    arrives from the per-shard top-k merge, never the full corpus."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    from pyspark.sql import Window

    w = Window.partitionBy("__host").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        ranked.withColumn("__host", host)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= per_host)
        .drop("__host", "__r")
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def collapse_duplicates(
    ranked: DataFrame,
    k: int = 10,
    fp_col: str = "fp",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicate-collapsed ranking: keep only the best result (score
    desc, id asc) per content fingerprint, then the global top-k — the
    rule that stops mirror copies of one page from filling the results.
    Same rerank-window design as :func:`collapse_by_host`: the input is
    a small ranked candidate list joined with its fingerprints, so the
    window costs nothing; the corpus-level dedup lives in the build
    (exact md5 / MinHash), this is the serving-time guard for
    duplicates the build intentionally kept (e.g. site mirrors)."""
    from pyspark.sql import Window

    w = Window.partitionBy(fp_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        ranked.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .drop("__r")
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def render_results(
    topk: DataFrame,
    docs: DataFrame,
    terms: list[str],
    width: int = 64,
    tag: str = "font",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Q10 result rendering (reference index/DisplayRst.cpp:82-261): join
    the ranked top-k (doc_id, score) back to the docs table and build the
    user-facing row — per-query-term context windows (the reference cuts
    128/256-byte windows per term, DisplayRst.cpp:211-249) joined with
    ``...`` and every term occurrence highlighted with a ``<font>`` tag
    (DisplayRst.cpp:238-244).

    The top-k is k rows — broadcast it into the docs scan, so rendering
    is one pruned scan-side join, no shuffle of the docs table.  All
    string work is JVM expressions (instr/substring/replace): SQL-
    expressible, hence DuckDB-oracle-checked.
    """
    lower = F.lower(F.col("text"))
    windows = []
    for t in terms:
        tl = t.lower()
        pos = F.instr(lower, tl)
        windows.append(
            F.when(
                pos > 0,
                F.substring(
                    lower,
                    F.greatest(pos - width, F.lit(1)),
                    2 * width + len(tl),
                ),
            )
        )
    snip = F.concat_ws(" ... ", *windows)
    for t in terms:
        tl = t.lower()
        snip = F.replace(
            snip, F.lit(tl), F.lit(f"<{tag}>{tl}</{tag}>")
        )
    joined = docs.join(F.broadcast(topk), "doc_id")
    return joined.select(
        "doc_id",
        "score",
        *extra_cols,
        snip.alias("snippet"),
    ).orderBy(F.desc("score"), F.asc("doc_id"))


def content_type_gate(
    df: DataFrame,
    allowed: tuple[str, ...] = ("text/html", "text/plain"),
    mime_col: str = "mime",
) -> DataFrame:
    """C9 content-type gate (reference tse/Crawl.cpp:439-451: the fetch
    loop drops responses whose Content-Type is not in the allowed list).
    A trivial pushed-down IN filter — kept as a named operator so the
    pipeline surface matches the reference's."""
    return df.filter(F.col(mime_col).isin(*allowed))


def snapshot_by_url(pages: DataFrame, url: str) -> DataFrame:
    """Q11 (reference Snapshot.cpp:42-120): fetch the stored page for
    one url — md5-keyed point lookup (the reference binary-searches
    Url.idx.sort_uniq on md5(url); here the md5 comparison lets a table
    bucketed/sorted by md5(url) prune to one file).  Returns the
    matching rows with all input columns (callers project)."""
    target = F.md5(F.lit(url))
    return pages.filter(F.md5(F.col("url")) == target)


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    max_top_bigram_frac: float = 0.18,
    max_dup_trigram_frac: float = 0.60,
) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al. 2021
    §A1.1): per doc the fraction of tokens covered by the single most
    frequent bigram (``top_bigram_frac`` = 2 * max bigram count /
    n_tokens) and the fraction of duplicated trigram occurrences
    (``dup_trigram_frac`` = 1 - distinct/total trigrams), plus the
    keep/drop decision at the given thresholds.

    Plan: bigram counts go explode -> hash-agg -> per-doc max (one
    shuffle keyed by (doc_id, bigram), map-side combine absorbs the
    repetition that makes a doc fail); the trigram dup fraction never
    leaves the row — ``size(arr) - size(array_distinct(arr))`` inside
    codegen — so the whole statistic is one exchange at any corpus
    size."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )
    d = docs.select("doc_id", arr.alias("arr")).filter(F.size("arr") >= 3)
    bigrams = F.zip_with(
        F.slice(F.col("arr"), 1, F.size("arr") - 1),
        F.slice(F.col("arr"), 2, F.size("arr") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    top_bi = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"))
    )
    trigrams = F.expr(
        "transform(sequence(0, size(arr) - 3), "
        "i -> concat_ws(' ', arr[i], arr[i + 1], arr[i + 2]))"
    )
    tri = d.select(
        "doc_id",
        F.size("arr").alias("n_tokens"),
        F.size(trigrams).alias("n_tri"),
        F.size(F.array_distinct(trigrams)).alias("n_tri_distinct"),
    )
    out = tri.join(top_bi, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(
            F.lit(2.0) * F.col("top_bigram_n") / F.col("n_tokens"), 6
        ).alias("top_bigram_frac"),
        F.round(
            (F.col("n_tri") - F.col("n_tri_distinct"))
            / F.col("n_tri").cast("double"),
            6,
        ).alias("dup_trigram_frac"),
    )
    return out.withColumn(
        "keep",
        (
            (F.col("top_bigram_frac") <= max_top_bigram_frac)
            & (F.col("dup_trigram_frac") <= max_dup_trigram_frac)
        ).cast("int"),
    )


# patterns shared verbatim with the DuckDB oracle: the common
# Java-regex / RE2 subset only (no lookaround, no backrefs), applied in
# a fixed order (emails first — an email's dotted host must not be
# half-eaten by the IP rule)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub the PII classes a web-text training pipeline redacts
    before tokenization: emails, IPv4 addresses, phone numbers —
    each replaced by a typed placeholder token, with per-class match
    counts for the corpus audit.

    Returns (doc_id, n_email, n_ip, n_phone, redacted).

    Counts are taken BEFORE any replacement (so a phone-shaped string
    inside an email is attributed once, to the email class, because the
    later patterns run over the already-redacted text) and the three
    substitutions chain in PII_PATTERNS order.  Everything is
    ``regexp_count`` / ``regexp_replace`` — whole-stage codegen, zero
    shuffles, linear scan at any corpus size; the patterns sit in the
    Java/RE2 common subset so the DuckDB oracle applies the identical
    strings."""
    out = docs.select("doc_id", F.col(text_col).alias("redacted"))
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col("redacted"), F.lit(pat))
        ).withColumn(
            "redacted", F.regexp_replace(F.col("redacted"), pat, repl)
        )
    return out.select("doc_id", "n_email", "n_ip", "n_phone", "redacted")


def prefix_complete(vocab: DataFrame, prefix: str, k: int = 5) -> DataFrame:
    """(term, df) — top-``k`` vocabulary completions for a query-box
    prefix, most-frequent first (ties lexicographic): the typeahead
    companion to :func:`spell_suggest`.

    ``vocab`` is any (term, df) relation — at serving time the built
    index's term_stats table, which is sorted by term on disk, so the
    ``startswith`` predicate is a pushed-down range filter over a
    vocabulary-sized scan (millions of rows at web scale, no shuffle
    before the top-k)."""
    return (
        vocab.filter(F.col("term").startswith(prefix.lower()))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def snapshot_asof(pages: DataFrame, cutoff_ts: str) -> DataFrame:
    """Time-travel snapshot: for every url, the LATEST crawled version
    with ``warc_ts <= cutoff`` — the as-of view a recrawl-aware corpus
    needs (reference Q11 serves only the current snapshot; a versioned
    pages table serves any point in time).

    One shuffle (partitionBy url), row_number picks the winner; ties
    cannot occur for a sane crawl log (one fetch per url per instant)
    but would break deterministically by the ordering.  At 10^12 rows
    the cutoff filter is a pushed-down predicate on the timestamp
    column (partition-prunes a ts-partitioned table) and the window
    reduces each url group to one row — state O(urls), not O(fetches).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"))
    return (
        pages.filter(F.col("warc_ts") <= F.lit(cutoff_ts).cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def domain_stats(docs: DataFrame) -> DataFrame:
    """Per-host curation scoreboard over a (host, lang, text, n_chars)
    relation: docs, distinct-content count (exact md5 dedup rate per
    domain), mean length, language spread — the per-domain quality
    table a training-data curation pass ranks and caps sources by.

    One hash-aggregate shuffle on host; the md5 distinct is computed
    inside the same aggregation (no second pass over text).  Skewed
    hosts (a few domains dominate any web crawl) stay safe: partial
    aggregation combines map-side, so the hot host ships one row per
    task, not one per doc."""
    return docs.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


def recency_boost(
    ranked: DataFrame, k: int = 10, halflife_days: float = 30.0
) -> DataFrame:
    """Freshness-fused rerank of a candidate ranking (doc_id, score,
    age_days): boosted = score · halflife/(halflife + age) — rational
    decay, deliberately exp-free so every engine reproduces the doubles
    bit-for-bit; rounded (4 dp) BEFORE ordering for a reproducible cut,
    ties doc_id-asc.

    Standard rerank-window design: fuse freshness over the top-N
    candidates of the base ranking (N ≈ 5·k), never over the corpus —
    at scale the candidate set is k·pages, so this is driver-cheap and
    the base ranking's TakeOrderedAndProject stays the only heavy op."""
    b = F.round(
        F.col("score")
        * F.lit(float(halflife_days))
        / (F.lit(float(halflife_days)) + F.col("age_days")),
        4,
    )
    return (
        ranked.select("doc_id", b.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def url_depth_prior(url_col) -> "F.Column":
    """URL-form document prior (Kraaij, Westerveld & Hiemstra,
    SIGIR'02 "The importance of prior probabilities for entry page
    search"): shallow urls are far likelier entry/landing pages, so
    P(d) ∝ 1/(1 + path_depth), with a 0.5 penalty for query-string
    urls (their finding: ROOT ≫ SUBROOT ≫ PATH ≫ FILE priors; this is
    the smooth depth-law flavor of the same signal).  Rational
    arithmetic only, so every engine reproduces the doubles exactly."""
    depth = (F.size(F.split(url_col, "/")) - 3).cast("double")
    qpen = F.when(url_col.contains("?"), F.lit(0.5)).otherwise(F.lit(1.0))
    return qpen / (F.lit(1.0) + depth)


def url_prior_boost(
    ranked: DataFrame, urls: DataFrame, k: int = 10
) -> DataFrame:
    """Entry-page prior fusion: rerank a candidate list (doc_id,
    score) by ``boosted = round(score * url_depth_prior(url), 4)`` —
    the navigational-query combine next to recency_boost (freshness)
    and linkrank.authority_boost (links).  Same rerank-window design:
    the candidate ids broadcast-join the (doc_id, url) relation; the
    corpus is never rescanned."""
    pri = urls.select(
        "doc_id", url_depth_prior(F.col("url")).alias("__pri")
    )
    b = F.round(F.col("score") * F.col("__pri"), 4)
    return (
        ranked.join(pri, "doc_id")
        .select("doc_id", b.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def related_terms(
    tf: DataFrame, terms: list[str], k: int = 10
) -> DataFrame:
    """Query-refinement suggestions ("searches related to …"): the
    terms co-occurring in the most documents of the query's match set,
    query terms themselves excluded — ranked by within-match document
    frequency (ties term-asc so the list is deterministic).

    Returns (term, n_docs) — top-k by n_docs desc, term asc.

    Scale shape: the match set is a pruned-IN scan of tf (pushed to the
    parquet scan) + distinct; co-occurrence is ONE semi-join of tf
    against it and ONE hash aggregate over the vocabulary of matching
    docs — map-side partials absorb hot terms, and the final order is
    TakeOrderedAndProject, never a global sort.  No self-join of tf and
    no pair explosion: df-within-matches ranks refinements just as well
    as PMI at serving time and costs one agg."""
    terms = sorted(set(terms))
    matches = (
        tf.filter(F.col("term").isin(terms)).select("doc_id").distinct()
    )
    co = (
        tf.join(matches, "doc_id", "left_semi")
        .filter(~F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return co.orderBy(F.desc("n_docs"), F.asc("term")).limit(k)


def facet_counts(
    matches: DataFrame, docs: DataFrame, facets: list[str]
) -> DataFrame:
    """Search-result facets: for the docs in ``matches`` (a doc_id
    relation — every doc matching the query, not just the served page),
    count hits per value of each facet column — the refinement sidebar
    a search UI renders ("lang: en (512) · de (77) …", reference
    TSESearch renders a flat list; facets are the standard extension).

    Returns (facet string, value string, n_docs long), one row per
    observed (facet, value).

    Scale shape: ONE semi-join on doc_id restricts the docs scan to the
    match set (Catalyst/AQE broadcasts the match side when it is small,
    shuffles otherwise), then a single ``stack`` unpivot feeds ONE hash
    aggregate covering all facets at once — never one job per facet.
    Map-side partial aggregation means a task ships at most one row per
    (facet, value), so a dominant value (most web corpora are one
    language) cannot skew the exchange; the result cardinality is the
    facet vocabulary, never the corpus.
    """
    for f_ in facets:
        if not f_.isidentifier():
            raise ValueError(f"facet must be a column identifier: {f_!r}")
    pairs = ", ".join(f"'{f_}', cast({f_} AS string)" for f_ in facets)
    hit = docs.join(
        matches.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    return (
        hit.select(
            F.expr(f"stack({len(facets)}, {pairs}) AS (facet, value)")
        )
        .groupBy("facet", "value")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information —
    ``pmi = ln(n(w1 w2) * N / (n(w1) * n(w2)))`` with N the total
    bigram count and unigram counts taken over the same bigram-slot
    stream (w1 counts = prefix occurrences, w2 counts = suffix
    occurrences), so the three distributions share one sample space
    and PMI is a proper log-odds.  ``min_count`` floors the bigram
    count (PMI's classic rare-pair pathology).  Phrase discovery for
    index phrase terms / query suggestions; the reference has no
    statistics layer at all (its dictionary is hand-shipped,
    index/readme.txt).

    One hash-agg over bigrams (in-array adjacency, zip_with — no
    positional shuffle), two tiny derived aggregations, one broadcast
    join each; the top-k is a TakeOrderedAndProject."""
    bg = bigram_counts(docs, text_col=text_col).select(
        F.split("bigram", " ").getItem(0).alias("w1"),
        F.split("bigram", " ").getItem(1).alias("w2"),
        F.col("n").alias("n12"),
    )
    c1 = bg.groupBy("w1").agg(F.sum("n12").alias("n1"))
    c2 = bg.groupBy("w2").agg(F.sum("n12").alias("n2"))
    tot = bg.agg(F.sum("n12").alias("nn"))
    return (
        bg.filter(F.col("n12") >= int(min_count))
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n12").cast("long").alias("n12"),
            F.round(
                F.log(
                    F.col("n12").cast("double")
                    * F.col("nn").cast("double")
                    / (
                        F.col("n1").cast("double")
                        * F.col("n2").cast("double")
                    )
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(int(k))
    )


# ---------------------------------------------------------------------------
# document chunking (training/RAG window splitter)
# ---------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunker — the pretraining/RAG splitter that cuts
    each document into ``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap`` (so consecutive chunks share ``overlap``
    tokens of context).  Chunk-start law: starts = 0, stride, 2*stride,
    ... while the window still contributes NEW tokens (a start > 0 is
    kept only if ``start < n_tok - overlap``; a final stub that lies
    entirely inside the previous window is dropped).

    Returns (doc_id, chunk_id, start_tok, n_tok, chunk_text) — one row
    per window, ``chunk_id`` dense from 0 per doc, ``n_tok`` the actual
    window length (< chunk_tokens only for the last window).

    Scale shape: pure per-row codegen — split once, ``sequence`` +
    ``explode`` for the starts, ``slice``/``array_join`` for the
    window; NO shuffle anywhere and nothing leaves the row until the
    explode multiplies it by its own chunk count (~n_tok/stride).  At
    100 TB this runs at scan speed; compare seq-packing
    (sampling.pack_sequences), which globally concatenates instead.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )
    n_tok = F.size("toks")
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n_tok - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s < n_tok - overlap),
    )
    base = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    ex = base.select(
        "doc_id",
        F.size("toks").alias("doc_tok"),
        "toks",
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    window = F.slice(
        F.col("toks"), F.col("start_tok") + 1, chunk_tokens
    )
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(window).cast("long").alias("n_tok"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def build_passage_stats(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, start_tok, dl) for every VALID window with at least one
    eligible (2..8-byte) token — the passage-stats sidecar the indexed
    serving path (:func:`tse_spark.operators.positions.
    passage_bm25_topk_indexed`) joins instead of touching text.  Built
    once at index time from the same :func:`chunk_documents` law the
    scan-side scorer uses; at scale, write it doc-range-bucketed next
    to the positional shards so the serving join co-partitions."""
    arr = F.split(F.col("chunk_text"), " ")
    elig = F.filter(
        arr,
        lambda t: (F.octet_length(t) >= 2) & (F.octet_length(t) <= 8),
    )
    return (
        chunk_documents(docs, chunk_tokens, overlap, text_col)
        .select(
            "doc_id",
            "start_tok",
            F.size(elig).cast("long").alias("dl"),
        )
        .filter(F.col("dl") > 0)
    )


def passage_bm25_topk(
    docs: DataFrame,
    terms: "list[str]",
    k: int = 10,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Passage-level BM25 retrieval — the retrieve-for-rerank / RAG
    unit: each document is cut into :func:`chunk_documents` sliding
    windows and the WINDOW is the scored item (its own length norm,
    passage-frequency df, passage-count N), so a long page with one
    on-topic paragraph ranks by that paragraph instead of being
    averaged away (reference twin: DisplayRst.cpp's best-window
    snippet selection, promoted from presentation-time to a ranked
    retrieval surface).

    Stats law mirrors the document-level _TOK/BM25 oracles, one level
    down: eligible tokens are the 2..8-byte lowercase ws tokens,
    ``dl`` = a window's eligible-token count, windows with dl = 0 drop
    from the collection, ``df(t)`` = number of windows containing t,
    ``N`` = number of surviving windows, k1 = 1.2, b = 0.75,
    idf = ln(1 + (N - df + .5)/(df + .5)).  Returns the top-``k``
    (doc_id, chunk_id, start_tok, score) by score desc, doc/chunk asc.

    Scale shape: per-window tf of each QUERY term is computed with
    array ``filter``/``size`` inside whole-stage codegen, so the
    occurrence stream NEVER shuffles — the only exchanges are the
    1-row corpus-stats aggregate, a |terms|-row df aggregate, and the
    final TakeOrderedAndProject.  At 100 TB this runs at scan speed
    (the document-level bm25_topk must hash-aggregate its whole tf
    relation before scoring; passages would multiply that shuffle by
    windows-per-doc, which is exactly what this plan avoids)."""
    uniq = sorted(set(terms))
    arr = F.split(F.col("chunk_text"), " ")
    elig = F.filter(
        arr,
        lambda t: (F.octet_length(t) >= 2) & (F.octet_length(t) <= 8),
    )

    # tf counts over the ELIGIBLE array, so dl and tf obey one token
    # law whatever the caller's terms look like.  (A two-arg lambda
    # would make Spark pass the array INDEX as the second argument —
    # bind the word via closure, not a default arg.)
    def _tf(word):
        return F.size(F.filter(elig, lambda t: t == F.lit(word)))

    base = (
        chunk_documents(docs, chunk_tokens, overlap)
        .select(
            "doc_id",
            "chunk_id",
            "start_tok",
            F.size(elig).cast("long").alias("dl"),
            *[
                _tf(w).cast("long").alias(f"__tf{i}")
                for i, w in enumerate(uniq)
            ],
        )
        .filter(F.col("dl") > 0)
    )
    from tse_spark import oracle

    # ONE 1-row aggregate carries N, avgdl AND every query term's df
    # (df_i = windows where tf_i > 0), so the corpus is scanned twice
    # total — the stats leg and the scoring leg — instead of once per
    # derived relation
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(uniq))
        ],
    )
    # (window, term, tf) rows for query terms only: |windows| x |terms|
    # before the tf > 0 filter — bounded, never the full vocabulary
    pairs = base.select(
        "doc_id",
        "chunk_id",
        "start_tok",
        "dl",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).alias("term"),
                        F.col(f"__tf{i}").alias("tf"),
                    )
                    for i, w in enumerate(uniq)
                ]
            )
        ).alias("p"),
    ).select(
        "doc_id", "chunk_id", "start_tok", "dl",
        F.col("p.term").alias("term"), F.col("p.tf").alias("tf"),
    ).filter(F.col("tf") > 0)
    k1, b = oracle.BM25_K1, oracle.BM25_B

    def _idf(df_col):
        return F.log(
            F.lit(1.0)
            + (F.col("__n") - df_col + F.lit(0.5))
            / (df_col + F.lit(0.5))
        )

    idf = F.lit(0.0)
    for i, w in enumerate(uniq):  # per-term idf from the stats row
        idf = F.when(
            F.col("term") == F.lit(w), _idf(F.col(f"__df{i}"))
        ).otherwise(idf)
    s = (
        idf
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
        )
    )
    return (
        pairs.crossJoin(F.broadcast(stats))
        .groupBy("doc_id", "chunk_id", "start_tok")
        .agg(F.sum(s).alias("__s"))
        .select(
            "doc_id",
            "chunk_id",
            "start_tok",
            F.round("__s", 4).alias("score"),
        )
        .orderBy(F.desc("__s"), "doc_id", "chunk_id")
        .limit(k)
    )


def passage_render(
    docs: DataFrame,
    terms: "list[str]",
    k: int = 10,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """The RAG answer surface: :func:`passage_bm25_topk`'s top-``k``
    windows joined back to their text with every query term bracketed
    ``[term]`` (token-exact highlight, same law as the oracle) —
    (doc_id, chunk_id, score, passage).

    Scale shape: the k-row result BROADCASTS into the chunk relation,
    so rendering costs one more corpus-scan-speed pass and zero
    shuffles of chunk text; the highlight is a codegen ``transform``
    over the window's token array."""
    uniq = sorted(set(terms))
    top = passage_bm25_topk(docs, terms, k, chunk_tokens, overlap)
    chunks = chunk_documents(docs, chunk_tokens, overlap).select(
        "doc_id", "chunk_id", "chunk_text"
    )
    arr = F.split(F.col("chunk_text"), " ")
    hl = F.array_join(
        F.transform(
            arr,
            lambda t: F.when(
                t.isin(uniq), F.concat(F.lit("["), t, F.lit("]"))
            ).otherwise(t),
        ),
        " ",
    )
    return (
        F.broadcast(top)
        .join(chunks, ["doc_id", "chunk_id"])
        .select("doc_id", "chunk_id", "score", hl.alias("passage"))
        .orderBy(F.desc("score"), "doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# S-stemmer + automatic stopword mining
# ---------------------------------------------------------------------------

def s_stem_expr(term) -> Column:
    """Harman's S-stemmer (1991) — the conservative plural stripper
    used when a full Porter pass is too aggressive: for terms longer
    than 3 chars, ``-ies -> -y`` (unless -eies/-aies), ``-es -> -e``-
    less form (drop the s, unless -aes/-ees/-oes), ``-s`` dropped
    (unless -us/-ss).  Unlike Porter this is a three-rule CASE over
    suffixes, so it stays in whole-stage codegen AND has an exact SQL
    twin — the property the oracle contract needs.

    Rule order is first-match-stops (a word that matches a rule's
    suffix but is one of its exceptions stays UNCHANGED — it does not
    fall through to the next rule, per the original formulation);
    length > 3 throughout."""
    t = term if not isinstance(term, str) else F.col(term)
    n = F.length(t)
    end4 = F.substring(t, -4, 4)
    end3 = F.substring(t, -3, 3)
    end2 = F.substring(t, -2, 2)
    end1 = F.substring(t, -1, 1)
    return (
        F.when(
            (n > 3) & (end3 == "ies"),
            F.when(
                end4.isin("eies", "aies"), t
            ).otherwise(F.concat(F.substring(t, 1, n - 3), F.lit("y"))),
        )
        .when(
            (n > 3) & (end2 == "es"),
            F.when(
                end3.isin("aes", "ees", "oes"), t
            ).otherwise(F.substring(t, 1, n - 1)),
        )
        .when(
            (n > 3) & (end1 == "s"),
            F.when(
                end2.isin("us", "ss"), t
            ).otherwise(F.substring(t, 1, n - 1)),
        )
        .otherwise(t)
    )


def stemmed_tf(tf: DataFrame) -> DataFrame:
    """Re-key the (doc_id, term, tf) relation on the S-stem: one extra
    hash aggregate folds plural/singular postings together (df and tf
    merge; doclen is unchanged — same token count).  Feeding this into
    the unchanged BM25 scorer gives stemmed retrieval: a query term
    matches every inflection sharing its stem."""
    return (
        tf.select(
            "doc_id", s_stem_expr("term").alias("term"), "tf"
        )
        .groupBy("doc_id", "term")
        .agg(F.sum("tf").alias("tf"))
    )


def auto_stopwords(
    tf: DataFrame, n_docs: int, min_doc_frac: float = 0.5
) -> DataFrame:
    """Corpus-mined stopword list: terms appearing in at least
    ``min_doc_frac`` of documents — (term, df, doc_frac).  The
    data-driven twin of a hand-curated list (what "the"/"的" look
    like in ANY language); downstream, dropping them is the classic
    index-size/latency lever.  One vocabulary-sized hash agg; the
    fraction test is exact integer math (df * 1 >= frac * n) so no
    float boundary can flip membership between engines."""
    thresh = float(min_doc_frac) * float(n_docs)
    return (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").cast("double") >= F.lit(thresh))
        .select(
            "term",
            "df",
            F.round(F.col("df") / F.lit(float(n_docs)), 4).alias(
                "doc_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified rerank
# ---------------------------------------------------------------------------

def mmr_rerank_py(
    rel: dict[int, float],
    sims: dict[tuple[int, int], float],
    k: int = 10,
    lam: float = 0.75,
) -> list[tuple[int, int, float]]:
    """Greedy Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    over a candidate page: repeatedly pick
    ``argmax lam*rel(d) - (1-lam)*max_{s in selected} sim(d, s)``,
    ties doc-id-asc.  Pure driver arithmetic over <= N candidates —
    the rerank-window altitude (the heavy work, BM25 top-N and the
    candidate-pair similarities, stays in Spark; the greedy sweep is
    O(k*N) on one page of results, exactly where a serving frontend
    runs it).  lam = 0.75 is exactly representable, and rel/sims
    arrive pre-rounded, so every comparison is deterministic and the
    SQL oracle's unrolled greedy agrees step for step.

    Returns [(rank, doc_id, mmr_score)] with rank from 1."""
    remaining = dict(rel)
    selected: list[int] = []
    out = []
    for rank in range(1, min(k, len(rel)) + 1):
        best = None
        for d, r in remaining.items():
            worst = 0.0
            for s in selected:
                v = sims.get((min(d, s), max(d, s)), 0.0)
                if v > worst:
                    worst = v
            score = lam * r - (1.0 - lam) * worst
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, score)
        _, d, score = best
        selected.append(d)
        del remaining[d]
        out.append((rank, d, round(score, 4)))
    return out


def candidate_tf_sims(
    tf: DataFrame, cand: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_a < doc_b, sim) tf-vector cosines BETWEEN the candidates
    only: tf is semi-join-pruned to the candidate ids first (broadcast
    — the page is tiny), so the pair join touches N docs' vectors,
    never the corpus (tf_cosine_pairs is the all-pairs batch variant).
    Integer dots/norms make the rounded sim engine-identical."""
    pruned = tf.join(
        F.broadcast(cand.select(F.col(id_col).alias("doc_id"))),
        "doc_id",
        "left_semi",
    )
    a = pruned.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tfa")
    )
    b = pruned.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tfb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
    )
    norms = pruned.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb"))
    sim = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("na").cast("double"))
           * F.sqrt(F.col("nb").cast("double"))),
        4,
    )
    return (
        dots.join(na, "doc_a").join(nb, "doc_b")
        .select("doc_a", "doc_b", sim.alias("sim"))
    )


def mmr_diversify(
    spark,
    ranked: DataFrame,
    sims: DataFrame,
    k: int = 10,
    lam: float = 0.75,
) -> DataFrame:
    """DataFrame wrapper: collect the candidate page (score pre-rounded
    by the caller) + its pair sims, run the greedy sweep, return
    (rank, doc_id, mmr) — the diversified page."""
    rel = {
        r["doc_id"]: float(r["score"]) for r in ranked.collect()
    }
    sim_map = {
        (r["doc_a"], r["doc_b"]): float(r["sim"]) for r in sims.collect()
    }
    rows = mmr_rerank_py(rel, sim_map, k, lam)
    return spark.createDataFrame(
        rows, "rank int, doc_id long, mmr double"
    ).select(F.col("rank").cast("long").alias("rank"), "doc_id", "mmr")


def strip_boilerplate_lines(
    docs: DataFrame, min_df: int = 3, text_col: str = "text"
) -> DataFrame:
    """Boilerplate line removal (the CCNet / RefinedWeb curation step
    the per-doc quality filters can't do): any LINE that appears in
    >= ``min_df`` distinct documents — nav menus, cookie banners,
    "subscribe" footers — is stripped from every document, and the
    text is reconstructed from the surviving lines in order.

    Scale shape: lines posexplode once; the df aggregate and the
    membership anti-join key on ``md5(line)`` so the corpus-sized
    shuffle moves 32-byte keys, never the line strings; the
    boilerplate relation is df-filtered tiny (vocabulary of repeated
    lines), so AQE broadcasts the anti-join; reconstruction is one
    hash-agg per doc (array_sort by position — no window, no second
    sort).  Exact integer/string law end to end, so the DuckDB twin
    mirrors it verbatim.

    Returns (doc_id, clean_text, n_removed); a fully-boilerplate doc
    reports clean_text = ''.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lkey", F.md5(F.encode(F.col("line"), "UTF-8")))
    bp = (
        lines.groupBy("lkey")
        .agg(F.countDistinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") >= int(min_df))
        .select("lkey")
    )
    kept = lines.join(bp, "lkey", "left_anti")
    per_doc = kept.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("ls"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    total = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return total.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(
            F.concat_ws("\n", F.expr("transform(ls, x -> x.line)")),
            F.lit(""),
        ).alias("clean_text"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


def page_tail(
    page: DataFrame, score_col: str = "score", id_col: str = "doc_id"
) -> DataFrame:
    """The keyset cursor a page hands to the client: its LAST row under
    the serving order (score desc, id asc), as a one-row
    (score_col, id_col) DataFrame for :func:`keyset_page`."""
    return (
        page.orderBy(F.asc(score_col), F.desc(id_col))
        .limit(1)
        .select(score_col, id_col)
    )


def keyset_page(
    scored: DataFrame,
    k: int,
    after: DataFrame | None = None,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyset (cursor / search_after) pagination — the deep-paging form
    that stays O(k) at any page depth, vs the reference's offset
    re-rank (TSESearch re-scores and slices per page,
    tse/TSESearch.cpp:186-214) and our own `bm25_page2` offset path,
    both of which materialize (page+1)*k rows.

    ``after`` is the previous page's last row ((score, id), one row —
    :func:`page_tail`); pages order by (score desc, id asc) and the
    cursor predicate ``score < cs OR (score = cs AND id > cd)`` resumes
    exactly after it.  Page 1 is ``after=None``.

    Scale shape: the cursor broadcasts (one row) into the scored scan,
    the predicate filters BEFORE the top-k, and the page is a single
    TakeOrderedAndProject of k rows — page 1000 costs the same as
    page 1, while offset paging degrades linearly and (on a sharded
    serving tier) forces every shard to return offset+k rows.  The
    equality leg of the predicate is exact because serving scores are
    rounded to 4 decimals first (the engine-portable score law every
    bm25 query here already hash-matches on)."""
    s, d = F.col(score_col), F.col(id_col)
    base = scored
    if after is not None:
        cur = after.select(
            F.col(score_col).alias("__cs"), F.col(id_col).alias("__cd")
        )
        base = (
            scored.join(F.broadcast(cur))
            .filter(
                (s < F.col("__cs"))
                | ((s == F.col("__cs")) & (d > F.col("__cd")))
            )
            .drop("__cs", "__cd")
        )
    return base.orderBy(s.desc(), d.asc()).limit(int(k))


# ---------------------------------------------------------------------------
# next-word index (X108) — combined-index phrase serving
# ---------------------------------------------------------------------------

def nextword_tf(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(bigram, doc_id, tf)`` — the NEXT-WORD INDEX of Williams,
    Zobel & Bahle (Fast Phrase Querying with Combined Indexes, TOIS
    2004): a posting list per adjacent token PAIR.  A two-word quoted
    query is then answered by ONE pushed-down key lookup — no document
    scan (phrase_match), no candidate verify (phrase_match_indexed),
    no positional decode (phrase_match_positional); the per-doc tf IS
    the exact adjacency count.

    Build shape mirrors :func:`bigram_counts` (adjacency inside the
    token array via zip_with-over-slices, pure codegen) but keeps the
    doc id: one hash-agg shuffle over (bigram, doc_id).  The bigram
    vocabulary is the classic space-for-speed tradeoff — production
    builds restrict it to the query log's hot phrases; the relation
    keys through the SAME posting-shard writer as unigrams (the codec
    is key-agnostic), so the serving tier needs no new machinery."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )
    bigrams = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def phrase_match_nextword(
    nextword: DataFrame,
    phrase: str,
    docs: "DataFrame | None" = None,
    text_col: str = "text",
) -> DataFrame:
    """Quoted-query serving from the next-word index: result-identical
    to :func:`phrase_match` (shared oracle).

    Two-word phrases read their answer straight off the index.  Longer
    phrases use the combined scheme: intersect the postings of every
    consecutive bigram (pushed-down IN + contains-all — each bigram is
    a far rarer key than its unigrams, so the candidate set is tiny),
    then verify adjacency with the same codegen expression as
    phrase_match on candidates only (``docs`` required)."""
    words = _phrase_words(phrase)
    if len(words) < 2:
        raise ValueError("next-word index serves phrases of >= 2 words")
    pairs = sorted(
        {f"{a} {b}" for a, b in zip(words, words[1:], strict=False)}
    )
    if len(words) == 2:
        return (
            nextword.filter(F.col("bigram") == pairs[0])
            .select("doc_id", F.col("tf").cast("long").alias("n_hits"))
        )
    if docs is None:
        raise ValueError("phrases of > 2 words need docs to verify")
    cand = (
        nextword.filter(F.col("bigram").isin(pairs))
        .groupBy("doc_id")
        .agg(F.count_distinct("bigram").alias("nb"))
        .filter(F.col("nb") == len(pairs))
        .select("doc_id")
    )
    n_hits = _phrase_hits_expr(words, text_col)
    return (
        docs.join(cand, "doc_id", "left_semi")
        .select("doc_id", n_hits.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )
