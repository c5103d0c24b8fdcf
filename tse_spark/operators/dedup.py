"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard (shingle self-join), MinHash+LSH
(band-bucket join) and SimHash.  All SQL-expressible paths are
oracle-checked; MinHash/SimHash take a ``hash_fn`` knob:

- ``"xxhash64"`` (default): Spark's JVM-side xxhash64 — the fast path
  for production runs;
- ``"md5"``: a 32-bit base hash from the md5 hex prefix, computable
  bit-for-bit in ANSI SQL (DuckDB: ``('0x'||substr(md5(s),1,8))::
  BIGINT``) — same plan shape, slightly slower hash, but the entire
  approximate pipeline becomes value-verifiable by an external SQL
  oracle, not just recall-pinned in pytest.

Scale notes: the shingle self-join is the standard near-dup plan — it
shuffles on the shingle key, so frequency-capping hot shingles
(``max_shingle_df``) bounds the worst-case pair blowup; MinHash/LSH cuts
the candidate set to band-bucket collisions, which is the 100TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _base_hash32(col: str, hash_fn: str):
    """Uniform 32-bit non-negative base hash of a string column."""
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast(
            "long"
        )
    return F.xxhash64(col).bitwiseAND(F.lit((1 << 32) - 1))


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C7 replicas: groups of identical content by md5
    (reference tse/Crawl.cpp:523-545 page-MD5 dedup)."""
    return (
        docs.groupBy(
            F.md5(F.encode(F.col(text_col), "utf-8")).alias("fp")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the min-doc_id representative per content hash."""
    w = docs.select(
        "doc_id", F.md5(F.encode(F.col(text_col), "utf-8")).alias("fp")
    )
    keep = w.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi")


def shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-grams per doc."""
    arr = F.split(F.lower(F.col(text_col)), r"\s+")
    sh = F.expr(
        f"transform(sequence(0, size(arr) - {n}), "
        f"i -> concat_ws(' ', {', '.join(f'arr[i + {j}]' for j in range(n))}))"
    )
    return (
        docs.select("doc_id", arr.alias("arr"))
        .filter(F.size("arr") >= n)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def _drop_hot_keys(rel: DataFrame, col: str, cap: int | None) -> DataFrame:
    """Rows whose ``col`` value occurs in at most ``cap`` rows — the
    quadratic-explosion guard every all-pairs self-join here shares
    (jaccard_pairs, tf_cosine_pairs): a key shared by k docs yields
    k·(k−1)/2 pairs, so one stopword-grade key at web scale dominates
    the whole join while carrying no similarity signal.  ``None``
    disables the cap."""
    if cap is None:
        return rel
    cold = (
        rel.groupBy(col)
        .agg(F.count(F.lit(1)).alias("__kdf"))
        .filter(F.col("__kdf") <= cap)
        .select(col)
    )
    return rel.join(cold, col, "left_semi")


def jaccard_pairs(
    sh: DataFrame,
    min_jaccard: float = 0.0,
    top: int | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by shingle-set Jaccard.

    Plan: per-doc set sizes; self-join on shingle (doc_a < doc_b) ->
    intersection counts; |A∪B| = |A|+|B|-inter.  ``max_shingle_df``
    drops shingles shared by more than that many docs before the join
    (hot-key cap — a stopword shingle at web scale would otherwise
    produce a quadratic pair explosion).

    Metric semantics under the cap: BOTH the intersection and the set
    sizes are computed over the CAPPED shingle sets, so the result is
    the exact Jaccard similarity of the transformed sets
    J(A', B') with A' = A minus hot shingles — a self-consistent,
    well-defined metric (not exact J(A, B); high-df shingles carry no
    near-dup signal, which is also why MinHash pipelines drop them).
    The DuckDB oracle mirrors the same definition.
    """
    s = _drop_hot_keys(sh, "shingle", max_shingle_df)
    sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = s.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = s.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sa") + F.col("sb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )
    if top is not None:
        j = j.orderBy(
            F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b")
        ).limit(top)
    return j


def tf_cosine_pairs(
    tf: DataFrame,
    max_term_df: int | None = None,
    top: int | None = None,
) -> DataFrame:
    """Related-document pairs by TERM-VECTOR cosine — the batch
    "related articles" precompute (more_like_this answers one seed at
    a time; this materializes every pair above the noise floor in one
    pass), and at high thresholds a bag-of-words near-dup signal that
    sees reorderings shingles miss.

    Plan shape is :func:`jaccard_pairs`'s: ``max_term_df`` drops terms
    whose document frequency exceeds the cap BEFORE the term self-join
    (the hot-key law — a stopword term at web scale is a quadratic
    pair explosion and carries no relatedness signal; the cap is also
    a crude idf, which is why plain tf weights suffice here).  Norms
    are computed over the SAME capped term subspace as the dot
    products, so the result is the exact cosine of the transformed
    vectors — self-consistent, and the DuckDB oracle mirrors it.

    Determinism across engines: dot products and squared norms are
    sums of INTEGER products (exact in float64 in any summation
    order), so cos = dot / (sqrt(na2) * sqrt(nb2)) is bit-identical
    everywhere — no rounding law needed beyond the display round.

    Returns (doc_a, doc_b, dot, cos), doc_a < doc_b; ``top`` cuts by
    (cos desc, doc_a, doc_b) — a total order.
    """
    t = _drop_hot_keys(tf, "term", max_term_df)
    norms = t.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    a = t.select(F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tfa"))
    b = t.select(F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tfb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    out = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cos",
            F.round(
                F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2")), 6
            ),
        )
        .select("doc_a", "doc_b", "dot", "cos")
    )
    if top is not None:
        out = out.orderBy(
            F.desc("cos"), F.asc("doc_a"), F.asc("doc_b")
        ).limit(top)
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH (JVM-side hashes; pytest-verified against exact Jaccard)
# ---------------------------------------------------------------------------

# Deterministic affine hash family over xxhash64, mod a Mersenne prime.
_MH_PRIME = (1 << 61) - 1


def _minhash_cols(num_hashes: int, hash_fn: str = "xxhash64") -> list:
    # 32-bit base hash so a*h+b stays far below 2^63 (ANSI overflow-safe):
    # a < 2^20, h < 2^32 -> a*h+b < 2^53.
    cols = []
    base = _base_hash32("shingle", hash_fn)
    for i in range(num_hashes):
        a = 2 * i + 1          # odd multipliers, deterministic
        b = (0x9E3779B9 * (i + 1)) & 0xFFFFF
        h = (base * a + b) % _MH_PRIME
        cols.append(F.min(h).alias(f"mh_{i}"))
    return cols


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 16, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, mh_0..mh_{H-1}) MinHash signature per doc."""
    return sh.groupBy("doc_id").agg(*_minhash_cols(num_hashes, hash_fn))


def lsh_candidate_pairs(
    sig: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Band the signature, hash each band to a bucket, join docs sharing
    any band-bucket.  rows = (doc_a, doc_b).  In md5 (portable) mode the
    bucket key is the joined band values themselves — an equi-join key
    needs determinism, not compression, and this keeps the oracle SQL
    trivially identical."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for bnd in range(bands):
        cs = [F.col(f"mh_{bnd * rows_per_band + r}") for r in range(rows_per_band)]
        bucket = (
            F.concat_ws(",", *[c.cast("string") for c in cs])
            if hash_fn == "md5"
            else F.xxhash64(*cs).cast("string")
        )
        band_cols.append(
            F.struct(F.lit(bnd).alias("band"), bucket.alias("bucket"))
        )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_neardup(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> signature -> banded
    candidates -> exact-Jaccard verification of candidates only.

    Verification joins each candidate pair with the two docs' shingle
    SETS and intersects JVM-side (``array_intersect``) — cost is
    O(|candidates| * shingles/doc), never the quadratic all-pairs
    shingle self-join (which at web scale is exactly what LSH exists to
    avoid)."""
    sh = shingles(docs, n)
    cand = lsh_candidate_pairs(
        minhash_signatures(sh, num_hashes, hash_fn),
        num_hashes,
        bands,
        hash_fn,
    )
    sets = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("s"))
    j = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"), F.col("s").alias("sa")
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"), F.col("s").alias("sb")
            ),
            "doc_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sa") + F.size("sb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return j.select("doc_a", "doc_b", "jaccard")


def simhash64(
    docs: DataFrame, text_col: str = "text", hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over tf-weighted term hashes,
    computed JVM-side: per bit, sum(tf * (bit ? +1 : -1)) >= 0.

    The per-bit sums are 64 conditional aggregations over the exploded
    term table — all codegen'd; no Python.  ``hash_fn="md5"`` draws
    bit i from nibble i//4 of the md5 hex digest (bit i%4), which an
    external SQL oracle reproduces exactly.
    """
    t = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.octet_length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if hash_fn == "md5":
        # pack the 32 hex nibbles into four 32-bit words once per row;
        # each bit is then one integer shift+mask instead of an
        # instr/substring string op x64 (hex char j+1 is the most
        # significant nibble of word j//8, so bit i%4 of nibble i//4
        # sits at (7 - (i//4) % 8) * 4 + i%4 of word i//32 — the same
        # values the SQL oracle extracts nibble-wise)
        t = t.withColumn("h", F.md5("term"))
        # bits 0..63 live in nibbles 0..15 = hex chars 1..16 = words
        # 0 and 1 only; words 2/3 of the digest are never read
        for w in range(2):
            t = t.withColumn(
                f"_w{w}",
                F.conv(F.substring("h", 8 * w + 1, 8), 16, 10).cast(
                    "long"
                ),
            )

        def _bit(i):
            sh = (7 - (i // 4) % 8) * 4 + i % 4
            return F.shiftright(f"_w{i // 32}", sh).bitwiseAND(F.lit(1))
    else:
        t = t.withColumn("h", F.xxhash64("term"))

        def _bit(i):
            return F.shiftright("h", i).bitwiseAND(F.lit(1))

    bit_sums = [
        F.sum(
            F.when(_bit(i) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = t.groupBy("doc_id").agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(64):
        # bit 63 is the sign bit of the signed 64-bit simhash
        val = (1 << i) if i < 63 else -(1 << 63)
        sim = sim + F.when(
            F.col(f"b{i}") >= 0, F.lit(val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", sim.alias("simhash"))


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 5,
    min_frac: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    n-grams overlap a held-out evaluation set (the standard 13-gram
    contamination check from LLM training-data pipelines, parameterized
    here because the synthetic corpus is short-doc).

    Returns (doc_id, n_grams, n_contaminated, contam_frac) for every
    training doc with at least one benchmark n-gram hit and
    ``contam_frac >= min_frac``; counts are over DISTINCT per-doc
    n-grams (overlap of sets, the published definition).

    Plan: the benchmark side reduces to a DISTINCT n-gram set —
    tiny relative to the corpus even when the eval suite is millions of
    grams — and is broadcast; the training grams stream through a
    broadcast left-semi-style inner join with zero shuffle of the
    corpus, then one hash-agg by doc_id.  At 10^12 docs this is a
    single map-side-joined pass; no pair blowup is possible because the
    join key is the gram and the output is pre-aggregated per doc.
    """
    from pyspark.sql.functions import broadcast

    t_grams = shingles(train, n=n, text_col=text_col)
    b_grams = (
        shingles(bench, n=n, text_col=text_col)
        .select(F.col("shingle"))
        .distinct()
    )
    per_doc = t_grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    hits = (
        t_grams.join(broadcast(b_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        hits.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_grams"), 6
            ).alias("contam_frac"),
        )
        .filter(F.col("contam_frac") >= min_frac)
    )


def dup_span_mask(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """ExactSubstr-style duplicate-span removal (the "deduplicating
    training data" recipe, reformulated for Spark): mask every token
    position that lies inside a CROSS-DOCUMENT duplicated span of
    >= ``n`` tokens, and emit the cleaned text.

    The suffix-array formulation doesn't distribute; the equivalent
    n-gram law does: a span of length >= n repeats across docs iff
    every n-gram inside it repeats across docs, so the union of
    positions covered by cross-doc-duplicated n-grams IS the union of
    duplicated spans.  Dataflow:

      1. (doc_id, pos, key) n-gram occurrences, built INSIDE the token
         array (transform over an index sequence — no positional
         self-join); ``key`` is the gram hashed per ``hash_fn``
         (module docstring: xxhash64 production / md5 oracle mode), so
         only (key, doc_id, pos) triples ever shuffle, never gram text;
      2. duplicated keys via min(doc_id) <> max(doc_id) — a
         partially-aggregable test for "seen in >= 2 docs" (no
         count-distinct shuffle of doc ids);
      3. covered positions = the semi-joined occurrences exploded to
         their n positions, distinct per doc;
      4. reconstruction: anti-join token positions against coverage,
         re-assemble per doc (sort_array over (pos, token) structs —
         a per-doc array sort, no global order).

    Output: (doc_id, n_tokens, n_masked, dup_ratio, clean_text) for
    every input doc (docs shorter than ``n`` tokens pass through
    unmasked).
    """
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )
    base = docs.select("doc_id", arr.alias("arr"))
    # sequence(1, 0) would step DOWN ([1, 0]) — docs shorter than n
    # tokens must produce an empty gram list instead
    n_grams_of = F.when(
        F.size("arr") >= n,
        F.sequence(F.lit(1), F.size("arr") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        "doc_id",
        F.explode(
            F.transform(
                n_grams_of,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(
                        " ", F.slice("arr", i, F.lit(n))
                    ).alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.gram")
    if hash_fn == "md5":
        key = F.md5(F.encode("gram", "UTF-8"))
    else:
        key = F.xxhash64("gram")
    occ = grams.select("doc_id", "pos", key.alias("key"))
    dup = occ.groupBy("key").agg(
        F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx")
    ).filter(F.col("_mn") != F.col("_mx")).select("key")
    cov = (
        occ.join(dup, "key", "semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("p"),
        )
        .distinct()
    )
    toks = base.select(
        "doc_id",
        F.size("arr").alias("n_tokens"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("arr"), F.lit(1))),
                lambda i: F.struct(
                    i.alias("p"),
                    F.try_element_at("arr", i).alias("tok"),
                ),
            )
        ).alias("t"),
    ).select("doc_id", "n_tokens", "t.p", "t.tok").filter(
        F.col("tok").isNotNull()
    )
    surv = toks.join(
        cov, ["doc_id", "p"], "left_anti"
    ).groupBy("doc_id", "n_tokens").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("p", "tok"))
                ),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    # fully-masked docs drop out of surv; docs with zero tokens never
    # had token rows — restore both from the base relation
    full = base.select("doc_id", F.size("arr").alias("n_tokens"))
    return full.join(
        surv.select("doc_id", "n_kept", "clean_text"), "doc_id", "left"
    ).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_masked"),
        F.when(F.col("n_tokens") > 0, F.round(
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            / F.col("n_tokens"),
            4,
        )).otherwise(F.lit(0.0)).alias("dup_ratio"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm, Schleimer
    et al. SIGMOD'03): hash every k-token gram, slide a w-gram window,
    keep each window's MINIMUM hash — the provably position-robust
    sample of the k-gram stream (any shared run of w+k-1 tokens is
    guaranteed to share a fingerprint).  A third fingerprint family
    next to MinHash (per-doc global sample) and SimHash (weighted
    projection): winnowing is LOCAL, so it survives reordering and
    partial overlap that break the global schemes.

    Returns the DISTINCT (doc_id, fp) relation.  The classic
    formulation also records positions; the hash-set form is what
    pair-matching consumes and keeps the law window-min-only, which
    both Spark and SQL express as one frame-bounded window aggregate.

    Scale: grams/hashes are built inside the token array (no
    positional self-join); the sliding min is a per-doc window frame —
    partitioned by doc, never global; output is sampled down ~2/(w+1)
    of the k-gram stream before anything shuffles to matching."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )
    base = docs.select("doc_id", arr.alias("arr")).filter(
        F.size("arr") >= k
    )
    grams = base.select(
        "doc_id",
        F.size("arr").alias("_len"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("arr") - (k - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(
                        " ", F.slice("arr", i, F.lit(k))
                    ).alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "_len", "g.pos", "g.gram")
    h = _base_hash32("gram", hash_fn)
    hashed = grams.select("doc_id", "_len", "pos", h.alias("h"))
    from pyspark.sql import Window

    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # a row is a window START while w k-grams remain; shorter docs
    # (fewer than w k-grams) contribute their single ragged window
    n_kgrams = F.col("_len") - (k - 1)
    starts = hashed.withColumn("fp", F.min("h").over(win)).filter(
        (F.col("pos") <= n_kgrams - (w - 1)) | (F.col("pos") == 1)
    )
    return starts.select("doc_id", "fp").distinct()


def winnow_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    max_fp_df: int | None = 200,
) -> DataFrame:
    """(id_a, id_b, n_shared) for doc pairs sharing at least
    ``min_shared`` winnowing fingerprints — the candidate relation a
    plagiarism/near-dup pipeline verifies.  Same hot-key cap law as
    jaccard_pairs (``max_fp_df``): a fingerprint shared by k docs
    yields k·(k−1)/2 pairs, and ubiquitous fingerprints carry no
    signal."""
    cold = _drop_hot_keys(fps, "fp", max_fp_df)
    a = cold.select(F.col("doc_id").alias("id_a"), "fp")
    b = cold.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


def banded_signatures(
    sig: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, band, bucket) — the LSH banding of a signature table
    (the same law lsh_candidate_pairs uses internally); exposed so an
    incremental batch can band against a MATERIALIZED corpus signature
    table instead of re-banding the corpus per run."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for bnd in range(bands):
        cs = [
            F.col(f"mh_{bnd * rows_per_band + r}")
            for r in range(rows_per_band)
        ]
        bucket = (
            F.concat_ws(",", *[c.cast("string") for c in cs])
            if hash_fn == "md5"
            else F.xxhash64(*cs).cast("string")
        )
        band_cols.append(
            F.struct(F.lit(bnd).alias("band"), bucket.alias("bucket"))
        )
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")


def neardup_vs_corpus(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_sig: DataFrame | None = None,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
    hash_fn: str = "xxhash64",
    text_col: str = "text",
) -> DataFrame:
    """INCREMENTAL near-dup — the production shape minhash_neardup's
    one-shot batch form doesn't cover: a (small) new crawl batch
    checked against the (huge) historical corpus without ever
    re-processing the corpus.

    - ``corpus_sig``: the corpus's materialized (doc_id, mh_*)
      signature table (build once with shingles + minhash_signatures,
      maintain O(delta) like the ANN signature tables); when None it
      is derived from ``corpus_docs`` (test/oracle path).
    - candidates: the BATCH side is banded and BROADCAST into an
      equi-join against the banded corpus signatures — per-batch cost
      tracks the batch, the corpus table is only scanned;
    - verification: exact Jaccard, with corpus shingle sets recomputed
      ONLY for candidate corpus docs (semi-join on the broadcast
      candidate ids) — signatures are stored, shingle sets are not.

    Returns (new_id, corpus_id, jaccard) for verified matches; feed to
    an anti-join to keep only novel batch docs."""
    new_sh = shingles(new_docs, n, text_col)
    new_sig = minhash_signatures(new_sh, num_hashes, hash_fn)
    if corpus_sig is None:
        corpus_sig = minhash_signatures(
            shingles(corpus_docs, n, text_col), num_hashes, hash_fn
        )
    nb = F.broadcast(
        banded_signatures(new_sig, num_hashes, bands, hash_fn)
    ).alias("a")
    cb = banded_signatures(corpus_sig, num_hashes, bands, hash_fn).alias(
        "b"
    )
    cand = (
        nb.join(
            cb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.doc_id").alias("new_id"),
            F.col("b.doc_id").alias("corpus_id"),
        )
        .distinct()
    )
    cand_corpus = F.broadcast(
        cand.select(F.col("corpus_id").alias("doc_id")).distinct()
    )
    corpus_sets = (
        shingles(
            corpus_docs.join(cand_corpus, "doc_id", "semi"), n, text_col
        )
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("s"))
    )
    new_sets = new_sh.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("s")
    )
    return (
        cand.join(
            new_sets.select(
                F.col("doc_id").alias("new_id"), F.col("s").alias("sa")
            ),
            "new_id",
        )
        .join(
            corpus_sets.select(
                F.col("doc_id").alias("corpus_id"),
                F.col("s").alias("sb"),
            ),
            "corpus_id",
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sa") + F.size("sb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("new_id", "corpus_id", "jaccard")
    )


def novel_docs(new_docs: DataFrame, matches: DataFrame) -> DataFrame:
    """The batch minus anything that near-dups the corpus — what an
    incremental curation pipeline actually appends."""
    return new_docs.join(
        matches.select(F.col("new_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )


def mirror_hosts(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    fp_col: str | None = None,
    min_shared: int = 1,
    min_overlap: float = 0.5,
    max_fp_hosts: int | None = 256,
) -> DataFrame:
    """Host-level mirror detection (Bharat & Broder, WWW8 1999) — the
    crawl-bandwidth half of dedup the page-level replica groups
    (C7, :func:`exact_dup_groups`) can't see: two HOSTS serving
    largely the same content should be crawled once, not twice, and
    the reference's md5 page-dedup (tse/Crawl.cpp:523-545) only
    discovers that after fetching both copies.

    Per host, content is the DISTINCT set of page fingerprints
    (md5(text) unless ``fp_col`` is given); a candidate mirror pair is
    any two hosts sharing a fingerprint, scored by

        overlap = |A ∩ B| / min(|A|, |B|)

    (the containment form — a small mirror of a big site still scores
    1.0).  Pairs with ``shared >= min_shared`` and ``overlap >=
    min_overlap`` survive, ordered (host_a < host_b) so each pair
    appears once.

    Scale shape: ONE shuffle on the fingerprint key produces the
    candidate pairs — only hosts that actually share content ever
    meet, never an all-pairs host join.  ``max_fp_hosts`` drops
    fingerprints present on more hosts than the cap (empty pages,
    boilerplate-only shells) — the same hot-key law as the shingle
    join, bounding the per-key pair blowup at cap² — and host sizes
    are computed BEFORE the cap so overlap stays a fraction of the
    host's true corpus."""
    fp = (
        F.col(fp_col)
        if fp_col
        else F.md5(F.encode(F.col(text_col), "utf-8"))
    )
    hf = (
        pages.select(
            F.parse_url(F.col(url_col), F.lit("HOST")).alias("host"),
            fp.alias("fp"),
        )
        .distinct()
    )
    sizes = hf.groupBy("host").agg(F.count(F.lit(1)).alias("n_fp"))
    capped = _drop_hot_keys(hf, "fp", max_fp_hosts)
    # rename before the self-join: aliased same-lineage columns can
    # misresolve the a.host < b.host predicate to one side
    left = capped.select(F.col("host").alias("host_a"), "fp")
    right = capped.select(F.col("host").alias("host_b"), "fp")
    shared = (
        left.join(right, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # sizes is host-cardinality (orders smaller than the page scan) —
    # broadcast it so the overlap join never reshuffles the pair set
    out = (
        shared.join(
            F.broadcast(
                sizes.withColumnRenamed("host", "host_a").withColumnRenamed(
                    "n_fp", "size_a"
                )
            ),
            "host_a",
        )
        .join(
            F.broadcast(
                sizes.withColumnRenamed("host", "host_b").withColumnRenamed(
                    "n_fp", "size_b"
                )
            ),
            "host_b",
        )
        .withColumn(
            "overlap",
            F.round(
                F.col("shared") / F.least("size_a", "size_b"), 6
            ),
        )
        .filter(
            (F.col("shared") >= int(min_shared))
            & (F.col("overlap") >= float(min_overlap))
        )
        .select("host_a", "host_b", "shared", "size_a", "size_b", "overlap")
    )
    return out
