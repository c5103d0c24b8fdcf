"""Query performance prediction: the Clarity score.

Cronen-Townsend, Zhou & Croft (SIGIR 2002): a query is "clear" when
the language model of its retrieved set diverges strongly from the
corpus model — low clarity predicts poor retrieval before any user
clicks arrive.  The serving fleet uses it to route ambiguous queries
to expansion (RM3) or federation instead of trusting a noisy top-k.

    clarity(q) = sum_w P(w|R) * ln( P(w|R) / P(w|C) )

with the relevance model P(w|R) the UNIFORM mixture of the top-k
documents' MLE models (tf(w,d)/dl(d)) — the deterministic variant, so
a SQL oracle reproduces it bit-for-bit — and P(w|C) = cf(w)/T the
corpus model.  Every w in any top-k doc contributes; P(w|C) > 0 for
those w by construction, so the KL sum is finite.

Scale shape: the top-k ids broadcast-semi-join into the tf table (one
probe of the corpus-sized side, same pattern as the ltr feature
export), the relevance model is a k-row-bounded aggregation, and the
corpus model reuses the tf lineage — no second corpus scan, no
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def clarity(
    tf: DataFrame,
    topk_ids: DataFrame,
    doc_id: str = "doc_id",
) -> DataFrame:
    """One row ``(clarity double)`` for the retrieved set ``topk_ids``
    (a DataFrame with one ``doc_id`` column, k rows)."""
    ids = topk_ids.select(F.col(doc_id).alias("doc_id")).distinct()
    k_df = ids.agg(F.count(F.lit(1)).cast("double").alias("__k"))

    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("__dl"))
    # corpus model from the same tf lineage: cf(w) / total tokens
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("__cf"))
    total = tf.agg(F.sum("tf").cast("double").alias("__t"))

    rel_tf = (
        tf.join(F.broadcast(ids), "doc_id")
        .join(dl, "doc_id")
        .select("term", (F.col("tf") / F.col("__dl")).alias("__pwd"))
    )
    # P(w|R): uniform doc mixture — sum of per-doc MLEs / k
    rel = (
        rel_tf.groupBy("term")
        .agg(F.sum("__pwd").alias("__s"))
        .crossJoin(k_df)
        .select("term", (F.col("__s") / F.col("__k")).alias("__pwr"))
    )
    return (
        rel.join(corpus, "term")
        .crossJoin(total)
        .agg(
            F.sum(
                F.col("__pwr")
                * F.log(
                    F.col("__pwr") / (F.col("__cf") / F.col("__t"))
                )
            ).alias("clarity")
        )
    )
