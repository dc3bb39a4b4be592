"""Stupid-backoff bigram language-model scoring — corpus-level quality
signal for training-data curation (the Gopher/C4-style 'does this doc
look like the reference corpus' filter, next to operators/repetition.py
and the text.py quality metrics).

Semantics (Brants et al. 2007, 'Large Language Models in Machine
Translation' — the public stupid-backoff recipe): score each bigram
(w1, w2) as

    S(w2|w1) = c2(w1,w2) / c1(w1)          if the bigram was seen
             = alpha * c1(w2) / T           otherwise (backoff)

against counts from a TRAINING slice of the corpus, and a document's
score is the sum over its bigram occurrences.  Everything is integer-
quantized (parts-per-million, floor division) so the result is
engine-independent and oracle-checkable: score_ppm uses
floor(scale*c2/c1) and floor(alpha_scaled*c1(w2)/T) — no doubles, no
logs, no accumulation-order hazard.

100 TB shape: one narrow pass builds per-doc bigram multiplicities
(zip_with over the split array — no posexplode self-join), counts are
two key-partitioned aggregations over the training slice, scoring is
three equi-joins on vocabulary-sized tables (AQE broadcasts them when
they fit; stopword bigrams are genuinely hot keys — skew-join handles
the rest), and the final per-doc rollup re-uses the doc_id grouping.
No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_lm_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_filter: str = "doc_id % 2 = 0",
    scale: int = 1_000_000,
    alpha_scaled: int = 400_000,
) -> DataFrame:
    """(doc_id, n_bigrams, n_backoff, score_ppm) for every document
    with ≥2 tokens; counts come from the ``train_filter`` slice.
    alpha_scaled is stupid-backoff's α (0.4) pre-multiplied by scale."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("ws"),
    )
    bi = (
        words.where(F.expr("size(ws) >= 2"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(ws, 1, size(ws)-1), slice(ws, 2, size(ws)-1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    # per-doc multiplicities first: the join input shrinks to distinct
    # (doc, w1, w2) triples before any vocabulary join
    per_doc = bi.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("m"))

    train_words = words.where(train_filter)
    uni = (
        train_words.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    bic = (
        train_words.where(F.expr("size(ws) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(ws, 1, size(ws)-1), slice(ws, 2, size(ws)-1),"
                    " (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    total = train_words.select(
        F.expr("CAST(SUM(size(ws)) AS BIGINT)").alias("t_tokens")
    )

    scored = (
        per_doc.join(bic, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), "c1"), ["w1"], "left")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("cu2")),
            ["w2"],
            "left",
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "s_ppm",
            F.expr(
                f"CASE WHEN c2 IS NOT NULL THEN ({scale} * c2) DIV c1 "
                f"ELSE ({alpha_scaled} * COALESCE(cu2, 0)) DIV t_tokens END"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.expr("CAST(SUM(m) AS BIGINT)").alias("n_bigrams"),
        F.expr(
            "CAST(SUM(CASE WHEN c2 IS NULL THEN m ELSE 0 END) AS BIGINT)"
        ).alias("n_backoff"),
        F.expr("CAST(SUM(m * s_ppm) AS BIGINT)").alias("score_ppm"),
    )
