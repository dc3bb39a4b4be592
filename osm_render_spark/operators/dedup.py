"""Deduplication operators for the training-data pipeline (task brief:
exact, MinHash+LSH, SimHash, n-gram Jaccard).

DataFrame-API forms for library use; the SQL-text forms used by the
oracle-checked queries live in operators.text (one arithmetic definition,
two dialects — the DataFrame ops here are built on the SAME Spark SQL
texts via F.expr, so they share the definition).

Scale notes (10^12 docs): exact dedup is one hash-agg shuffle on a
fixed-width key (sha256 of text — never shuffle raw text). MinHash
signatures are a narrow map (HOF transforms, JVM codegen). LSH banding
shuffles once per band on (band, h...) — candidate pairs only surface
within buckets, so the quadratic blowup is bounded by bucket size; a
bucket-size cap (drop degenerate buckets) keeps the worst case linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import MINHASH_A, SPARK, minhash_sql, shingles_sql, word_keys_sql


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct text with the
    canonical (min) id and the duplicate count. The groupBy key is
    sha2(text) so the shuffle carries 32 bytes, not documents."""
    keyed = df.withColumn("_k", F.sha2(F.col(text_col), 256))
    return (
        keyed.groupBy("_k")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("_k")
        .select("canonical_id", "n_copies")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, mh0..mh3) minhash signature per document (word-trigram
    shingles). Shingles explode once, the 4 hash mins aggregate in one
    hash-agg — pure HOF + codegen arithmetic, no UDF, O(total shingles)."""
    from .text import MINHASH_B, P

    keys = word_keys_sql(SPARK, text_col)
    sh = shingles_sql(SPARK, f"({keys})")
    exploded = df.select(
        F.col(id_col), F.explode_outer(F.expr(sh)).alias("s")
    )
    aggs = [
        F.coalesce(
            F.min(F.expr(f"({MINHASH_A[j]} * s + {MINHASH_B[j]}) % {P}")), F.lit(-1)
        )
        .cast("long")
        .alias(f"mh{j}")
        for j in range(len(MINHASH_A))
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_buckets(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the 4-hash signature into 2 bands of 2; emit non-trivial
    buckets (n>1) — the candidate groups for near-dup verification."""
    bands = []
    for band, (h1, h2) in enumerate((("mh0", "mh1"), ("mh2", "mh3"))):
        bands.append(
            signatures.select(
                F.lit(band).alias("band"),
                F.col(h1).alias("h1"),
                F.col(h2).alias("h2"),
                F.col(id_col),
            )
        )
    allb = bands[0].unionAll(bands[1])
    return (
        allb.groupBy("band", "h1", "h2")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .where(F.col("n_docs") > 1)
    )
