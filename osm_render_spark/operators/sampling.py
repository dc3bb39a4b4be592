"""Dataset splitting and stratified sampling — library forms of the
`stratified_split` driver-contract query's semantics, plus the
skew-proof two-phase quota path PERF.md documents.

Split assignment is an arithmetic LCG of the id (engine-identical,
stable under reprocessing/appends — xxhash64 differs between engines,
and RNG-based sampleBy is not reproducible across partitionings)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LCG_A = 1103515245
LCG_B = 12345
LCG_M = 2147483648


def split_tag(df: DataFrame, id_col: str = "doc_id", name: str = "split") -> DataFrame:
    """Deterministic train/val/test tag (80/10/10): pure codegen column
    arithmetic, no shuffle, identical to the oracle query's SQL."""
    h = (F.col(id_col).cast("long") * F.lit(LCG_A) + F.lit(LCG_B)) % F.lit(LCG_M)
    return df.withColumn(
        name,
        F.when(h % 10 < 8, F.lit("train"))
        .when(h % 10 == 8, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact first-N-per-stratum by (LCG hash, id) — the quota sampler.
    SKEW-PROOF two-phase form (the cosine_topk trick): phase 1 takes a
    local top-N per (stratum, input partition) — the window key includes
    spark_partition_id(), so a dominant stratum spreads over all its
    partitions instead of serializing one task's sort — and phase 2's
    global per-stratum window then sees ≤ N·partitions rows, quota-sized
    regardless of corpus size. Output == the single-window form exactly
    (local top-N is a superset of the global top-N; pinned by test)."""
    h = ((F.col(id_col).cast("long") * F.lit(LCG_A) + F.lit(LCG_B)) % F.lit(LCG_M)).alias("_h")
    work = df.select(F.col(stratum_col).alias("_s"), F.col(id_col).alias("_id"), h)
    w1 = Window.partitionBy("_s", F.spark_partition_id()).orderBy("_h", "_id")
    pruned = (
        work.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= n_per_stratum)
        .drop("_r1")
    )
    w2 = Window.partitionBy("_s").orderBy("_h", "_id")
    return (
        pruned.withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= n_per_stratum)
        .select(
            F.col("_id").alias(id_col),
            F.col("_s").alias(stratum_col),
            F.col("_r2").alias("rank_in_stratum"),
        )
    )
