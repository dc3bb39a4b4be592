"""Dataset splitting and stratified sampling — library forms of the
`stratified_split` driver-contract query's semantics, plus the
skew-proof quota path PERF.md documents.

Split assignment is an arithmetic LCG of the id (engine-identical,
stable under reprocessing/appends — xxhash64 differs between engines,
and RNG-based sampleBy is not reproducible across partitionings). The
id is reduced mod 2^31 BEFORE the multiply: id * A would overflow
int64 for ids ≥ ~8.4e9 (real OSM node ids already do), raising under
ANSI and silently skewing every large id into 'train' without it;
(id mod 2^31) * A < 2^62 is always safe, and for ids < 2^31 the hash
is unchanged. pmod keeps negative ids nonnegative (the shared-SQL
query form uses plain % over nonnegative ids only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LCG_A = 1103515245
LCG_B = 12345
LCG_M = 2147483648


def _lcg(col):
    reduced = F.pmod(col.cast("long"), F.lit(LCG_M))
    return F.pmod(reduced * F.lit(LCG_A) + F.lit(LCG_B), F.lit(LCG_M))


def split_tag(df: DataFrame, id_col: str = "doc_id", name: str = "split") -> DataFrame:
    """Deterministic train/val/test tag (80/10/10): pure codegen column
    arithmetic, no shuffle, identical to the oracle query's SQL for
    nonnegative ids < 2^31 and overflow-safe for all int64 ids."""
    h = _lcg(F.col(id_col))
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
    SKEW-PROOF map-side-prune form (the cosine_topk trick, literally):
    an Arrow kernel keeps each batch's top-N per stratum BEFORE any
    shuffle — sound because a row in the global top-N of stratum s is
    in its own batch's top-N (fewer than N rows beat it anywhere, so
    fewer do in the batch) — and the single global window then sees
    ≤ N·batches rows per stratum, quota-sized regardless of corpus
    size or stratum skew. Output == the naive single-window form
    exactly (pinned by test)."""
    import pandas as pd

    work = df.select(
        F.col(stratum_col).alias("_s"),
        F.col(id_col).alias("_id"),
        _lcg(F.col(id_col)).alias("_h"),
    )

    def prune(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.sort_values(["_s", "_h", "_id"])
                .groupby("_s", sort=False)
                .head(n_per_stratum)
            )

    s_t = work.schema["_s"].dataType.simpleString()
    id_t = work.schema["_id"].dataType.simpleString()
    pruned = work.mapInPandas(prune, schema=f"_s {s_t}, _id {id_t}, _h long")
    w = Window.partitionBy("_s").orderBy("_h", "_id")
    return (
        pruned.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= n_per_stratum)
        .select(
            F.col("_id").alias(id_col),
            F.col("_s").alias(stratum_col),
            F.col("_r").alias("rank_in_stratum"),
        )
    )


def mixture_quotas(weights: dict[str, int], total: int) -> dict[str, int]:
    """Exact largest-remainder (Hamilton) allocation of `total` slots
    across sources proportional to integer `weights` — pure-integer
    driver math (weights are dimension-sized by contract).  Quotas sum
    to `total` exactly; ties on remainder break by source name."""
    wsum = sum(weights.values())
    base = {s: total * w // wsum for s, w in weights.items()}
    extras = total - sum(base.values())
    by_rem = sorted(
        weights, key=lambda s: (-(total * weights[s] % wsum), s)
    )
    for s in by_rem[:extras]:
        base[s] += 1
    return base


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture/curriculum sampling: select exactly
    quota(source) rows per source (largest-remainder proportional to
    `weights`), picking each source's first-N by (LCG hash, id) — the
    stable, RNG-free order every sampler in this engine uses.  Sources
    with fewer rows than their quota contribute all they have (the
    result then undershoots `total`; documented, no redistribution).

    Scale shape: same as stratified_sample — a map-side Arrow prune
    keeps each batch's top-max(quota) per source BEFORE the single
    stratum-keyed window, so the shuffle is quota-sized regardless of
    corpus size or source skew; quotas ride a broadcast join."""
    import pandas as pd  # noqa: F401 — Arrow batches arrive as pandas

    quotas = mixture_quotas(weights, total)
    maxq = max(quotas.values())
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        sorted(quotas.items()), f"_s string, _quota int"
    )

    work = df.filter(F.col(source_col).isin(list(weights))).select(
        F.col(source_col).alias("_s"),
        F.col(id_col).alias("_id"),
        _lcg(F.col(id_col)).alias("_h"),
    )

    def prune(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.sort_values(["_s", "_h", "_id"])
                .groupby("_s", sort=False)
                .head(maxq)
            )

    id_t = work.schema["_id"].dataType.simpleString()
    pruned = work.mapInPandas(prune, schema=f"_s string, _id {id_t}, _h long")
    w = Window.partitionBy("_s").orderBy("_h", "_id")
    return (
        pruned.withColumn("_r", F.row_number().over(w))
        .join(F.broadcast(qdf), "_s")
        .where(F.col("_r") <= F.col("_quota"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_s").alias(source_col),
            F.col("_r").alias("rank_in_source"),
        )
    )
