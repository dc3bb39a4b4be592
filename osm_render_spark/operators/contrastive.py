"""Contrastive batch assembly — false-negative-safe batching for
CLIP/SimCLR-style training over a deduplicated multimodal corpus.

In-batch-negative losses treat every other pair in a batch as a
negative; two near-duplicates (same dedup cluster from
operators/dedup.dedup_images / similarity.semantic_dedup) in one batch
poison the loss with a false negative.  This operator assigns items to
fixed-size batches such that NO batch contains two members of the same
cluster, deterministically and with no coordination bottleneck:

1. ``level`` = rank of the item within its cluster (window per
   cluster — key-partitioned, cluster-sized partitions).  All items of
   one level belong to DISTINCT clusters by construction, so any
   partition of a level into batches is false-negative-free.
2. Items of a level are enumerated DISTRIBUTEDLY: arithmetic-hash
   bucket (engine-independent, no xxhash), within-(level,bucket)
   window rank, plus per-(level,bucket) base offsets computed from a
   (levels × buckets)-sized count table — the only driver-side
   materialization, dimension-sized (levels ≤ max cluster size).
   No global window over a level (level 1 holds one item per cluster —
   nearly the whole corpus — a single-reducer trap).
3. ``batch_in_level`` = (enum − 1) DIV batch_size; partial tail
   batches are dropped via the CLOSED-FORM level totals (no extra
   shuffle).

Output: (id, cluster, level, batch_in_level, enum) — (level,
batch_in_level) is the batch key.  Everything is integer arithmetic on
ranks, so the DuckDB oracle reproduces the assignment exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# multiplicative (Knuth) hash, kept in int64 for ids < 1e8 after the mod
_HASH_SQL = "((({id} % 100000007) * 2654435761) % {nb})"


def contrastive_batches(
    items: DataFrame,
    *,
    id_col: str = "id",
    cluster_col: str = "cluster",
    batch_size: int = 64,
    n_buckets: int = 64,
    drop_partial: bool = True,
) -> DataFrame:
    """Assign (id, cluster) rows to batches of exactly ``batch_size``
    with at most one member per cluster per batch."""
    lvl_w = Window.partitionBy(cluster_col).orderBy(id_col)
    bucket_sql = _HASH_SQL.format(id=id_col, nb=n_buckets)
    leveled = items.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).alias("cluster"),
        F.row_number().over(lvl_w).alias("level"),
        F.expr(bucket_sql).alias("bucket"),
    )

    # (levels × buckets) count table → driver → cumulative base offsets
    counts = {
        (r.level, r.bucket): r.n
        for r in leveled.groupBy("level", "bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    levels = sorted({lv for lv, _ in counts})
    offsets = []
    level_totals = {}
    for lv in levels:
        acc = 0
        for b in range(n_buckets):
            n = counts.get((lv, b), 0)
            if n:
                offsets.append((lv, b, acc))
            acc += n
        level_totals[lv] = acc
    spark = items.sparkSession
    off_df = spark.createDataFrame(
        offsets, "level int, bucket bigint, base bigint"
    )
    tot_df = spark.createDataFrame(
        [(lv, t) for lv, t in level_totals.items()], "level int, total bigint"
    )

    in_bucket_w = Window.partitionBy("level", "bucket").orderBy("id")
    enum = (
        leveled.withColumn("rnb", F.row_number().over(in_bucket_w))
        .join(F.broadcast(off_df), ["level", "bucket"])
        .join(F.broadcast(tot_df), ["level"])
        .selectExpr(
            "id",
            "cluster",
            "level",
            "base + rnb AS enum",
            f"(base + rnb - 1) DIV {batch_size} AS batch_in_level",
            "total",
        )
    )
    if drop_partial:
        enum = enum.where(f"(batch_in_level + 1) * {batch_size} <= total")
    return enum.select("id", "cluster", "level", "batch_in_level", "enum")
