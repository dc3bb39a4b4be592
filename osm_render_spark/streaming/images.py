"""Streaming multimodal ingest — the image+caption twin of the text
stream's exact-dedup sink (streaming/dedup.py): a 10^12-image corpus is
appended continuously, and each micro-batch must be decode-VERIFIED and
deduplicated against everything already ingested without recomputation.

``image_ingest_foreach_batch``: a foreachBatch sink over input_hint-
shaped micro-batches (image_id, bytes, w, h, fmt, caption, phash):

1. decode/verify (raster.ops.decode_features — the real codecs,
   including progressive JPEG): rows failing dims_ok or the exact
   phash check are dropped;
2. exact dedup against the PERSISTENT seen table on two independent
   keys — sha256(caption) and the exact phash — so a re-crawled page
   (same caption) or a byte-identical/recompressed image (same phash)
   never lands twice; near-dup closure stays a batch-side operator
   (operators/dedup.dedup_images over the curated table) because banded
   closure is a global fixpoint, not per-batch state;
3. idempotent writes (the streaming/dedup.py discipline): curated rows
   and seen keys go to ``batch_id=N`` partitions with dynamic-partition
   OVERWRITE, and the anti-join reads only ``batch_id < N`` keys — a
   crash-replayed batch rewrites its own partitions byte-identically;
4. a per-batch LINEAGE/metrics row (batch_id, n_in, n_verified,
   n_fresh) — the per-partition counts the north rule's resumability
   clause asks for — written under the same idempotence contract.

Scale note: each micro-batch is a bounded DataFrame; the decode kernel
and the anti-joins inherit their batch-operator shapes. The seen table
grows one narrow (32B + 8B) row per ingested image; at 10^12 images
that is a ~40 TB side table on 100 TB of corpus — prune it with
plans/compact.compact_parquet like any other append-heavy table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def image_ingest_foreach_batch(
    curated_path: str, seen_path: str, metrics_path: str | None = None
):
    """Build the foreachBatch callable. Use:
    ``stream.writeStream.foreachBatch(image_ingest_foreach_batch(
    curated, seen, metrics)).start()``."""

    def process(batch: DataFrame, batch_id: int) -> None:
        from ..raster.ops import decode_features

        spark = batch.sparkSession
        n_in = batch.count()
        feats = decode_features(batch)
        ok_ids = feats.where(
            F.col("dims_ok") & F.coalesce(F.col("phash_ok"), F.lit(True))
        ).select("image_id")
        verified = batch.join(ok_ids, "image_id")
        keyed = verified.withColumn("_ck", F.sha2(F.col("caption"), 256))
        try:
            seen = (
                spark.read.option("basePath", seen_path)
                .parquet(seen_path)
                .where(F.col("batch_id") < F.lit(int(batch_id)))
            )
            fresh = keyed.join(
                seen.select("_ck"), "_ck", "left_anti"
            ).join(seen.select("phash"), "phash", "left_anti")
        except AnalysisException as e:
            from ..sources.manifest import is_path_not_found

            if not is_path_not_found(e):
                raise
            fresh = keyed
        # intra-batch dedup, deterministic keeper (min image_id per key)
        from pyspark.sql import Window

        for key in ("_ck", "phash"):
            w = Window.partitionBy(key).orderBy("image_id")
            fresh = (
                fresh.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
        fresh = fresh.withColumn("batch_id", F.lit(int(batch_id)))
        n_verified = verified.count()
        n_fresh = fresh.count()

        mode_conf = ("spark.sql.sources.partitionOverwriteMode", "dynamic")
        old = spark.conf.get(mode_conf[0], "static")
        spark.conf.set(*mode_conf)
        try:
            fresh.select(
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "batch_id",
            ).write.mode("overwrite").partitionBy("batch_id").parquet(
                curated_path
            )
            fresh.select("_ck", "phash", "batch_id").write.mode(
                "overwrite"
            ).partitionBy("batch_id").parquet(seen_path)
            if metrics_path is not None:
                spark.createDataFrame(
                    [(int(batch_id), n_in, n_verified, n_fresh)],
                    "batch_id long, n_in long, n_verified long, n_fresh long",
                ).write.mode("overwrite").partitionBy("batch_id").parquet(
                    metrics_path
                )
        finally:
            spark.conf.set(mode_conf[0], old)

    return process
