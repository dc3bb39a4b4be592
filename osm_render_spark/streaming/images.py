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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def image_ingest_foreach_batch(
    curated_path: str, seen_path: str, metrics_path: str | None = None
):
    """Build the foreachBatch callable. Use:
    ``stream.writeStream.foreachBatch(image_ingest_foreach_batch(
    curated, seen, metrics)).start()``.

    Hardening (review catches): undecodable blobs are FLAGGED, not
    raised — one poison blob from a crawl must not crash-loop the
    replayed batch; NULL captions key on the image BYTES instead
    (domain-prefixed, so caption and bytes keys can't collide) rather
    than collapsing all null-caption rows into one window partition;
    keeper selection runs on a NARROW (image_id, _ck, phash)
    projection — image payloads never enter the dedup shuffles — with
    a full-key tie-break; and the batch is persisted once, so the
    decode kernel runs once per micro-batch, not once per action."""

    def process(batch: DataFrame, batch_id: int) -> None:
        from ..raster.ops import decode_features
        from ..sources.manifest import (
            dynamic_partition_overwrite,
            read_optional_parquet,
        )

        spark = batch.sparkSession
        batch = batch.persist()
        try:
            n_in = batch.count()
            feats = decode_features(batch, on_error="flag")
            ok_ids = feats.where(
                F.col("dims_ok") & F.coalesce(F.col("phash_ok"), F.lit(True))
            ).select("image_id")
            verified = batch.join(ok_ids, "image_id")
            # dedup keys on a NARROW projection; caption-null rows key
            # on their bytes (distinct domains via prefix)
            ck = F.when(
                F.col("caption").isNotNull(),
                F.sha2(F.concat(F.lit("c:"), F.col("caption")), 256),
            ).otherwise(F.sha2(F.concat(F.lit("b:"), F.base64("bytes")), 256))
            keys = verified.select(
                "image_id", ck.alias("_ck"), "phash"
            ).persist()
            seen = read_optional_parquet(
                spark, seen_path, before_batch=int(batch_id)
            )
            fresh_keys = keys
            if seen is not None:
                fresh_keys = fresh_keys.join(
                    seen.select("_ck"), "_ck", "left_anti"
                ).join(seen.select("phash"), "phash", "left_anti")
            # intra-batch dedup with a deterministic FULL-key tie-break
            # (duplicate image_ids from an at-least-once source must
            # resolve identically in every downstream action); image_id
            # itself is a dedup key too, so a twice-delivered id keeps
            # exactly one row
            for key in ("image_id", "_ck", "phash"):
                w = Window.partitionBy(key).orderBy("image_id", "phash", "_ck")
                fresh_keys = (
                    fresh_keys.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") == 1)
                    .drop("_rn")
                )
            fresh_keys = fresh_keys.persist()
            n_verified = keys.count()
            n_fresh = fresh_keys.count()
            # exact three-key join back: only the keeper ROW matches,
            # not every row sharing its image_id
            fresh = (
                verified.withColumn("_ck", ck)
                .join(fresh_keys, ["image_id", "_ck", "phash"])
                .dropDuplicates(["image_id"])
                .withColumn("batch_id", F.lit(int(batch_id)))
            )

            with dynamic_partition_overwrite(spark):
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
                        "batch_id long, n_in long, n_verified long, "
                        "n_fresh long",
                    ).write.mode("overwrite").partitionBy("batch_id").parquet(
                        metrics_path
                    )
            keys.unpersist()
            fresh_keys.unpersist()
        finally:
            batch.unpersist()

    return process
