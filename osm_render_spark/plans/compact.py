"""Small-files compaction — the lakehouse OPTIMIZE step a long-running
ingest accumulates toward (streaming appends, per-batch dynamic
partition overwrites, and fine-grained checkpoint stages all write many
small parquet files; at 100 TB the file-listing and per-file open costs
eventually dominate scans).

Design: size the rewrite from the ACTUAL byte census (ceil(bytes /
target) output files — never a guessed partition count), preserve the
table's partition layout (each partition directory compacts
independently, so partition pruning is untouched), and swap atomically:
the rewrite lands in a sibling temp dir and replaces the live directory
with two renames (live → .old, tmp → live) so readers never observe a
MIX of old and new files — though POSIX has no portable directory
exchange, so a reader can transiently see the table absent between the
renames; the .old copy is removed last and survives a crash for manual
recovery. Correctness = byte-census-independent row equality
(pinned by tests); compaction never changes data, only file boundaries.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid


def _census(path: str) -> tuple[int, int]:
    """(total_bytes, n_files) over the parquet data files under path."""
    total, n = 0, 0
    for r, _d, fs in os.walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(r, f))
                n += 1
    return total, n


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 128,
    partition_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at ``path`` into ceil(bytes/target)
    files (per partition directory when ``partition_cols`` is given,
    preserving the layout partition pruning depends on). Returns a
    stats dict (files/bytes before and after). Atomic swap via sibling
    renames; raises if the table is empty or missing."""
    from pyspark.sql import functions as F

    before_bytes, before_files = _census(path)
    if before_files == 0:
        raise ValueError(f"no parquet files under {path!r}")
    df = spark.read.parquet(path)
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    target_bytes = target_mb * 1024 * 1024
    n_out = max(1, math.ceil(before_bytes / target_bytes))
    if partition_cols:
        # spread within partitions: repartition on the partition key
        # alone would put each directory's data in ONE task regardless
        # of size; ranging over (partition, a uniform hash) keeps big
        # partitions parallel while small ones coalesce
        writer = (
            df.repartitionByRange(
                n_out, *[F.col(c) for c in partition_cols], F.spark_partition_id()
            )
            .write.partitionBy(*partition_cols)
        )
    else:
        writer = df.repartition(n_out).write
    writer.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except Exception:
        os.rename(old, path)  # roll back to the intact original
        raise
    shutil.rmtree(old, ignore_errors=True)
    after_bytes, after_files = _census(path)
    return {
        "before_files": before_files,
        "before_bytes": before_bytes,
        "after_files": after_files,
        "after_bytes": after_bytes,
    }
