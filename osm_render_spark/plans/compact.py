"""Small-files compaction — the lakehouse OPTIMIZE step a long-running
ingest accumulates toward (streaming appends, per-batch dynamic
partition overwrites, and fine-grained checkpoint stages all write many
small parquet files; at 100 TB the file-listing and per-file open costs
eventually dominate scans).

Design: size the rewrite from the ACTUAL byte census (ceil(bytes /
target) output files — never a guessed partition count), preserve the
table's partition layout (each partition directory compacts
independently, so partition pruning is untouched), read with partition
TYPE INFERENCE DISABLED (inference would rewrite a string partition
value "00" as the long 0 — changed directory names, collided values),
and swap atomically via `atomic_dir_swap`: the rewrite lands in a
fixed-name sibling temp dir (debris from a crashed run self-heals on
the next) and replaces the live directory with two renames, so readers
never observe a MIX of old and new files — though POSIX has no portable
directory exchange, so a reader can transiently see the table absent
between the renames.

Concurrent writers: quiesce them if you can. If an append lands after
the rewrite snapshotted its file listing, the post-swap census of the
old directory won't match the pre-rewrite census — the old directory is
then KEPT as `{path}.rescued-*` (reported in the stats) instead of
deleted, so a racing writer's files are never silently destroyed.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid


def _census(path: str) -> tuple[int, int]:
    """(total_bytes, n_files) over the parquet DATA files under path.
    Underscore-prefixed directories (_manifest, _spark_metadata) are
    sidecars Spark's reader also skips — excluding them keeps the
    before/after stats, the n_out sizing, and the concurrent-writer
    census comparison all about the same file population."""
    total, n = 0, 0
    for r, dirs, fs in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        for f in fs:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(r, f))
                n += 1
    return total, n


def atomic_dir_swap(
    path: str, tmp: str, expected_census: tuple[int, int] | None = None
) -> str | None:
    """Replace directory ``path`` with ``tmp`` via two atomic renames
    (live → .old, tmp → live); rolls the original back and removes the
    tmp copy if the second rename fails. The displaced copy is deleted
    — unless ``expected_census`` is given and the displaced directory
    no longer matches it (a concurrent writer added files after the
    caller snapshotted), in which case it is preserved as
    ``{path}.rescued-<id>`` and that path is returned. Fixed-name .old
    debris from a crashed previous run is cleared first (self-healing,
    the streaming/render.py convention)."""
    old = f"{path}.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except Exception:
        os.rename(old, path)  # roll back to the intact original
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if expected_census is not None and _census(old) != expected_census:
        rescued = f"{path}.rescued-{uuid.uuid4().hex[:8]}"
        os.rename(old, rescued)
        return rescued
    shutil.rmtree(old, ignore_errors=True)
    return None


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 128,
    partition_cols: list[str] | None = None,
    manifest_cell_col: str | None = None,
) -> dict:
    """Rewrite the parquet table at ``path`` into ceil(bytes/target)
    files (per partition directory when ``partition_cols`` is given,
    preserving the layout partition pruning depends on). A
    MANIFEST-BACKED table (sources/manifest.write_dataset /
    functions/zorder.zorder_write output) must pass
    ``manifest_cell_col`` — the rewrite then goes through
    write_dataset, re-sorting on the key and writing a FRESH manifest
    whose per-file stats describe the new files; without it the plain
    rewrite would drop the _manifest sidecar (Spark's reader skips
    underscore dirs) and the swap would delete the only copy, so that
    case refuses loudly. Returns a stats dict (files/bytes before and
    after, plus ``rescued_old`` if a concurrent writer's files were
    preserved — see module docstring). Raises if the table is empty or
    missing."""
    from pyspark.sql import functions as F

    from ..sources.manifest import MANIFEST, write_dataset

    before = _census(path)
    before_bytes, before_files = before
    if before_files == 0:
        raise ValueError(f"no parquet files under {path!r}")
    if partition_cols and manifest_cell_col:
        raise ValueError(
            "partition_cols and manifest_cell_col are mutually exclusive: "
            "the manifest rewrite (write_dataset) produces a flat "
            "range-partitioned layout and would silently destroy the "
            "partition directories"
        )
    has_manifest = os.path.isdir(os.path.join(path, MANIFEST))
    if partition_cols is None and not has_manifest:
        # mirror the manifest guard: a hive-partitioned table compacted
        # without partition_cols would be silently FLATTENED (partition
        # directories — and the pruning they enable — destroyed)
        hive_dirs = sorted(
            d
            for d in os.listdir(path)
            if "=" in d
            and not d.startswith((".", "_"))
            and os.path.isdir(os.path.join(path, d))
        )
        if hive_dirs:
            keys = sorted({d.split("=", 1)[0] for d in hive_dirs})
            raise ValueError(
                f"{path!r} is hive-partitioned (saw {hive_dirs[0]!r}): "
                f"pass partition_cols={keys!r} so compaction preserves "
                f"the partition directories — a flat rewrite would "
                f"silently destroy partition pruning"
            )
    if has_manifest and manifest_cell_col is None:
        raise ValueError(
            f"{path!r} is manifest-backed ({MANIFEST}/ present): pass "
            f"manifest_cell_col=<key column> so compaction rebuilds the "
            f"per-file stats — a plain rewrite would silently destroy "
            f"the manifest"
        )
    # partition values must round-trip byte-identically: inference would
    # turn part=00 (string) into part=0 (long)
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_old = spark.conf.get(infer_key, "true")
    spark.conf.set(infer_key, "false")
    tmp = f"{path}.compact-tmp"
    shutil.rmtree(tmp, ignore_errors=True)  # debris from a crashed run
    try:
        df = spark.read.parquet(path)
        target_bytes = target_mb * 1024 * 1024
        n_out = max(1, math.ceil(before_bytes / target_bytes))
        if manifest_cell_col is not None:
            write_dataset(df, tmp, manifest_cell_col, n_out)
        elif partition_cols:
            # spread within partitions: repartition on the partition key
            # alone would put each directory's data in ONE task
            # regardless of size; ranging over (partition, a per-task
            # id) keeps big partitions parallel while small ones
            # coalesce
            writer = (
                df.repartitionByRange(
                    n_out,
                    *[F.col(c) for c in partition_cols],
                    F.spark_partition_id(),
                )
                .write.partitionBy(*partition_cols)
            )
            writer.mode("overwrite").parquet(tmp)
        else:
            df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    finally:
        spark.conf.set(infer_key, infer_old)
    rescued = atomic_dir_swap(path, tmp, expected_census=before)
    after_bytes, after_files = _census(path)
    return {
        "before_files": before_files,
        "before_bytes": before_bytes,
        "after_files": after_files,
        "after_bytes": after_bytes,
        "rescued_old": rescued,
    }
