"""Small-files compaction: data equality, file-count reduction,
partition-layout preservation, atomic-swap rollback."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from osm_render_spark.plans.compact import _census, compact_parquet


def test_compact_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    df.repartition(40).write.parquet(path)
    rows_before = sorted(r["id"] for r in spark.read.parquet(path).collect())
    stats = compact_parquet(spark, path, target_mb=128)
    assert stats["before_files"] == 40
    assert stats["after_files"] < stats["before_files"]
    assert stats["after_files"] <= 2
    rows_after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert rows_after == rows_before


def test_compact_preserves_partition_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.range(0, 12_000).select(
        (F.col("id") % 4).alias("part"), F.col("id"), (F.col("id") % 13).alias("v")
    )
    df.repartition(30).write.partitionBy("part").parquet(path)
    before = _census(path)
    assert before[1] >= 40  # ~30 files per partition dir would be 120; at least many
    want = {
        (r["part"], r["id"]) for r in spark.read.parquet(path).collect()
    }
    stats = compact_parquet(spark, path, target_mb=128, partition_cols=["part"])
    assert stats["after_files"] < stats["before_files"]
    assert stats["rescued_old"] is None
    # directory layout intact -> partition pruning still applies
    dirs = [d for d in os.listdir(path) if d.startswith("part=")]
    assert sorted(dirs) == ["part=0", "part=1", "part=2", "part=3"]
    got_df = spark.read.parquet(path)
    got = {(r["part"], r["id"]) for r in got_df.collect()}
    assert got == want
    plan = (
        got_df.where(F.col("part") == 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "part" in plan


def test_compact_missing_table_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet(spark, str(tmp_path / "absent"))


def test_compact_hive_table_without_partition_cols_refuses(spark, tmp_path):
    """A hive-partitioned table compacted without partition_cols would
    be silently flattened (pruning destroyed) — must refuse loudly,
    naming the keys to pass, and leave the table untouched."""
    path = str(tmp_path / "hp")
    df = spark.range(0, 2_000).select(
        (F.col("id") % 3).alias("part"), F.col("id")
    )
    df.repartition(6).write.partitionBy("part").parquet(path)
    before = _census(path)
    with pytest.raises(ValueError, match=r"hive-partitioned.*'part'"):
        compact_parquet(spark, path, target_mb=128)
    assert _census(path) == before  # untouched
    # the explicit-cols path still works on the same table
    stats = compact_parquet(spark, path, target_mb=128, partition_cols=["part"])
    assert stats["after_files"] < before[1]


def test_compact_streamed_ivf_lists_probe_unchanged(spark, tmp_path):
    """Integration with the small-files producer: after N streaming
    appends the lists/ tree holds many (list_id, batch_id) files;
    compacting with the partition cols preserved must leave probe
    results bit-identical (the scan still prunes on list_id)."""
    import numpy as np

    from osm_render_spark.operators.similarity import (
        build_ivf_index,
        ivf_append_foreach_batch,
        query_ivf_index,
    )

    rng = np.random.default_rng(73)
    vecs = rng.normal(size=(150, 16)).astype(np.float32)

    def df_of(lo, hi):
        return spark.createDataFrame(
            [(int(i), [float(v) for v in vecs[i]]) for i in range(lo, hi)],
            "vec_id long, embedding array<float>",
        )

    path = str(tmp_path / "ivf")
    build_ivf_index(df_of(0, 90), path, n_centroids=4, quantizer="head")
    fn = ivf_append_foreach_batch(path)
    for b in range(4):
        fn(df_of(90 + 15 * b, 105 + 15 * b), b)
    queries = df_of(0, 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    want = sorted(
        (r["query_id"], r["rank"], r["cand_id"])
        for r in query_ivf_index(spark, path, queries, 5, n_probe=4).collect()
    )
    stats = compact_parquet(
        spark, f"{path}/lists", partition_cols=["list_id", "batch_id"]
    )
    assert stats["after_files"] < stats["before_files"]
    got = sorted(
        (r["query_id"], r["rank"], r["cand_id"])
        for r in query_ivf_index(spark, path, queries, 5, n_probe=4).collect()
    )
    assert got == want


def test_compact_string_partition_values_round_trip(spark, tmp_path):
    """Review regression: partition TYPE inference must not rewrite
    values — a string partition 'part=00' stays '00', never becomes the
    long 0 (which renames the directory and collides with '0')."""
    path = str(tmp_path / "s")
    df = spark.createDataFrame(
        [("00", 1), ("00", 2), ("7", 3), ("0", 4)], "part string, v long"
    )
    df.repartition(6).write.partitionBy("part").parquet(path)
    want = {(r["part"], r["v"]) for r in spark.read.parquet(path).collect()}
    compact_parquet(spark, path, partition_cols=["part"])
    dirs = sorted(d for d in os.listdir(path) if d.startswith("part="))
    assert dirs == ["part=0", "part=00", "part=7"]
    got = {(r["part"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == want


def test_compact_rescues_concurrent_append(spark, tmp_path):
    """A file landing between the rewrite's snapshot and the swap must
    never be silently destroyed: the displaced directory is preserved
    as .rescued-* and reported."""
    import glob
    import shutil

    from osm_render_spark.plans import compact as C

    path = str(tmp_path / "r")
    spark.range(0, 5000).repartition(10).write.parquet(path)
    real_swap = C.atomic_dir_swap

    def racing_swap(p, tmp, expected_census=None):
        # simulate a concurrent append committing just before the swap
        extra_src = str(tmp_path / "extra")
        spark.range(9_000_000, 9_000_100).coalesce(1).write.parquet(extra_src)
        pq = glob.glob(f"{extra_src}/*.parquet")[0]
        shutil.copy(pq, os.path.join(p, "late-append.parquet"))
        return real_swap(p, tmp, expected_census)

    C.atomic_dir_swap = racing_swap
    try:
        stats = C.compact_parquet(spark, path, target_mb=128)
    finally:
        C.atomic_dir_swap = real_swap
    assert stats["rescued_old"] is not None
    assert os.path.isdir(stats["rescued_old"])
    # the racing writer's file survives inside the rescued copy
    assert any(
        f == "late-append.parquet" for f in os.listdir(stats["rescued_old"])
    )


def test_compact_manifest_backed_table(spark, tmp_path):
    """Review regression: a plain rewrite would silently destroy the
    _manifest sidecar (Spark's reader skips underscore dirs, the swap
    deletes the only copy). Manifest-backed tables refuse without
    manifest_cell_col; with it the rewrite goes through write_dataset,
    the fresh manifest describes the NEW files, and pruned reads stay
    exact."""
    import pytest as _pytest

    from osm_render_spark.functions.zorder import zorder_write
    from osm_render_spark.sources.manifest import pruned_files, read_pruned

    pts = spark.range(0, 20_000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(256)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256)).alias("y"),
    )
    path = str(tmp_path / "mz")
    zorder_write(pts, path, "x", "y", n_files=40)
    with _pytest.raises(ValueError, match="manifest-backed"):
        compact_parquet(spark, path)
    want = sorted(r["id"] for r in spark.read.parquet(path).collect())
    stats = compact_parquet(spark, path, target_mb=128, manifest_cell_col="_zkey")
    assert stats["after_files"] < stats["before_files"]
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == want
    # the rebuilt manifest matches the new files: a pruned read over the
    # full key range covers everything, and per-file stats exist
    full = read_pruned(spark, path, "_zkey", 0, 1 << 62)
    assert full.count() == len(want)
    files = pruned_files(spark, path, 0, 1 << 62)
    assert 0 < len(files) == stats["after_files"]
