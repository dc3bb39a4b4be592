"""File-manifest pruning (S4/S6 Iceberg-manifest analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_render_spark.sources.manifest import pruned_files, read_pruned, write_dataset


def test_manifest_prunes_files_and_preserves_results(spark, tmp_path):
    path = str(tmp_path / "cells")
    df = spark.range(20000).select(
        F.col("id"), (F.col("id") % 1024).alias("cell"), (F.col("id") * 3).alias("v")
    )
    write_dataset(df, path, "cell", n_files=16)

    all_files = pruned_files(spark, path, 0, 1023)
    some_files = pruned_files(spark, path, 100, 160)
    assert len(all_files) == 16
    assert 0 < len(some_files) < len(all_files), "range query must skip files"

    got = {
        (r["id"], r["v"])
        for r in read_pruned(spark, path, "cell", 100, 160).collect()
    }
    want = {
        (r["id"], r["v"])
        for r in df.where((F.col("cell") >= 100) & (F.col("cell") <= 160)).collect()
    }
    assert got == want


def test_manifest_empty_range(spark, tmp_path):
    path = str(tmp_path / "cells2")
    df = spark.range(100).select(F.col("id"), (F.col("id") % 8).alias("cell"))
    write_dataset(df, path, "cell", n_files=4)
    assert read_pruned(spark, path, "cell", 1000, 2000).count() == 0
