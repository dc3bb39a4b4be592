"""Checkpoint / lineage / resume (SURVEY.md S10 + north-rule resumability).

The resume test simulates a killed job by deleting a subset of completed
partition directories, then asserts the rerun recomputes EXACTLY the
missing partitions and the final output is identical.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from osm_render_spark.plans.checkpoint import CheckpointStore, stage_key


@pytest.fixture()
def store():
    d = tempfile.mkdtemp(prefix="ckpt_")
    yield CheckpointStore(d)
    shutil.rmtree(d, ignore_errors=True)


def _tiles(spark, n=1000):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 10).alias("tile"),
        (F.col("id") * 7 % 1000).alias("v"),
    )


def test_stage_memoization_skips_recompute(spark, store):
    calls = []

    def compute():
        calls.append(1)
        return _tiles(spark)

    p = {"zoom": 7, "color": "0xff0000ff"}
    a = store.run_stage(spark, "render", p, compute, partition_col="tile")
    assert a.count() == 1000 and len(calls) == 1
    b = store.run_stage(spark, "render", p, compute, partition_col="tile")
    assert b.count() == 1000 and len(calls) == 1  # cache hit: no recompute
    # different params → different key → recompute (the reference's cache
    # key bug — omitting params — is exactly what this pins against)
    store.run_stage(spark, "render", {**p, "color": "0x00ff00ff"}, compute)
    assert len(calls) == 2


def test_lineage_rows_and_verification(spark, store):
    p = {"zoom": 7}
    store.run_stage(spark, "s1", p, lambda: _tiles(spark), partition_col="tile")
    lin = store.lineage(spark, "s1", p)
    rows = {r["partition_key"]: r for r in lin.collect()}
    assert len(rows) == 10
    assert all(r["row_count"] == 100 for r in rows.values())
    assert store.verify_lineage(spark, "s1", p)


def test_partitioned_resume_recomputes_only_missing(spark, store):
    computed_batches = []

    def compute(missing):
        keys = sorted(r["tile"] for r in missing.collect())
        computed_batches.append(keys)
        return _tiles(spark).join(missing, "tile")

    expected = spark.range(10).select(F.col("id").alias("tile"))
    p = {"stage": "assign"}
    full = store.run_stage_partitioned(
        spark, "assign", p, "tile", expected, compute
    )
    a = {(r["id"], r["v"]) for r in full.collect()}  # materialize pre-kill
    assert len(a) == 1000
    assert computed_batches == [list(range(10))]

    # simulate a kill that lost 3 partitions
    import os

    key = stage_key("assign", p, "")
    path = store._path("assign", key)
    for t in (2, 5, 7):
        shutil.rmtree(os.path.join(path, f"tile={t}"))

    resumed = store.run_stage_partitioned(
        spark, "assign", p, "tile", expected, compute
    )
    assert resumed.count() == 1000
    assert computed_batches[-1] == [2, 5, 7]  # ONLY the missing partitions

    # identical final content
    b = {(r["id"], r["v"]) for r in resumed.collect()}
    assert a == b

    # clean rerun: nothing missing, compute not called again
    n_before = len(computed_batches)
    store.run_stage_partitioned(spark, "assign", p, "tile", expected, compute)
    assert len(computed_batches) == n_before


def test_partitioned_resume_salvages_killed_append(spark, store):
    """A job killed mid-append (task-commit committers) leaves a
    partially-written partition that WOULD pass the naive distinct()
    anti-join; the resume path must checksum-verify against lineage, drop
    the partial partition, and recompute it (ADVICE r1, medium)."""
    import os

    def compute(missing):
        return _tiles(spark).join(missing, "tile")

    expected = spark.range(10).select(F.col("id").alias("tile"))
    p = {"stage": "salvage"}
    full = store.run_stage_partitioned(spark, "salvage", p, "tile", expected, compute)
    a = {(r["id"], r["v"]) for r in full.collect()}

    key = stage_key("salvage", p, "")
    path = store._path("salvage", key)
    # simulate a killed append: partition 3 half-written (drop one file →
    # checksum mismatch), partition 8 has an EXTRA committed-but-orphaned
    # file (duplicate rows), plus a _temporary leftover marking the kill
    t3 = os.path.join(path, "tile=3")
    files3 = sorted(f for f in os.listdir(t3) if f.endswith(".parquet"))
    os.remove(os.path.join(t3, files3[0]))
    t8 = os.path.join(path, "tile=8")
    files8 = sorted(f for f in os.listdir(t8) if f.endswith(".parquet"))
    shutil.copy(
        os.path.join(t8, files8[0]), os.path.join(t8, "part-extra.c000.parquet")
    )
    os.makedirs(os.path.join(path, "_temporary"), exist_ok=True)

    resumed = store.run_stage_partitioned(spark, "salvage", p, "tile", expected, compute)
    b = {(r["id"], r["v"]) for r in resumed.collect()}
    assert a == b  # partials dropped + recomputed, no duplicates
    assert resumed.count() == 1000


def test_partitioned_resume_uncommitted_dir_recomputes(spark, store):
    """A dir with no committed data files (killed before first commit)
    must be treated as absent, not raise 'unable to infer schema'."""
    import os

    def compute(missing):
        return _tiles(spark).join(missing, "tile")

    expected = spark.range(10).select(F.col("id").alias("tile"))
    p = {"stage": "fresh"}
    key = stage_key("fresh", p, "")
    path = store._path("fresh", key)
    os.makedirs(os.path.join(path, "_temporary"), exist_ok=True)  # no data

    out = store.run_stage_partitioned(spark, "fresh", p, "tile", expected, compute)
    assert out.count() == 1000


def test_lineage_detects_corruption(spark, store):
    import os

    p = {"x": 1}
    store.run_stage(spark, "s2", p, lambda: _tiles(spark, 500), partition_col="tile")
    assert store.verify_lineage(spark, "s2", p)
    key = stage_key("s2", p, "")
    path = store._path("s2", key)
    # corrupt: drop one data file
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    os.remove(os.path.join(path, files[0]))
    assert not store.verify_lineage(spark, "s2", p)
