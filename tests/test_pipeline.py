"""End-to-end scene pipeline with checkpoints: scene → join → render →
sprites → atlas, rerun = full cache hit."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from osm_render_spark.fixtures.osm import ALL_SCENES
from osm_render_spark.pipeline import render_scene_pipeline
from osm_render_spark.plans.checkpoint import CheckpointStore


@pytest.fixture()
def store():
    d = tempfile.mkdtemp(prefix="pipe_")
    yield CheckpointStore(d)
    shutil.rmtree(d, ignore_errors=True)


def _areas(spark):
    return spark.createDataFrame(
        [
            (0, 0, [(8.05, 50.05), (8.10, 50.05), (8.10, 50.10), (8.05, 50.10)]),
            (0, 1, [(8.12, 50.12), (8.18, 50.12), (8.15, 50.18)]),
        ],
        "scene_id long, area_id long, polygon array<struct<lon:double,lat:double>>",
    )


def test_pipeline_end_to_end_and_resume(spark, store):
    from osm_render_spark.raster.codec import decode_png

    scene = ALL_SCENES["bridges"]()
    out = render_scene_pipeline(spark, scene, _areas(spark), store)

    assert out["ways"].count() == 3  # ways 20, 21, 22 (23 is the decoy)
    tiles = out["tiles"].collect()
    assert len(tiles) == 1 and decode_png(tiles[0]["bytes"]).shape == (396, 396, 4)
    sprites = out["sprites"].collect()
    assert {(s["area_id"], s["mode"]) for s in sprites} == {
        (0, "hover"), (0, "active"), (1, "hover"), (1, "active"),
    }
    atlas = out["atlas"].collect()
    assert atlas[0]["n_sprites"] == 4

    # resume: mtimes of every stage dir unchanged on rerun (pure cache hit)
    def tree_mtimes(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                out[p] = os.path.getmtime(p)
        return out

    before = tree_mtimes(store.root)
    out2 = render_scene_pipeline(spark, scene, _areas(spark), store)
    assert tree_mtimes(store.root) == before
    assert out2["atlas"].collect()[0]["n_sprites"] == 4


def test_pipeline_changed_areas_recompute(spark, store):
    """S10 stale-cache hazard: a changed AREAS input must change the
    sprite stage key — never serve the old sprites."""
    scene = ALL_SCENES["bridges"]()
    out1 = render_scene_pipeline(spark, scene, _areas(spark), store)
    assert out1["sprites"].count() == 4
    other_areas = spark.createDataFrame(
        [(0, 0, [(8.02, 50.02), (8.04, 50.02), (8.03, 50.04)])],
        "scene_id long, area_id long, polygon array<struct<lon:double,lat:double>>",
    )
    out2 = render_scene_pipeline(spark, scene, other_areas, store)
    assert out2["sprites"].count() == 2  # one area × two modes, recomputed


def test_project_ways_additive_kinds(spark):
    """Kind classification mirrors the reference's INDEPENDENT render
    passes: bridge∧water and coast∧water ways emit one row per matching
    pass (OsmRender.m:508-517 re-scans ALL ways with OsmIsWater)."""
    from pyspark.sql import functions as F

    from osm_render_spark.pipeline import project_ways

    rows = [
        (1, {"bridge": "yes", "natural": "water"}),     # water + bridge
        (2, {"natural": "coastline", "waterway": "riverbank"}),  # coast + water
        (3, {"bridge": "yes"}),                          # bridge only
        (4, {"natural": "coastline"}),                   # coast only
        (5, {"highway": "x"}),                           # legacy default water
    ]
    df = spark.createDataFrame(
        [(i, t, [{"lon": 0.5, "lat": 0.5}]) for i, t in rows],
        "way_id long, tags map<string,string>, "
        "geometry array<struct<lon: double, lat: double>>",
    )
    out = project_ways(df, (0.0, 0.0, 1.0, 1.0), 10, 10)
    kinds = {}
    for r in out.collect():
        kinds.setdefault(r["way_id"], set()).add(r["kind"])
    assert kinds == {
        1: {"water", "bridge"},
        2: {"water", "coast"},
        3: {"bridge"},
        4: {"coast"},
        5: {"water"},
    }
