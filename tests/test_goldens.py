"""Engine vs committed golden manifests (FIXTURES.md §7, BASELINE.md
correctness gates): join rows exact, tile assignments exact, kNN exact,
PIP exact, rendered tiles PSNR ≥ 40 dB (bit-exact here, since engine and
oracle share the raster kernels — the PSNR budget exists for the real-
Cairo comparison)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


@pytest.mark.parametrize("scene_name", ["minimal", "coast", "bridges", "relations", "sparse"])
def test_golden_ways(spark, scene_name):
    from osm_render_spark.fixtures.osm import ALL_SCENES
    from osm_render_spark.operators.ways_in_rect import ways_in_rect

    golden = _load("ways.json")[scene_name]
    scene = ALL_SCENES[scene_name]()
    nodes, ways, rels = scene.to_spark(spark)
    got = {
        str(r["way_id"]): (
            [[p["lon"], p["lat"]] for p in r["geometry"]],
            dict(r["tags"]),
        )
        for r in ways_in_rect(nodes, ways, rels, scene.bbox).collect()
    }
    assert set(got) == set(golden)
    for wid, g in golden.items():
        assert got[wid][0] == g["geometry"], f"way {wid} geometry"
        assert got[wid][1] == g["tags"], f"way {wid} tags"


def test_golden_tile_assignments(spark):
    from osm_render_spark.fixtures.osm import ALL_SCENES
    from osm_render_spark.functions.projection import tile_x_col, tile_y_col
    from osm_render_spark.operators.ways_in_rect import ways_in_rect

    golden = _load("tile_assignments.json")
    for scene_name in ("minimal", "coast", "sparse"):
        scene = ALL_SCENES[scene_name]()
        nodes, ways, rels = scene.to_spark(spark)
        res = ways_in_rect(nodes, ways, rels, scene.bbox)
        first = res.select(
            "way_id",
            F.element_at("geometry", 1)["lon"].alias("lon"),
            F.element_at("geometry", 1)["lat"].alias("lat"),
        )
        assigned = first.select(
            "way_id", tile_x_col("lon", 8).alias("x"), tile_y_col("lat", 8).alias("y")
        )
        got = {str(r["way_id"]): (r["x"], r["y"]) for r in assigned.collect()}
        want = {wid: (v["x"], v["y"]) for wid, v in golden[scene_name].items()}
        assert got == want, scene_name


def test_golden_knn(spark):
    from tools.make_goldens import KNN_CANDS, KNN_QUERIES

    from osm_render_spark.operators.knn import knn_join

    golden = {(r["query_id"], r["rank"]): r["cand_id"] for r in _load("knn.json")}
    q = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(KNN_QUERIES)],
        "query_id long, qlon double, qlat double",
    )
    c = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(KNN_CANDS)],
        "cand_id long, lon double, lat double",
    )
    got = {
        (r["query_id"], r["rank"]): r["cand_id"] for r in knn_join(q, c, 3).collect()
    }
    assert got == golden


def test_golden_pip(spark):
    from tools.make_goldens import PIP_POINTS, PIP_POLYS

    from osm_render_spark.operators.pip import POLY_SCHEMA, pip_join

    golden = {(r["point_id"], r["area_id"]) for r in _load("pip.json")}
    points = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(PIP_POINTS)],
        "point_id long, lon double, lat double",
    )
    polys = spark.createDataFrame(
        [(aid, [p[0] for p in poly], [p[1] for p in poly]) for aid, poly in PIP_POLYS.items()],
        POLY_SCHEMA,
    )
    got = {(r["point_id"], r["area_id"]) for r in pip_join(points, polys, zoom=6).collect()}
    assert got == golden


@pytest.mark.parametrize("scene_name", ["minimal", "coast", "bridges"])
def test_golden_tiles_psnr(spark, scene_name):
    from osm_render_spark.fixtures.osm import ALL_SCENES
    from osm_render_spark.operators.ways_in_rect import ways_in_rect
    from osm_render_spark.raster.codec import decode_png, psnr
    from osm_render_spark.raster.ops import render_map_tiles

    scene = ALL_SCENES[scene_name]()
    nodes, ways, rels = scene.to_spark(spark)
    res = ways_in_rect(nodes, ways, rels, scene.bbox)
    lat_min, lon_min, lat_max, lon_max = scene.bbox
    w = h = 396
    proj = res.select(
        F.lit(0).cast("long").alias("scene_id"),
        "way_id",
        F.when(F.map_contains_key("tags", "bridge"), F.lit("bridge"))
        .when(F.element_at("tags", "natural") == "coastline", F.lit("coast"))
        .otherwise(F.lit("water"))
        .alias("kind"),
        F.transform(
            "geometry", lambda p: (p["lon"] - F.lit(lon_min)) * F.lit(w / (lon_max - lon_min))
        ).alias("xs"),
        F.transform(
            "geometry", lambda p: (p["lat"] - F.lit(lat_max)) * F.lit(h / (lat_min - lat_max))
        ).alias("ys"),
    )
    tile = render_map_tiles(proj, w, h).collect()[0]
    got = decode_png(tile["bytes"])
    with open(os.path.join(GOLDEN_DIR, f"tile_{scene_name}.png"), "rb") as f:
        want = decode_png(f.read())
    p = psnr(got, want)
    assert p >= 40.0, f"{scene_name}: PSNR {p:.1f} dB"
    assert (got == want).all(), f"{scene_name}: expected bit-exact match"
