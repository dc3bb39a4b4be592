"""Co-partitioned raster↔vector overlay (J9) + landmark/icon annotation."""

from __future__ import annotations

import numpy as np

from osm_render_spark.raster.codec import decode_png, encode_png
from osm_render_spark.raster.kernels import new_surface
from osm_render_spark.raster.ops import WATER_COLOR, annotate_tiles, overlay_tiles


def _tile_rows(spark, n=4, size=64):
    rows = []
    for t in range(n):
        surf = new_surface(size, size, (200, 200, 200, 255))
        rows.append((t, bytearray(encode_png(surf)), "png"))
    return spark.createDataFrame(rows, "tile_key long, bytes binary, fmt string")


def test_overlay_cogroup_renders_per_tile(spark):
    tiles = _tile_rows(spark)
    feats = spark.createDataFrame(
        [
            (0, 0, "poly", [10.0, 50.0, 50.0, 10.0], [10.0, 10.0, 50.0, 50.0]),
            (1, 1, "line", [0.0, 63.0], [32.0, 32.0]),
            (1, 2, "erase", [32.0, 32.0], [0.0, 63.0]),
            # tile 5 has no tile row — dropped
            (5, 3, "poly", [1.0, 2.0, 1.5], [1.0, 1.0, 2.0]),
        ],
        "tile_key long, feature_id long, kind string, xs array<double>, ys array<double>",
    )
    out = {r["tile_key"]: decode_png(r["bytes"]) for r in overlay_tiles(tiles, feats).collect()}
    assert set(out) == {0, 1, 2, 3}
    # tile 0: water polygon filled
    assert (out[0][30, 30] == np.array(WATER_COLOR)).all()
    assert (out[0][60, 60] == (200, 200, 200, 255)).all()
    # tile 1: horizontal stroke drawn, then vertical erase cut through it
    assert (out[1][32, 10] == (20, 20, 20, 255)).all()
    assert (out[1][10, 32] == (0, 0, 0, 0)).all()  # erased column
    # tiles without features pass through unchanged
    assert (out[2] == (200, 200, 200, 255)).all()


def test_annotate_bullets_park_icon_and_label(spark):
    tiles = spark.createDataFrame(
        [(0, bytearray(encode_png(new_surface(96, 96, (255, 255, 255, 255)))), 96, 96)],
        "scene_id long, bytes binary, w int, h int",
    )
    marks = spark.createDataFrame(
        [
            (0, 0, 16.0, 16.0, "bullet", None),
            (0, 1, 44.0, 44.0, "park", None),
            (0, 2, 48.0, 80.0, "label", "OLD TOWN"),
        ],
        "scene_id long, mark_id long, x double, y double, kind string, label string",
    )
    out = decode_png(annotate_tiles(tiles, marks).collect()[0]["bytes"])
    assert (out[16, 16] == (200, 30, 30, 255)).all()  # bullet disc
    # park icon: green crown pixels near the blit center
    crown_region = out[38:46, 38:52, :3]
    assert (crown_region == np.array([34, 139, 34])).all(axis=2).any()
    # label: dark glyph pixels near its center (R7 engine font)
    label_region = out[72:90, 20:76, :3]
    assert (label_region == np.array([20, 20, 20])).all(axis=2).any()
    # corners untouched
    assert (out[0, 0] == (255, 255, 255, 255)).all()


def test_font_glyphs_and_rounded_rect():
    from osm_render_spark.raster.font import glyph_mask, rounded_rect_mask, text_mask

    a = glyph_mask("A")
    assert a.shape == (7, 5) and a[0, 2] == 255 and a[0, 0] == 0
    multi = text_mask("AB\nC")
    assert multi.shape[0] == 16  # two lines + spacing
    rr = rounded_rect_mask(20, 12, 4)
    assert rr[0, 0] == 0 and rr[6, 10] == 255 and rr[0, 10] == 255


def test_pipeline_callouts(spark, tmp_path):
    from osm_render_spark.fixtures.osm import ALL_SCENES
    from osm_render_spark.pipeline import render_scene_pipeline
    from osm_render_spark.plans.checkpoint import CheckpointStore

    scene = ALL_SCENES["bridges"]()
    areas = spark.createDataFrame(
        [(0, 0, [(8.05, 50.05), (8.10, 50.05), (8.10, 50.10), (8.05, 50.10)])],
        "scene_id long, area_id long, polygon array<struct<lon:double,lat:double>>",
    )
    out = render_scene_pipeline(
        spark, scene, areas, CheckpointStore(str(tmp_path / "ck"))
    )
    callouts = out["callouts"].collect()
    assert len(callouts) == 1
    assert callouts[0]["mode"] == "callout"
    img = decode_png(callouts[0]["sprite"])
    assert img.shape == (290, 290, 4)  # second-resolution render
