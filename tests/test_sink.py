"""Tile-tree / sprite-file sinks: executor-side PNG writes + manifest
(the reference's actual output shape, F11 naming)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _tiles(spark):
    from osm_render_spark.raster.ops import render_slippy_tiles

    ways = spark.createDataFrame(
        [
            (1, "water", [{"lon": 0.1, "lat": 0.1}, {"lon": 0.4, "lat": 0.1},
                          {"lon": 0.4, "lat": 0.4}, {"lon": 0.1, "lat": 0.4},
                          {"lon": 0.1, "lat": 0.1}]),
            (2, "water", [{"lon": 20.1, "lat": 10.1}, {"lon": 20.3, "lat": 10.1},
                          {"lon": 20.3, "lat": 10.3}, {"lon": 20.1, "lat": 10.3},
                          {"lon": 20.1, "lat": 10.1}]),
        ],
        "way_id long, kind string, geometry array<struct<lon: double, lat: double>>",
    )
    return render_slippy_tiles(ways, zoom=6, tile_px=64)


def test_write_tile_tree_files_and_manifest(spark, tmp_path):
    from osm_render_spark.raster.codec import decode_png
    from osm_render_spark.raster.sink import write_tile_tree

    out = str(tmp_path / "tree")
    tiles = _tiles(spark)
    manifest = write_tile_tree(tiles, out, zoom=6).collect()
    assert len(manifest) >= 2
    for r in manifest:
        assert os.path.exists(r["path"])
        assert r["path"].startswith(os.path.join(out, "z6"))
        assert os.path.getsize(r["path"]) == r["n_bytes"]
        img = decode_png(open(r["path"], "rb").read())
        assert img.shape == (64, 64, 4)
    # no temp leftovers (atomic rename)
    for root, _d, files in os.walk(out):
        assert not [f for f in files if f.endswith(".tmp")]
    # idempotent rerun: same files, same sizes
    again = {r["path"]: r["n_bytes"] for r in write_tile_tree(_tiles(spark), out, 6).collect()}
    assert again == {r["path"]: r["n_bytes"] for r in manifest}


def test_write_sprite_files_f11_naming(spark, tmp_path):
    from osm_render_spark.raster.codec import encode_png
    from osm_render_spark.raster.kernels import new_surface
    from osm_render_spark.raster.sink import write_sprite_files

    png = bytearray(encode_png(new_surface(8, 8, (1, 2, 3, 255))))
    sprites = spark.createDataFrame(
        [(0, 7, "callout", png), (0, 12, "hover", png), (0, 107, "hover", png)],
        "scene_id long, area_id long, mode string, sprite binary",
    )
    rows = {os.path.basename(r["path"]) for r in
            write_sprite_files(sprites, str(tmp_path)).collect()}
    assert rows == {"scene0-07-callout.png", "scene0-12-hover.png",
                "scene0-107-hover.png"}  # >= 100: padded, NEVER truncated
    for f in rows:
        assert os.path.exists(os.path.join(str(tmp_path), f))
