"""Multi-tile slippy renderer: fan-out coverage + per-tile plumbing
equivalence with the single-process kernel."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osm_render_spark.functions.cells import merc_xy
from osm_render_spark.raster.codec import decode_png
from osm_render_spark.raster.ops import render_map_kernel, render_slippy_tiles

ZOOM = 10
TILE_PX = 256


def _ways(spark):
    # a pond spanning several z10 tiles (z10 tile ≈ 0.35° wide) + a bridge
    rows = [
        (
            1,
            "water",
            [(0.1, 0.1), (0.9, 0.1), (0.9, 0.7), (0.1, 0.7), (0.1, 0.1)],
        ),
        (2, "bridge", [(0.0, 0.4), (1.0, 0.4)]),
        (3, "coast", [(-0.2, 0.2), (0.5, 0.3), (1.2, 0.25)]),
    ]
    return spark.createDataFrame(
        [
            (wid, kind, [{"lon": lon, "lat": lat} for lon, lat in pts])
            for wid, kind, pts in rows
        ],
        "way_id long, kind string, geometry array<struct<lon:double,lat:double>>",
    )


def test_fanout_covers_way_bboxes(spark):
    ways = _ways(spark)
    tiles = render_slippy_tiles(ways, ZOOM, TILE_PX).collect()
    got = {(r["tile_x"], r["tile_y"]) for r in tiles}
    # every tile in the pond's bbox must be rendered
    n = 1 << ZOOM
    x0, y0 = merc_xy(np.array([0.1]), np.array([0.7]), ZOOM)
    x1, y1 = merc_xy(np.array([0.9]), np.array([0.1]), ZOOM)
    for tx in range(int(x0[0]), int(x1[0]) + 1):
        for ty in range(int(y0[0]), int(y1[0]) + 1):
            assert (tx, ty) in got
    assert all(0 <= tx < n and 0 <= ty < n for tx, ty in got)


def test_tiles_match_single_process_render(spark):
    ways = _ways(spark)
    n = 1 << ZOOM
    # reproduce the fan-out + local projection single-process
    rows = ways.collect()
    per_tile: dict[tuple[int, int], list] = {}
    for r in rows:
        lons = np.array([p["lon"] for p in r["geometry"]])
        lats = np.array([p["lat"] for p in r["geometry"]])
        mx, my = merc_xy(lons, lats, ZOOM)
        tx0, tx1 = int(np.clip(np.floor(mx.min()), 0, n - 1)), int(
            np.clip(np.floor(mx.max()), 0, n - 1)
        )
        ty0, ty1 = int(np.clip(np.floor(my.min()), 0, n - 1)), int(
            np.clip(np.floor(my.max()), 0, n - 1)
        )
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                per_tile.setdefault((tx, ty), []).append(
                    (r["way_id"], r["kind"], (mx - tx) * TILE_PX, (my - ty) * TILE_PX)
                )
    spark_tiles = {
        (r["tile_x"], r["tile_y"]): decode_png(r["bytes"])
        for r in render_slippy_tiles(ways, ZOOM, TILE_PX).collect()
    }
    assert set(spark_tiles) == set(per_tile)
    for key, feats in per_tile.items():
        pdf = pd.DataFrame(
            [(w, k, list(xs), list(ys)) for w, k, xs, ys in feats],
            columns=["way_id", "kind", "xs", "ys"],
        )
        want = render_map_kernel(pdf, TILE_PX, TILE_PX)
        assert (spark_tiles[key] == want).all(), f"tile {key} differs"
