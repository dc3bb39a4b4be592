"""Density heatmap tiles: planted grids, clamping, digest linearity,
and equivalence with a single-process numpy reference."""

from __future__ import annotations

import numpy as np

from osm_render_spark.functions.cells import merc_xy
from osm_render_spark.raster.codec import decode_png
from osm_render_spark.raster.heatmap import density_tiles

ZOOM = 3
TILE_PX = 16


def _df(spark, pts):
    return spark.createDataFrame(pts, "lon double, lat double")


def test_planted_points_land_in_expected_pixels(spark):
    # three points in tile (4,3) at z3 (lon/lat around 0..45 range),
    # two of them in the same pixel bin
    n = 1 << ZOOM
    # pick mercator positions directly: tile 4, fractional offsets
    def lonlat(mx, my):
        lon = mx / n * 360.0 - 180.0
        lat = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * my / n))))
        return float(lon), float(lat)

    p_a = lonlat(4 + 2.5 / TILE_PX, 3 + 5.5 / TILE_PX)  # pixel (2,5)
    p_b = lonlat(4 + 2.5 / TILE_PX, 3 + 5.6 / TILE_PX)  # pixel (2,5) too
    p_c = lonlat(4 + 9.5 / TILE_PX, 3 + 0.5 / TILE_PX)  # pixel (9,0)
    rows = density_tiles(
        _df(spark, [p_a, p_b, p_c]), ZOOM, TILE_PX
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["tile_x"], r["tile_y"]) == (4, 3)
    assert r["n_points"] == 3 and r["max_bin"] == 2
    assert r["pix_digest"] == 2 * (2 * TILE_PX + 5) + (9 * TILE_PX + 0)
    img = decode_png(r["bytes"])[:, :, 0]
    assert img.shape == (TILE_PX, TILE_PX)
    assert img[5, 2] == 255  # count 2 / max 2
    assert img[0, 9] == 128  # floor(255*1/2 + 0.5)
    assert img.sum() == 255 + 128


def test_pole_clamp_bins_into_last_row(spark):
    rows = density_tiles(
        _df(spark, [(0.0, 89.9), (0.0, -89.9)]), 0, TILE_PX
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    img = decode_png(r["bytes"])[:, :, 0]
    assert img[0, TILE_PX // 2] > 0  # north pole → top row
    assert img[TILE_PX - 1, TILE_PX // 2] > 0  # south pole → bottom row


def test_matches_single_process_reference(spark):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-170, 170, 2000)
    lat = rng.uniform(-80, 80, 2000)
    pts = [(float(a), float(b)) for a, b in zip(lon, lat)]
    got = {
        (r["tile_x"], r["tile_y"]): r
        for r in density_tiles(_df(spark, pts), ZOOM, TILE_PX).collect()
    }
    # independent reference: numpy end-to-end
    n = 1 << ZOOM
    mx, my = merc_xy(lon, lat, ZOOM)
    tx = np.clip(np.floor(mx), 0, n - 1).astype(np.int64)
    ty = np.clip(np.floor(my), 0, n - 1).astype(np.int64)
    px = np.clip(np.floor((mx - tx) * TILE_PX), 0, TILE_PX - 1).astype(np.int64)
    py = np.clip(np.floor((my - ty) * TILE_PX), 0, TILE_PX - 1).astype(np.int64)
    ref: dict = {}
    for a, b, c, d in zip(tx, ty, px, py):
        grid = ref.setdefault((a, b), np.zeros((TILE_PX, TILE_PX), np.int64))
        grid[d, c] += 1
    assert set(got) == set(ref)
    for key, grid in ref.items():
        r = got[key]
        assert r["n_points"] == int(grid.sum())
        assert r["max_bin"] == int(grid.max())
        # digest: bin index is px*TILE_PX + py
        idx = np.arange(TILE_PX)
        bin_idx = idx[None, :] * TILE_PX + idx[:, None]  # [py, px] layout
        assert r["pix_digest"] == int((grid * bin_idx).sum())
        want = (
            (grid.astype(np.float64) * 255.0 / grid.max() + 0.5)
            .astype(np.int64)
            .clip(0, 255)
            .astype(np.uint8)
        )
        assert np.array_equal(decode_png(r["bytes"])[:, :, 0], want), key
