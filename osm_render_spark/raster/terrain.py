"""Terrain derivatives over tiled DEM rasters — Horn gradients, slope,
aspect, hillshade — as a DISTRIBUTED tile operator with perimeter-sized
halo exchange.

Reference semantics: the slippy pipeline renders per-tile rasters from
per-tile inputs (OsmRenderTileSet.m:54-96 draws each tile independently);
terrain shading is the raster analog that NEEDS cross-tile pixels — each
output pixel reads a 3×3 neighborhood, so tile borders require the
adjacent tiles' edge rows/columns.  The naive distributed shapes are
both wrong at 100 TB: shipping every tile to all 8 neighbors multiplies
shuffle volume 9×, and gathering the whole raster per executor is a
broadcast of the world.  This module exchanges ONLY the 1-pixel border
strips (perimeter-sized: ~tile_px·4 bytes per edge vs tile_px²·4 per
tile, a 32× shuffle saving at 64px tiles and 128× at 256px), then each
tile computes alone:

  stage 1 (narrow mapInPandas): every tile emits its full core to
    itself plus 8 border parts addressed to its neighbors;
  stage 2 (ONE exchange, groupBy tile + applyInPandas): assemble the
    (tile_px+2)² padded array, replicate edges where a neighbor is
    absent (= global clamp-to-edge), run the numpy kernel on the core.

Missing-neighbor replication makes the distributed result IDENTICAL to
computing Horn on the full mosaic with clamped borders — pinned by the
geotiff_terrain_stats oracle (DuckDB recomputes the closed-form DEM and
clamped Horn sums independently) and tests/test_terrain.py (tiled ==
whole-array on random mosaics).

Horn 1981 convention used everywhere (incl. the oracle SQL):
  gx = (z[NE]+2z[E]+z[SE]) - (z[NW]+2z[W]+z[SW])   (east minus west)
  gy = (z[SW]+2z[S]+z[SE]) - (z[NW]+2z[N]+z[NE])   (south minus north)
with x growing east (columns) and y growing south (rows) — integer-exact
on integer DEMs.  dz/dx = gx/(8·cellsize).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_I32 = np.dtype("<i4")


# -------------------------------------------------------- numpy kernels

def horn_gradients(padded: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(gx, gy) int64 for the CORE of a 1-pixel-padded array."""
    z = padded.astype(np.int64)
    nw, n_, ne = z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:]
    w_, e_ = z[1:-1, :-2], z[1:-1, 2:]
    sw, s_, se = z[2:, :-2], z[2:, 1:-1], z[2:, 2:]
    gx = (ne + 2 * e_ + se) - (nw + 2 * w_ + sw)
    gy = (sw + 2 * s_ + se) - (nw + 2 * n_ + ne)
    return gx, gy


def pad_clamp(dem: np.ndarray) -> np.ndarray:
    """1-pixel clamp-to-edge padding (the single-array reference for
    what the distributed halo exchange reconstructs)."""
    return np.pad(dem, 1, mode="edge")


def hillshade(
    padded: np.ndarray,
    *,
    cellsize: float = 30.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
) -> np.ndarray:
    """Standard Horn hillshade (the ESRI/GDAL formula), uint8 in 0..255,
    over the core of a padded tile.  Float path — pinned by property
    tests + goldens, not the SQL oracle (transcendental)."""
    gx, gy = horn_gradients(padded)
    dzdx = gx.astype(np.float64) * (z_factor / (8.0 * cellsize))
    dzdy = gy.astype(np.float64) * (z_factor / (8.0 * cellsize))
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(360.0 - azimuth_deg + 90.0)
    hs = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(
        az - aspect
    )
    # engine-wide floor(x+0.5) rounding (F6)
    return np.clip(np.floor(255.0 * hs + 0.5), 0, 255).astype(np.uint8)


def slope_aspect_octant(padded: np.ndarray, cellsize: int = 1):
    """(slope_milli, octant) integer derivatives: slope_milli =
    floor(1000·√(gx²+gy²))/(8·cellsize) done in integer space as
    isqrt(10⁶·(gx²+gy²))//(8·cellsize); octant = 0..7 by atan2 octant of
    (gy, gx), 8 for flat — engine-independent integers for oracles."""
    gx, gy = horn_gradients(padded)
    mag2 = gx * gx + gy * gy
    slope_milli = np.array(
        [math.isqrt(int(v) * 1_000_000) for v in mag2.ravel()], dtype=np.int64
    ).reshape(mag2.shape) // (8 * cellsize)
    ax, ay = np.abs(gx), np.abs(gy)
    octant = np.full(gx.shape, 8, dtype=np.int64)
    nz = mag2 > 0
    # octants counter-clockwise from east, ties to the lower octant
    o = np.where(
        ay <= ax,
        np.where(gx >= 0, np.where(gy >= 0, 0, 7), np.where(gy >= 0, 3, 4)),
        np.where(gy >= 0, np.where(gx >= 0, 1, 2), np.where(gx >= 0, 6, 5)),
    )
    octant[nz] = o[nz]
    return slope_milli, octant


# ------------------------------------------------- distributed operator

def _halo_parts(pdf_iter: Iterator[pd.DataFrame], tile_px: int, keyed: bool):
    """Stage 1: core to self + perimeter strips to the 8 neighbors.
    dx,dy are the part's position in the RECEIVER's frame."""
    for pdf in pdf_iter:
        rows = []
        keys = pdf["raster"] if keyed else [""] * len(pdf)
        for k, tx, ty, blob in zip(keys, pdf["tx"], pdf["ty"], pdf["dem"]):
            a = np.frombuffer(blob, dtype=_I32).reshape(tile_px, tile_px)
            tx, ty = int(tx), int(ty)
            rows.append((k, tx, ty, 0, 0, blob))
            # edges: receiver at (tx+ox, ty+oy) sees this strip at (-ox,-oy)
            rows.append((k, tx + 1, ty, -1, 0, a[:, -1].tobytes()))
            rows.append((k, tx - 1, ty, 1, 0, a[:, 0].tobytes()))
            rows.append((k, tx, ty + 1, 0, -1, a[-1, :].tobytes()))
            rows.append((k, tx, ty - 1, 0, 1, a[0, :].tobytes()))
            rows.append((k, tx + 1, ty + 1, -1, -1, a[-1:, -1].tobytes()))
            rows.append((k, tx - 1, ty + 1, 1, -1, a[-1:, 0].tobytes()))
            rows.append((k, tx + 1, ty - 1, -1, 1, a[:1, -1].tobytes()))
            rows.append((k, tx - 1, ty - 1, 1, 1, a[:1, 0].tobytes()))
        yield pd.DataFrame(
            rows, columns=["raster", "tx", "ty", "dx", "dy", "part"]
        )


def _assemble(group: pd.DataFrame, tile_px: int) -> np.ndarray | None:
    """Padded (tile_px+2)² array from a tile's core + neighbor strips;
    absent neighbors replicate the nearest filled edge (global clamp).
    None when the group is halo-only (an address off the tile grid)."""
    parts = {(int(r.dx), int(r.dy)): r.part for r in group.itertuples()}
    if (0, 0) not in parts:
        return None
    core = np.frombuffer(parts[0, 0], dtype=_I32).reshape(tile_px, tile_px)
    p = np.empty((tile_px + 2, tile_px + 2), dtype=np.int64)
    p[1:-1, 1:-1] = core
    has_w = (-1, 0) in parts
    has_e = (1, 0) in parts
    has_n = (0, -1) in parts
    has_s = (0, 1) in parts
    p[1:-1, 0] = (
        np.frombuffer(parts[-1, 0], dtype=_I32) if has_w else core[:, 0]
    )
    p[1:-1, -1] = (
        np.frombuffer(parts[1, 0], dtype=_I32) if has_e else core[:, -1]
    )
    p[0, 1:-1] = (
        np.frombuffer(parts[0, -1], dtype=_I32) if has_n else core[0, :]
    )
    p[-1, 1:-1] = (
        np.frombuffer(parts[0, 1], dtype=_I32) if has_s else core[-1, :]
    )

    def corner(dx: int, dy: int, row: int, col: int) -> int:
        if (dx, dy) in parts:
            return int(np.frombuffer(parts[dx, dy], dtype=_I32)[0])
        # clamp: prefer the filled vertical edge, then horizontal, then core
        if (0, dy) in parts:
            return int(p[row, 1 if col == 0 else -2])
        if (dx, 0) in parts:
            return int(p[1 if row == 0 else -2, col])
        return int(p[1 if row == 0 else -2, 1 if col == 0 else -2])

    p[0, 0] = corner(-1, -1, 0, 0)
    p[0, -1] = corner(1, -1, 0, -1)
    p[-1, 0] = corner(-1, 1, -1, 0)
    p[-1, -1] = corner(1, 1, -1, -1)
    return p


def terrain_tiles(
    tiles: DataFrame,
    tile_px: int,
    *,
    mode: str = "hillshade",
    cellsize: float = 30.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    raster_col: str | None = None,
) -> DataFrame:
    """Distributed terrain derivative over a DEM tile grid.

    tiles: (tx int, ty int, dem binary) — little-endian int32,
    tile_px×tile_px row-major.  ``raster_col`` names an optional raster
    id column so a multi-file mosaic keeps per-raster grids (halo never
    crosses rasters; each raster clamps at its own edges).

    mode='hillshade' → (tx, ty, shade binary u8 tile)
    mode='gradient_stats' → (tx, ty, sum_z, sum_abs_gx, sum_abs_gy)
      — integer-exact Horn sums, the oracle surface.

    Plan: narrow part fan-out, then ONE exchange (groupBy tile key)."""
    if mode not in ("hillshade", "gradient_stats"):
        raise ValueError(f"unknown mode {mode!r}")
    keyed = raster_col is not None
    src = (
        tiles.withColumnRenamed(raster_col, "raster")
        if keyed and raster_col != "raster"
        else tiles
    )

    import pyspark.sql.functions as F

    from .ops import buffered_group_map

    parts = src.mapInPandas(
        lambda it: _halo_parts(it, tile_px, keyed),
        schema="raster string, tx long, ty long, dx int, dy int, part binary",
    ).withColumn("gkey", F.concat_ws(":", "raster", "tx", "ty"))
    key_sel = (["raster"] if keyed else []) + ["tx", "ty"]

    # buffered_group_map (many tiles per Arrow batch) instead of one
    # applyInPandas call per tile: per-group Python overhead is ~4 ms,
    # which at a million tiles would dwarf the numpy kernel
    if mode == "hillshade":
        cols = ["raster", "tx", "ty", "shade"]
        schema = "raster string, tx long, ty long, shade binary"

        def render_group(g: pd.DataFrame):
            p = _assemble(g, tile_px)
            r = g.iloc[0]
            if p is None:  # halo-only address off the grid → dropped below
                return (r["raster"], int(r["tx"]), int(r["ty"]), None)
            hs = hillshade(
                p,
                cellsize=cellsize,
                azimuth_deg=azimuth_deg,
                altitude_deg=altitude_deg,
            )
            return (r["raster"], int(r["tx"]), int(r["ty"]), hs.tobytes())

        out = buffered_group_map(parts, "gkey", render_group, cols, schema)
        return out.where(F.col("shade").isNotNull()).select(*key_sel, "shade")

    cols = ["raster", "tx", "ty", "sum_z", "sum_abs_gx", "sum_abs_gy"]
    schema = (
        "raster string, tx long, ty long, "
        "sum_z long, sum_abs_gx long, sum_abs_gy long"
    )

    def render_group(g: pd.DataFrame):
        p = _assemble(g, tile_px)
        r = g.iloc[0]
        if p is None:
            return (r["raster"], int(r["tx"]), int(r["ty"]), None, None, None)
        gx, gy = horn_gradients(p)
        core = p[1:-1, 1:-1]
        return (
            r["raster"], int(r["tx"]), int(r["ty"]),
            int(core.sum()), int(np.abs(gx).sum()), int(np.abs(gy).sum()),
        )

    out = buffered_group_map(parts, "gkey", render_group, cols, schema)
    return out.where(F.col("sum_z").isNotNull()).select(
        *key_sel, "sum_z", "sum_abs_gx", "sum_abs_gy"
    )


def dem_to_tiles(dem: np.ndarray, tile_px: int) -> list[tuple[int, int, bytes]]:
    """Split a full DEM (h,w multiples of tile_px) into operator rows —
    driver-side fixture helper; the distributed source is
    sources.geotiff_source.read_geotiff_tiles."""
    h, w = dem.shape
    if h % tile_px or w % tile_px:
        raise ValueError("DEM dims must be multiples of tile_px")
    a = np.ascontiguousarray(dem, dtype=_I32)
    return [
        (x0 // tile_px, y0 // tile_px,
         a[y0 : y0 + tile_px, x0 : x0 + tile_px].tobytes())
        for y0 in range(0, h, tile_px)
        for x0 in range(0, w, tile_px)
    ]
