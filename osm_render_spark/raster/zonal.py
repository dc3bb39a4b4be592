"""Zonal statistics — the raster↔vector aggregate join (SURVEY J9's
analytical twin): per-polygon aggregates of raster values, computed
tile-by-tile with the SAME even-odd pixel-center coverage kernel as
polygon fill and PIP (kernels._coverage_mask — one rasterization
semantics engine-wide, CLAUDE.md raster-determinism rule).

100 TB shape: polygons fan out to the DEM tiles their bbox overlaps
(bbox tile count, not world size), the equi-join on the tile key
co-locates each (polygon, tile) pair, the Arrow kernel masks ONE tile
at a time (executor memory bounded by tile_px², never polygon area),
and per-polygon partial sums reduce map-side in the final groupBy.  A
polygon spanning 10⁴ tiles is 10⁴ independent kernel rows, not one
giant rasterization.

Coordinates are non-negative global pixels (the P8 projection plane);
a pixel belongs to a polygon iff its CENTER (x+0.5, y+0.5) has odd
crossing parity — integer vertices therefore never produce on-edge
ambiguity, which is what makes the DuckDB rectangle oracle exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .kernels import _coverage_mask

_I32 = np.dtype("<i4")


def zonal_stats(
    polygons: DataFrame,
    dem_tiles: DataFrame,
    tile_px: int,
    *,
    raster_col: str | None = None,
) -> DataFrame:
    """polygons (poly_id[, raster], xs array<bigint>, ys array<bigint>)
    × dem_tiles ([raster,] tx, ty, dem binary int32) →
    (poly_id, n_px, sum_z) summed over every covered pixel center."""
    keyed = raster_col is not None
    key = (["raster"] if keyed else []) + ["tx", "ty"]
    polys = (
        polygons.withColumnRenamed(raster_col, "raster")
        if keyed and raster_col != "raster"
        else polygons
    )
    tiles = (
        dem_tiles.withColumnRenamed(raster_col, "raster")
        if keyed and raster_col != "raster"
        else dem_tiles
    )

    cover = polys.selectExpr(
        "poly_id",
        *(["raster"] if keyed else []),
        "xs",
        "ys",
        f"explode(sequence(greatest(array_min(xs) - 1, 0) DIV {tile_px},"
        f" (array_max(xs) + 1) DIV {tile_px})) AS tx",
        f"sequence(greatest(array_min(ys) - 1, 0) DIV {tile_px},"
        f" (array_max(ys) + 1) DIV {tile_px}) AS tys",
    ).selectExpr(
        "poly_id", *(["raster"] if keyed else []), "xs", "ys", "tx",
        "explode(tys) AS ty",
    )

    joined = cover.join(tiles, key)

    def kernel(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                xs = np.asarray(r.xs, dtype=np.float64) - r.tx * tile_px
                ys = np.asarray(r.ys, dtype=np.float64) - r.ty * tile_px
                mask = _coverage_mask(
                    tile_px, tile_px, [np.column_stack([xs, ys])]
                )
                if not mask.any():
                    continue
                dem = np.frombuffer(r.dem, dtype=_I32).reshape(
                    tile_px, tile_px
                )
                rows.append(
                    (int(r.poly_id), int(mask.sum()),
                     int(dem[mask].astype(np.int64).sum()))
                )
            yield pd.DataFrame(rows, columns=["poly_id", "n_px", "sum_z"])

    partials = joined.mapInPandas(
        kernel, schema="poly_id long, n_px long, sum_z long"
    )
    from pyspark.sql import functions as F

    return partials.groupBy("poly_id").agg(
        F.sum("n_px").alias("n_px"), F.sum("sum_z").alias("sum_z")
    )
