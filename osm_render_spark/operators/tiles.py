"""Tile-grid assignment + the flagship tile join.

Generalizes the reference's single-scene projection (P8/P9,
OsmRender.m:382-387,441) to the distributed setting: every z/x/y
Web-Mercator tile is an independent render box; assigning a feature to its
tile(s) is a narrow (shuffle-free) columnar map, and the subsequent
per-tile join/aggregation shuffles exactly once on ``tile_key``.

Scale notes (100 TB): tile assignment is embarrassingly parallel and
stays inside whole-stage codegen (pure Column arithmetic — no UDF). The
per-tile join shuffles both sides on tile_key; hot urban tiles are the
skew risk, handled by (a) AQE skew-join splitting (on in session.py) and
(b) optional explicit salting via ``salt_buckets``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.projection import tile_key_col, tile_x_col, tile_y_col


def assign_tiles(
    df: DataFrame, lon: str, lat: str, zoom: int, key_name: str = "tile_key"
) -> DataFrame:
    """Add tile_x / tile_y / tile_key columns at ``zoom``."""
    return (
        df.withColumn("tile_x", tile_x_col(lon, zoom))
        .withColumn("tile_y", tile_y_col(lat, zoom))
        .withColumn(key_name, tile_key_col(lon, lat, zoom))
    )


def salted(df: DataFrame, key: str, salt_buckets: int, salt_name: str = "salt") -> DataFrame:
    """Deterministic salt for hot keys: salt = pmod(hash(row-identity), B).

    Used to split a dense urban tile across B reducers; the aggregation
    then runs in two phases (per-(key,salt) partial, then per-key final).
    """
    return df.withColumn(
        salt_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )


def tile_counts(points: DataFrame, zoom: int, salt_buckets: int = 0) -> DataFrame:
    """Count features per tile — two-phase when salted (skew-safe)."""
    t = assign_tiles(points, "lon", "lat", zoom)
    if salt_buckets > 1:
        t = salted(t, "tile_key", salt_buckets)
        partial = t.groupBy("tile_key", "salt").agg(F.count("*").alias("n_part"))
        return partial.groupBy("tile_key").agg(F.sum("n_part").alias("n"))
    return t.groupBy("tile_key").agg(F.count("*").alias("n"))
