"""Polygon pixel-space metrics: shoelace area, centroid, winding, bbox.

Why this operator exists: the reference culls nothing by size — every
tagged area is rasterized at every scene (OsmRenderMap draw loops,
OsmRender.m:1239-1291), which is affordable for a handful of city
scenes but not for a planet-scale tile pyramid where at z4 most
buildings span less than a thousandth of a pixel. The idiomatic
distributed fix is to compute each ring's *projected pixel area* at
the target zoom/scene and drop sub-pixel features before the render
fan-out, the exact complement of operators/simplify.py (which thins
vertices of the features that survive).

Everything is integer-exact: vertices are first projected with the
engine-wide affine floor(x+0.5) convention (functions/projection.py,
operator P8 — the same transform the render kernel applies), and the
shoelace / centroid accumulations then run entirely in BIGINT, so the
result is bit-identical across Spark, DuckDB, and numpy with no
float-order hazard (CLAUDE.md: double sums are order-dependent).
Magnitudes: pixel coords fit in ~2^21 for any practical scene, cross
products in ~2^43, centroid numerators in ~2^44·n — no overflow for
rings up to ~2^19 vertices.

Spark shape: zero shuffle, zero Python — one projection `transform`,
one `zip_with` against the rotated ring, one `aggregate`, all
whole-stage-codegen expressions. HOF lambdas are interpreted
per-element (CLAUDE.md), but rings are small (vertex counts, not row
counts) and the alternative — posexplode + window + groupBy — costs a
keyed exchange per ring table, which this avoids entirely.

Conventions:
- Open rings are treated as closed: the shoelace includes the wrapping
  edge last→first, so a fixture that repeats the first point as the
  last merely adds a zero cross term. Consistent with the render
  kernel's even-odd fill, which also closes implicitly.
- ``area2`` is TWICE the signed area in px² (the raw shoelace sum,
  kept integral). Pixel space is y-down, which flips the usual sign
  convention: area2 > 0 means the ring winds clockwise on screen
  (counter-clockwise in math coords).
- Centroid numerators are exact integers; ``centroid_px/py`` derive
  from them with a single IEEE division each (deterministic across
  engines). Degenerate rings (area2 = 0) get NULL centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.projection import affine_px_sql, affine_py_sql


def _stats_exprs(
    lon_min: float,
    lon_max: float,
    lat_min: float,
    lat_max: float,
    width: int,
    height: int,
) -> dict[str, str]:
    """SQL expression strings (Spark dialect, HOF form) keyed by output
    column, all over an input column ``geometry: array<struct<lon,lat>>``."""
    px = affine_px_sql("z.lon", lon_min, lon_max, width)
    py = affine_py_sql("z.lat", lat_min, lat_max, height)
    # Integer pixel ring once; every metric reads `pix`.
    pix = f"transform(geometry, z -> struct({px} AS x, {py} AS y))"
    # Rotated ring (p_{i+1 mod n}) so zip_with sees each directed edge,
    # including the closing one. slice is 1-indexed; element_at(.,1) is
    # O(1) (the O(n²) trap in CLAUDE.md is element_at over an inline
    # transform — `pix` is bound once via a named lateral below).
    rot = "concat(slice(pix, 2, size(pix) - 1), array(element_at(pix, 1)))"
    cross = (
        f"zip_with(pix, {rot}, (p, q) -> struct("
        "p.x * q.y - q.x * p.y AS c, "
        "(p.x + q.x) AS sx, (p.y + q.y) AS sy))"
    )
    return {
        "pix": pix,
        "cross": cross,
        "area2": "aggregate(cr, CAST(0 AS BIGINT), (a, e) -> a + e.c)",
        "cxn": "aggregate(cr, CAST(0 AS BIGINT), (a, e) -> a + e.sx * e.c)",
        "cyn": "aggregate(cr, CAST(0 AS BIGINT), (a, e) -> a + e.sy * e.c)",
    }


def polygon_pixel_stats(
    ways: DataFrame,
    lon_min: float,
    lon_max: float,
    lat_min: float,
    lat_max: float,
    width: int,
    height: int,
) -> DataFrame:
    """Per-ring pixel-space metrics for ``ways(way_id, geometry)`` under
    the P8 affine scene projection (lon/lat box → width×height pixels).

    Output: way_id, n_vertices, area2 (BIGINT, 2× signed px² area,
    y-down sign convention), winding ('cw'/'ccw'/'degenerate'),
    centroid_px/centroid_py (DOUBLE, NULL when degenerate), and the
    integer pixel bbox (min_px, min_py, max_px, max_py)."""
    e = _stats_exprs(lon_min, lon_max, lat_min, lat_max, width, height)
    out = (
        ways.withColumn("pix", F.expr(e["pix"]))
        .withColumn("cr", F.expr(e["cross"]))
        .withColumn("area2", F.expr(e["area2"]))
        .withColumn("cxn", F.expr(e["cxn"]))
        .withColumn("cyn", F.expr(e["cyn"]))
    )
    deg = F.col("area2") == F.lit(0)
    return out.select(
        "way_id",
        F.size("geometry").alias("n_vertices"),
        "area2",
        F.when(deg, F.lit("degenerate"))
        .when(F.col("area2") > 0, F.lit("cw"))
        .otherwise(F.lit("ccw"))
        .alias("winding"),
        # Exact integer numerators; one IEEE division each (3·area2
        # denominator is the standard centroid formula's).
        F.when(deg, F.lit(None)).otherwise(
            F.col("cxn").cast("double") / (F.lit(3).cast("bigint") * F.col("area2")).cast("double")
        ).alias("centroid_px"),
        F.when(deg, F.lit(None)).otherwise(
            F.col("cyn").cast("double") / (F.lit(3).cast("bigint") * F.col("area2")).cast("double")
        ).alias("centroid_py"),
        F.expr("aggregate(pix, element_at(pix, 1).x, (a, p) -> least(a, p.x))").alias("min_px"),
        F.expr("aggregate(pix, element_at(pix, 1).y, (a, p) -> least(a, p.y))").alias("min_py"),
        F.expr("aggregate(pix, element_at(pix, 1).x, (a, p) -> greatest(a, p.x))").alias("max_px"),
        F.expr("aggregate(pix, element_at(pix, 1).y, (a, p) -> greatest(a, p.y))").alias("max_py"),
    )


def drop_subpixel_ways(
    ways: DataFrame,
    lon_min: float,
    lon_max: float,
    lat_min: float,
    lat_max: float,
    width: int,
    height: int,
    min_px2: float = 1.0,
) -> DataFrame:
    """Visibility cull: keep only rings whose projected area is at least
    ``min_px2`` square pixels at the given scene scale (|area2| ≥
    2·min_px2 keeps the comparison integral for integral thresholds).
    Plan: a single filter over codegen expressions — no shuffle, no
    Python — so Catalyst can fuse it into the scan stage ahead of any
    render fan-out."""
    px = affine_px_sql("z.lon", lon_min, lon_max, width)
    py = affine_py_sql("z.lat", lat_min, lat_max, height)
    pix = f"transform(geometry, z -> struct({px} AS x, {py} AS y))"
    cross = (
        "zip_with(pp, concat(slice(pp, 2, size(pp) - 1), array(element_at(pp, 1))), "
        "(p, q) -> p.x * q.y - q.x * p.y)"
    )
    cond = (
        f"abs(aggregate({cross.replace('pp', 'pix_')}, CAST(0 AS BIGINT), (a, c) -> a + c)) "
        f">= CAST({2 * min_px2!r} AS DOUBLE)"
    )
    return (
        ways.withColumn("pix_", F.expr(pix))
        .where(F.expr(cond))
        .drop("pix_")
    )
