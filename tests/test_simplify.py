"""RDP geometry simplification: numpy kernel vs an independent
recursive reference (hypothesis-fuzzed), invariants, Spark operator
round-trip, and the low-zoom render use case."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_render_spark.operators.simplify import (
    eps_for_zoom,
    rdp_mask,
    simplify_ways,
)


def _rdp_reference(pts: list[tuple[float, float]], eps: float) -> list[int]:
    """Textbook recursive RDP, written independently of the kernel
    (scalar math, explicit recursion)."""

    def seg_dist(p, a, b):
        ax, ay = a
        bx, by = b
        px, py = p
        dx, dy = bx - ax, by - ay
        n2 = dx * dx + dy * dy
        if n2 == 0.0:
            return math.hypot(px - ax, py - ay)
        return abs((px - ax) * dy - (py - ay) * dx) / math.sqrt(n2)

    def rec(i, j, keep):
        if j <= i + 1:
            return
        dmax, imax = -1.0, -1
        for m in range(i + 1, j):
            d = seg_dist(pts[m], pts[i], pts[j])
            if d > dmax:
                dmax, imax = d, m
        if dmax > eps:
            keep.add(imax)
            rec(i, imax, keep)
            rec(imax, j, keep)

    keep = {0, len(pts) - 1}
    rec(0, len(pts) - 1, keep)
    return sorted(keep)


coord = st.floats(
    min_value=-50.0, max_value=50.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=200, deadline=None)
@given(
    pts=st.lists(st.tuples(coord, coord), min_size=2, max_size=40),
    eps=st.floats(min_value=0.0, max_value=30.0, allow_nan=False),
)
def test_kernel_matches_independent_reference(pts, eps):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    got = list(np.nonzero(rdp_mask(xs, ys, eps))[0])
    assert got == _rdp_reference(pts, eps)


def test_collinear_points_removed():
    xs = np.linspace(0, 10, 11)
    ys = np.zeros(11)
    mask = rdp_mask(xs, ys, 1e-12)
    assert list(np.nonzero(mask)[0]) == [0, 10]


def test_invariants():
    rng = np.random.default_rng(3)
    xs = rng.uniform(-1, 1, 100)
    ys = rng.uniform(-1, 1, 100)
    for eps in (0.0, 0.01, 0.1, 1.0, 10.0):
        mask = rdp_mask(xs, ys, eps)
        assert mask[0] and mask[-1]
        # monotone: larger eps keeps a subset
        if eps > 0.0:
            assert mask.sum() <= rdp_mask(xs, ys, 0.0).sum()


def test_ring_collapse_below_eps():
    # a tiny square ring (side 0.001) with coincident endpoints
    # collapses to the 2 anchor points at eps 0.01
    xs = np.array([0.0, 0.001, 0.001, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 0.001, 0.001, 0.0])
    assert rdp_mask(xs, ys, 0.01).sum() == 2
    # and survives intact below its size
    assert rdp_mask(xs, ys, 0.0001).sum() == 5


def test_spark_operator_roundtrip(spark):
    # rectangle ring with collinear edge midpoints: always reduces 9 → 5
    def rect(way_id, x, y, w, h, bump=0.0):
        pts = [
            (x, y), (x + w / 2, y - bump), (x + w, y),
            (x + w, y + h / 2), (x + w, y + h),
            (x + w / 2, y + h), (x, y + h),
            (x, y + h / 2), (x, y),
        ]
        return (way_id, "water", [{"lon": a, "lat": b} for a, b in pts])

    rows = [
        rect(1, 0.0, 0.0, 0.02, 0.02, bump=0.0),
        rect(2, 1.0, 0.0, 0.02, 0.02, bump=0.009),
    ]
    df = spark.createDataFrame(
        rows,
        "way_id long, kind string, "
        "geometry array<struct<lon:double,lat:double>>",
    )
    out = {
        r["way_id"]: r
        for r in simplify_ways(df, eps=0.005, space="lonlat").collect()
    }
    assert out[1]["n_points_in"] == 9 and out[1]["n_points_out"] == 5
    assert out[2]["n_points_out"] == 6  # the 0.009 bump survives eps=0.005
    # kept points are a subsequence with ORIGINAL coordinate values
    g1 = [(p["lon"], p["lat"]) for p in out[1]["geometry"]]
    assert g1 == [(0.0, 0.0), (0.02, 0.0), (0.02, 0.02), (0.0, 0.02), (0.0, 0.0)]
    assert out[1]["kind"] == "water"  # pass-through column preserved


def test_mercator_space_pixel_bound(spark):
    # a wiggle of ~0.3 px at z4 disappears; the same wiggle at z12 stays
    tile_px = 256
    wig_merc = 0.3 / (tile_px * (1 << 4))  # 0.3 px at zoom 4, in merc units
    wig_deg = wig_merc * 360.0  # at the equator, merc-x is lon/360
    pts = [(0.0, 0.0), (0.005, wig_deg), (0.01, 0.0)]
    df = spark.createDataFrame(
        [(1, [{"lon": a, "lat": b} for a, b in pts])],
        "way_id long, geometry array<struct<lon:double,lat:double>>",
    )
    low = simplify_ways(
        df, eps=eps_for_zoom(4, tile_px), space="mercator"
    ).collect()[0]
    high = simplify_ways(
        df, eps=eps_for_zoom(12, tile_px), space="mercator"
    ).collect()[0]
    assert low["n_points_out"] == 2
    assert high["n_points_out"] == 3


def test_simplify_feeds_renderer(spark):
    # the use case: simplified geometry renders identically when every
    # removed vertex is exactly collinear (zero tolerance in render space)
    from test_slippy import TILE_PX, ZOOM, _ways

    from osm_render_spark.raster.ops import render_slippy_tiles

    ways = _ways(spark)
    # add collinear midpoints to every segment, then simplify them away
    from pyspark.sql import functions as F

    dense = ways.select(
        "way_id",
        "kind",
        F.expr(
            """flatten(transform(
                 slice(geometry, 1, size(geometry) - 1),
                 (p, i) -> array(
                   p,
                   struct((p.lon + geometry[i + 1].lon) / 2 AS lon,
                          (p.lat + geometry[i + 1].lat) / 2 AS lat))
               )) || array(element_at(geometry, -1))"""
        ).alias("geometry"),
    )
    simp = simplify_ways(dense, eps=1e-12, space="lonlat").select(
        "way_id", "kind", "geometry"
    )
    want = {
        (r["tile_key"]): bytes(r["bytes"])
        for r in render_slippy_tiles(ways, ZOOM, TILE_PX).collect()
    }
    got = {
        (r["tile_key"]): bytes(r["bytes"])
        for r in render_slippy_tiles(simp, ZOOM, TILE_PX).collect()
    }
    assert want == got


def test_simplify_is_shuffle_free(spark):
    from pyspark.sql import functions as F

    ways = spark.range(10).select(
        F.col("id").alias("way_id"),
        F.expr(
            "transform(sequence(0, 4), i -> struct(CAST(i AS DOUBLE) AS lon,"
            " CAST(i AS DOUBLE) AS lat))"
        ).alias("geometry"),
    )
    plan = simplify_ways(ways, 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
