"""Polygon pixel-space metrics (operators/geometry.py): hand-worked
shoelace cases, invariance properties (closure, duplicates, reversal),
an independent numpy cross-check on random rings, and the shuffle-free
plan pin for the sub-pixel cull."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_render_spark.operators.geometry import (
    drop_subpixel_ways,
    polygon_pixel_stats,
)

# Scene: lon/lat 0..10 → 100×100 px. 1 degree = 10 px; y inverted.
BOX = dict(lon_min=0.0, lon_max=10.0, lat_min=0.0, lat_max=10.0, width=100, height=100)


def _ways(spark, rings):
    """rings: list[(way_id, [(lon, lat), ...])]."""
    rows = [
        (wid, [{"lon": float(a), "lat": float(b)} for a, b in pts])
        for wid, pts in rings
    ]
    return spark.createDataFrame(
        rows, "way_id long, geometry array<struct<lon double, lat double>>"
    )


def _px(lon, lat):
    """The engine's P8 projection for this scene, floor(x+0.5)."""
    return (
        int(np.floor(lon * 10.0 + 0.5)),
        int(np.floor((lat - 10.0) * (100.0 / -10.0) + 0.5)),
    )


def _shoelace2(pix):
    """Independent integer shoelace (2× signed area), closing edge included."""
    s = 0
    n = len(pix)
    for i in range(n):
        x0, y0 = pix[i]
        x1, y1 = pix[(i + 1) % n]
        s += x0 * y1 - x1 * y0
    return s


SQUARE = [(1, 1), (3, 1), (3, 3), (1, 3)]  # 20×20 px → |area2| = 800


def test_hand_worked_square(spark):
    out = polygon_pixel_stats(_ways(spark, [(1, SQUARE)]), **BOX).collect()[0]
    # px ring: (10,90) (30,90) (30,70) (10,70) — CCW in lon/lat is CW on
    # a y-down screen... shoelace over that order: sum of cross terms.
    pix = [_px(a, b) for a, b in SQUARE]
    want = _shoelace2(pix)
    assert abs(want) == 800
    assert out.area2 == want
    assert out.n_vertices == 4
    assert out.winding == ("cw" if want > 0 else "ccw")
    # centroid of a square = its center, exactly representable
    assert out.centroid_px == 20.0 and out.centroid_py == 80.0
    assert (out.min_px, out.min_py, out.max_px, out.max_py) == (10, 70, 30, 90)


def test_closure_and_duplicate_invariance(spark):
    closed = SQUARE + [SQUARE[0]]
    dup = [SQUARE[0], SQUARE[0]] + SQUARE[1:]
    res = {
        r.way_id: r.area2
        for r in polygon_pixel_stats(
            _ways(spark, [(1, SQUARE), (2, closed), (3, dup)]), **BOX
        ).collect()
    }
    assert res[1] == res[2] == res[3]


def test_reversal_negates_area_keeps_centroid(spark):
    out = {
        r.way_id: r
        for r in polygon_pixel_stats(
            _ways(spark, [(1, SQUARE), (2, SQUARE[::-1])]), **BOX
        ).collect()
    }
    assert out[1].area2 == -out[2].area2 != 0
    assert {out[1].winding, out[2].winding} == {"cw", "ccw"}
    assert out[1].centroid_px == out[2].centroid_px
    assert out[1].centroid_py == out[2].centroid_py


def test_degenerate_rings(spark):
    collinear = [(1, 1), (2, 2), (3, 3)]
    out = {
        r.way_id: r
        for r in polygon_pixel_stats(
            _ways(spark, [(1, collinear), (2, [(4, 4), (6, 6)])]), **BOX
        ).collect()
    }
    for r in out.values():
        assert r.area2 == 0
        assert r.winding == "degenerate"
        assert r.centroid_px is None and r.centroid_py is None


def test_matches_independent_numpy_shoelace(spark):
    rng = np.random.default_rng(7)
    rings = []
    for wid in range(40):
        n = int(rng.integers(3, 12))
        pts = rng.uniform(0.3, 9.7, size=(n, 2))
        rings.append((wid, [tuple(p) for p in pts]))
    got = {
        r.way_id: (r.area2, r.min_px, r.max_py)
        for r in polygon_pixel_stats(_ways(spark, rings), **BOX).collect()
    }
    for wid, pts in rings:
        pix = [_px(a, b) for a, b in pts]
        want = _shoelace2(pix)
        assert got[wid][0] == want, wid
        assert got[wid][1] == min(p[0] for p in pix)
        assert got[wid][2] == max(p[1] for p in pix)


def test_drop_subpixel_ways(spark):
    # big: 20×20 px; tiny: 0.04° = 0.4 px square (rounds to zero area);
    # small-but-visible: 0.3° = 3 px square = 9 px².
    tiny = [(5.0, 5.0), (5.04, 5.0), (5.04, 5.04), (5.0, 5.04)]
    small = [(7.0, 7.0), (7.3, 7.0), (7.3, 7.3), (7.0, 7.3)]
    df = _ways(spark, [(1, SQUARE), (2, tiny), (3, small)])
    kept = sorted(
        r.way_id for r in drop_subpixel_ways(df, **BOX, min_px2=1.0).collect()
    )
    assert kept == [1, 3]
    kept10 = sorted(
        r.way_id for r in drop_subpixel_ways(df, **BOX, min_px2=10.0).collect()
    )
    assert kept10 == [1]
    # schema untouched
    assert drop_subpixel_ways(df, **BOX).columns == df.columns


def test_cull_plan_is_shuffle_free(spark):
    df = _ways(spark, [(1, SQUARE)])
    plan = (
        drop_subpixel_ways(df, **BOX, min_px2=1.0)
        ._sc._jvm.PythonSQLUtils.explainString(
            drop_subpixel_ways(df, **BOX, min_px2=1.0)._jdf.queryExecution(),
            "formatted",
        )
    )
    assert "Exchange" not in plan, "sub-pixel cull must not shuffle"


def test_stats_plan_is_shuffle_free(spark):
    df = _ways(spark, [(1, SQUARE)])
    out = polygon_pixel_stats(df, **BOX)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
