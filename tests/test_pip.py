"""Point-in-polygon: kernel properties + distributed join vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_render_spark.functions.cells import cell_id, polygon_cover
from osm_render_spark.operators.pip import POLY_SCHEMA, pip_join, raycast_even_odd


def _convex_inside(px, py, poly):
    """Independent check: sign test for CCW convex polygons."""
    inside = np.ones(len(px), dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        inside &= ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) > 0
    return inside


def _random_ccw_convex(rng, n_vertices):
    angles = np.sort(rng.uniform(0, 2 * np.pi, n_vertices))
    r = rng.uniform(5, 20)
    cx, cy = rng.uniform(-50, 50, 2)
    return [(float(cx + r * np.cos(a)), float(cy + r * np.sin(a))) for a in angles]


@given(seed=st.integers(0, 10_000))
@settings(max_examples=50, deadline=None)
def test_raycast_matches_convex_sign_test(seed):
    rng = np.random.default_rng(seed)
    poly = _random_ccw_convex(rng, int(rng.integers(3, 9)))
    px = rng.uniform(-80, 80, 200)
    py = rng.uniform(-80, 80, 200)
    xs = np.array([p[0] for p in poly])
    ys = np.array([p[1] for p in poly])
    got = raycast_even_odd(px, py, xs, ys)
    want = _convex_inside(px, py, poly)
    assert (got == want).all()


def test_raycast_concave():
    # L-shape: (0,0)-(4,0)-(4,1)-(1,1)-(1,4)-(0,4)
    xs = np.array([0.0, 4.0, 4.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0, 4.0, 4.0])
    px = np.array([0.5, 2.0, 2.0, 0.5, 3.5])
    py = np.array([0.5, 0.5, 2.0, 3.5, 3.5])
    want = np.array([True, True, False, True, False])
    assert (raycast_even_odd(px, py, xs, ys) == want).all()


@given(seed=st.integers(0, 10_000))
@settings(max_examples=30, deadline=None)
def test_cover_is_superset_of_inside_cells(seed):
    """J8 invariant: the cell cover must contain the cell of every inside
    point (prefilter may over-select, never under-select)."""
    rng = np.random.default_rng(seed)
    poly = _random_ccw_convex(rng, int(rng.integers(3, 8)))
    pts = np.column_stack([rng.uniform(-75, 75, 300), rng.uniform(-70, 70, 300)])
    zoom = int(rng.integers(3, 10))
    xs = np.array([p[0] for p in poly])
    ys = np.array([p[1] for p in poly])
    inside = raycast_even_odd(pts[:, 0], pts[:, 1], xs, ys)
    cover = set(polygon_cover(np.array(poly), zoom).tolist())
    cells = cell_id(pts[inside, 0], pts[inside, 1], zoom)
    assert set(cells.tolist()) <= cover


@pytest.mark.parametrize("zoom", [5, 9])
def test_pip_join_matches_bruteforce(spark, zoom):
    rng = np.random.default_rng(7)
    polys = {aid: _random_ccw_convex(rng, 5) for aid in range(3)}
    pts = np.column_stack([rng.uniform(-75, 75, 500), rng.uniform(-70, 70, 500)])
    points = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "point_id long, lon double, lat double",
    )
    polygons = spark.createDataFrame(
        [
            (aid, [p[0] for p in poly], [p[1] for p in poly])
            for aid, poly in polys.items()
        ],
        POLY_SCHEMA,
    )
    got = {
        (r["point_id"], r["area_id"])
        for r in pip_join(points, polygons, zoom=zoom).collect()
    }
    want = set()
    for aid, poly in polys.items():
        xs = np.array([p[0] for p in poly])
        ys = np.array([p[1] for p in poly])
        inside = raycast_even_odd(pts[:, 0], pts[:, 1], xs, ys)
        want |= {(int(i), aid) for i in np.flatnonzero(inside)}
    assert got == want


def test_pip_join_large_matches_broadcast_form(spark):
    """The large x large plan (shuffle prefilter + cogroup refine) must
    produce exactly the broadcast plan's matches."""
    import numpy as np

    from osm_render_spark.operators.pip import POLY_SCHEMA, pip_join, pip_join_large

    rng = np.random.default_rng(17)
    pts = spark.createDataFrame(
        [(int(i), float(lon), float(lat)) for i, (lon, lat) in enumerate(
            zip(rng.uniform(-80, 80, 800), rng.uniform(-60, 60, 800)))],
        "point_id long, lon double, lat double",
    )
    polys = spark.createDataFrame(
        [
            (0, [0.0, 50.0, 25.0], [0.0, 0.0, 40.0]),
            (1, [-70.0, -10.0, -10.0, -70.0], [-50.0, -50.0, -5.0, -5.0]),
            (2, [10.0, 60.0, 60.0, 10.0], [-55.0, -55.0, -20.0, -20.0]),
        ],
        POLY_SCHEMA,
    )
    a = {(r["point_id"], r["area_id"]) for r in pip_join(pts, polys, zoom=6).collect()}
    b = {(r["point_id"], r["area_id"])
         for r in pip_join_large(pts, polys, zoom=6).collect()}
    assert a == b and len(a) > 0


def test_pip_join_large_plan_has_no_broadcast_of_big_sides(spark):
    """With broadcast disabled (the 10^9-polygon regime), the plan must
    still be shuffle joins + cogroup — no BroadcastNestedLoopJoin or
    cartesian blowup."""
    from osm_render_spark.operators.pip import POLY_SCHEMA, pip_join_large

    from pyspark.sql import functions as F

    pts = spark.range(1000).select(
        F.col("id").alias("point_id"),
        (F.col("id") % 100 * 1.0).alias("lon"),
        (F.col("id") % 80 * 1.0).alias("lat"),
    )
    polys = spark.createDataFrame(
        [(0, [0.0, 50.0, 25.0], [0.0, 0.0, 40.0])], POLY_SCHEMA
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = pip_join_large(pts, polys, zoom=6)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "FlatMapCoGroupsInPandas" in plan or "CoGroup" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
