"""Geohash: canonical public vectors, closed-form SQL == textbook
bisection, prefix-widening property, and the codegen (no-UDF) plan."""

from __future__ import annotations

import numpy as np

from osm_render_spark.functions.geohash import (
    add_geohash,
    geohash_py,
    geohash_sql,
)


def test_canonical_vectors():
    # the two classic published examples
    assert geohash_py(42.605, -5.603, 5) == "ezs42"
    assert geohash_py(57.64911, 10.40744, 11) == "u4pruydqqvj"


def test_prefix_widening():
    rng = np.random.RandomState(1)
    for lat, lon in zip(rng.uniform(-90, 90, 50), rng.uniform(-180, 180, 50)):
        full = geohash_py(lat, lon, 9)
        for p in (1, 3, 5, 7):
            assert geohash_py(lat, lon, p) == full[:p]


def test_sql_matches_bisection_on_spark(spark):
    rng = np.random.RandomState(2)
    pts = list(zip(rng.uniform(-90, 90, 200), rng.uniform(-180, 180, 200)))
    pts += [(42.605, -5.603), (57.64911, 10.40744),
            (-90.0, -180.0), (89.999999, 179.999999), (0.0, 0.0)]
    df = spark.createDataFrame(
        [(float(la), float(lo)) for la, lo in pts], "lat double, lon double"
    )
    for p in (5, 6, 8):
        got = add_geohash(df, "lat", "lon", p).collect()
        for r in got:
            assert r["geohash"] == geohash_py(r["lat"], r["lon"], p)


def test_one_shot_form(spark):
    df = spark.createDataFrame([(42.605, -5.603)], "lat double, lon double")
    out = df.selectExpr(f"{geohash_sql('lat', 'lon', 5)} AS gh").collect()
    assert out[0]["gh"] == "ezs42"


def test_plan_is_codegen_no_udf(spark):
    df = spark.range(100).selectExpr(
        "CAST(id % 89 AS DOUBLE) - 40 AS lat",
        "CAST(id % 179 AS DOUBLE) - 90 AS lon",
    )
    plan = add_geohash(df, "lat", "lon", 6)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()
