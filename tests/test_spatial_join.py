"""Distance range join (operators/spatial_join.py): brute-force parity,
cell-boundary exactness across negative coordinates, hint plumbing, and
the no-cartesian plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_render_spark.operators.spatial_join import distance_join


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _points(spark, rows, idc="pid"):
    return spark.createDataFrame(rows, f"{idc} long, lon double, lat double")


@pytest.fixture(scope="module")
def grid(spark):
    # deterministic scatter spanning negative/positive coords and cell
    # boundaries (multiples of the radius land exactly on cell edges)
    rows = [
        (i, ((i * 37) % 140) * 0.5 - 35.0, ((i * 53) % 80) * 0.5 - 20.0)
        for i in range(400)
    ]
    return rows


def _brute(rows, qrows, r):
    out = set()
    for qid, qlon, qlat in qrows:
        for pid, plon, plat in rows:
            if pid == qid:
                continue
            d = (qlon - plon) ** 2 + (qlat - plat) ** 2
            if d < r * r:
                out.add((qid, pid))
    return out


@pytest.mark.parametrize("radius", [0.5, 1.0, 2.5])
def test_matches_brute_force(spark, grid, radius):
    qrows = grid[::13]
    q = _points(spark, qrows, "qid")
    p = _points(spark, grid)
    got = {
        (r["qid"], r["pid"])
        for r in distance_join(q, p, radius).collect()
    }
    assert got == _brute(grid, qrows, radius)


def test_boundary_pair_exactly_at_radius_excluded(spark):
    # dist == radius exactly -> strict < excludes it; epsilon inside -> kept
    p = _points(spark, [(1, 0.0, 0.0), (2, 2.0, 0.0), (3, 1.9999999, 0.0)])
    q = _points(spark, [(10, 0.0, 0.0)], "qid")
    got = {(r["qid"], r["pid"]) for r in distance_join(q, p, 2.0).collect()}
    assert got == {(10, 1), (10, 3)}


def test_hints_same_result_no_cartesian(spark, grid):
    q = _points(spark, grid[::13], "qid")
    p = _points(spark, grid)
    base = sorted(
        (r["qid"], r["pid"]) for r in distance_join(q, p, 1.0, hint="auto").collect()
    )
    for hint in ("broadcast", "shuffle"):
        df = distance_join(q, p, 1.0, hint=hint)
        plan = _plan(df)
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan
        if hint == "broadcast":
            assert "BroadcastHashJoin" in plan
        assert sorted((r["qid"], r["pid"]) for r in df.collect()) == base


def test_parquet_plan_pushdown(spark):
    from osm_render_spark.queries import build_queries

    df = build_queries()["distance_join_2deg"].spark_fn(spark, "/root/testdata/sf0.01")
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
