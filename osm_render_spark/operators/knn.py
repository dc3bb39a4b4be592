"""Indexed broadcast kNN join (SURVEY.md J7/W3, milestone M4).

Generalizes the reference's nearest-clockwise-successor search
(``ConnectEdgePaths``, OsmRender.m:236-253 — a k=1 NN under a circular
metric) to k≥1 under a pluggable distance expression.

Physical strategy, in preference order:

* **broadcast kNN** — when one side is small (the usual case: query
  points, tile boundaries, sprite anchors), broadcast it and rank with a
  window. The cross join is BroadcastNestedLoopJoin; no shuffle of the
  big side beyond the final per-query rank (which partitions by query id).
* **cell-pruned kNN** — at 100 TB neither side may be broadcastable; then
  candidates are pre-bucketed by spatial cell (functions.cells) and each
  query only crosses its own + neighboring cells. Provided by
  ``knn_join_celled``.

Determinism: ties broken by candidate id ascending (FIXTURES.md
golden_knn convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def squared_l2(qlon: Column, qlat: Column, lon: Column, lat: Column) -> Column:
    return (lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat)


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    dist: Column | None = None,
) -> DataFrame:
    """Broadcast kNN: queries(query_id, qlon, qlat) × candidates(cand_id,
    lon, lat) → (query_id, cand_id, rank, d2), rank 1..k.

    The QUERY side is broadcast (it is the small side by contract); the
    candidate table streams through unshuffled, and the only wide exchange
    is the rank window partitioned by query_id — k rows per query survive.
    """
    d = dist if dist is not None else squared_l2(
        F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")
    )
    crossed = candidates.crossJoin(F.broadcast(queries)).withColumn("d2", d)
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cand_id").asc())
    return (
        crossed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "d2")
    )


def knn_join_celled(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    zoom: int = 7,
) -> DataFrame:
    """Cell-pruned kNN for the large×large case: candidates bucketed by
    tile cell; each query joins its own cell and the 8 neighbors (3×3
    ring), then ranks. Exact as long as the true k-th neighbor lies within
    the ring — callers pick ``zoom`` so a cell is ≥ the max search radius;
    for unbounded exactness compose with a fallback pass for queries whose
    k-th distance exceeds the ring (not needed for the engine's tile-local
    workloads).
    """
    cand = candidates.withColumn(
        "cx", F.expr(f"CAST({_tx('lon', zoom)} AS BIGINT)")
    ).withColumn("cy", F.expr(f"CAST({_ty('lat', zoom)} AS BIGINT)"))
    q = queries.withColumn(
        "qcx", F.expr(f"CAST({_tx('qlon', zoom)} AS BIGINT)")
    ).withColumn("qcy", F.expr(f"CAST({_ty('qlat', zoom)} AS BIGINT)"))
    # fan each query out to its 3×3 cell ring, then equi-join on cell
    ring = q.select(
        "*",
        F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
    ).select("*", F.explode(F.expr("sequence(-1, 1)")).alias("dy"))
    ring = ring.withColumn("jx", F.col("qcx") + F.col("dx")).withColumn(
        "jy", F.col("qcy") + F.col("dy")
    )
    joined = ring.join(
        cand, (ring.jx == cand.cx) & (ring.jy == cand.cy), "inner"
    ).withColumn(
        "d2",
        squared_l2(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cand_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", "d2")
    )


def _tx(lon: str, zoom: int) -> str:
    from ..functions.projection import tile_x_sql

    return tile_x_sql(lon, zoom)


def _ty(lat: str, zoom: int) -> str:
    from ..functions.projection import tile_y_sql

    return tile_y_sql(lat, zoom)
