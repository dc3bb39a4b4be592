"""kNN operators: broadcast vs cell-pruned agreement, circular metric."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osm_render_spark.operators.knn import knn_join, knn_join_celled


def _frames(spark, spread=0.5):
    rng = np.random.default_rng(5)
    qpts = [(i, float(-50 + 13 * i), float(-30 + 9 * i)) for i in range(6)]
    cands = []
    k = 0
    for _qid, qlon, qlat in qpts:
        for _ in range(30):
            cands.append(
                (
                    k,
                    float(qlon + rng.uniform(-spread, spread)),
                    float(qlat + rng.uniform(-spread, spread)),
                )
            )
            k += 1
    q = spark.createDataFrame(qpts, "query_id long, qlon double, qlat double")
    c = spark.createDataFrame(cands, "cand_id long, lon double, lat double")
    return q, c


def test_celled_knn_matches_broadcast_knn(spark):
    """When the k-th neighbor is inside the 3×3 cell ring (candidates
    within 0.5° of each query, zoom-7 cells ≈ 2.8°), the cell-pruned plan
    must be exact."""
    q, c = _frames(spark)
    a = {(r["query_id"], r["rank"]): r["cand_id"] for r in knn_join(q, c, 5).collect()}
    b = {
        (r["query_id"], r["rank"]): r["cand_id"]
        for r in knn_join_celled(q, c, 5, zoom=7).collect()
    }
    assert a == b


def test_knn_circular_metric_plugs_in(spark):
    """J7's actual metric: clockwise perimeter gap (mod perimeter). The
    dist parameter accepts any Column expression."""
    perimeter = 100.0
    q = spark.createDataFrame([(0, 90.0)], "query_id long, qpos double")
    c = spark.createDataFrame(
        [(1, 10.0), (2, 85.0), (3, 95.0)], "cand_id long, pos double"
    )
    gap = F.pmod(F.col("pos") - F.col("qpos"), F.lit(perimeter))
    got = [
        r["cand_id"]
        for r in knn_join(q, c, 3, dist=gap).orderBy("rank").collect()
    ]
    # clockwise from 90: 95 (gap 5), 10 (gap 20), 85 (gap 95)
    assert got == [3, 1, 2]
