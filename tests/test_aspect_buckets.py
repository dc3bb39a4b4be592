"""Aspect-ratio bucketing: bucket-list generation, nearest assignment,
batch formation, determinism."""

from __future__ import annotations

import math

from osm_render_spark.operators.packing import (
    aspect_buckets,
    bucket_images_by_aspect,
)


def test_bucket_list_properties():
    buckets = aspect_buckets()
    assert buckets == sorted(set(buckets))
    for w, h in buckets:
        assert w % 64 == 0 and h % 64 == 0
        assert w * h <= 1024 * 1024
        assert max(w / h, h / w) <= 4.0
        # maximal: one more step of height would blow the budget or cap
        assert (h + 64) * w > 1024 * 1024 or h + 64 > 2048
    assert (1024, 1024) in buckets


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "image_id long, width long, height long"
    )


def test_exact_ratio_images_get_their_bucket(spark):
    buckets = aspect_buckets()
    sq = buckets.index((1024, 1024))
    two_to_one = buckets.index((1408, 704))
    df = _mk(
        spark,
        [
            (1, 300, 300),  # square → (1024, 1024), d = 0
            (2, 500, 250),  # exactly 2:1 → (1408, 704), d = 0
            (3, 250, 500),  # 1:2 → the transpose bucket (704, 1408)
        ],
    )
    out = {r["image_id"]: r for r in bucket_images_by_aspect(df, 2).collect()}
    assert out[1]["bucket_idx"] == sq
    assert out[2]["bucket_idx"] == two_to_one
    # 1:2 portrait: the list is NOT transpose-symmetric (each width gets
    # its MAXIMAL height), so the nearest bucket is (704, 1472)
    best = min(
        range(len(buckets)),
        key=lambda i: abs(
            math.log((250 * buckets[i][1]) / (500 * buckets[i][0]))
        ),
    )
    assert out[3]["bucket_idx"] == best
    assert (out[3]["bucket_w"], out[3]["bucket_h"]) == (704, 1472)


def test_assignment_matches_python_argmin(spark):
    buckets = aspect_buckets()
    rows = [
        (i, 64 + (i * 37) % 900, 64 + (i * 53) % 900) for i in range(200)
    ]
    out = {
        r["image_id"]: r["bucket_idx"]
        for r in bucket_images_by_aspect(_mk(spark, rows), 8).collect()
    }
    for i, w, h in rows:
        best, bd = -1, float("inf")
        for bi, (bw, bh) in enumerate(buckets):
            d = abs(math.log((w * bh) / (h * bw)))
            if d < bd:
                best, bd = bi, d
        assert out[i] == best, (i, w, h)


def test_batches_are_fixed_size_and_ordered(spark):
    # 10 square images, batch_size 4 → batches of 4/4/2, last incomplete
    rows = [(i, 100, 100) for i in range(10)]
    out = sorted(
        (
            (r["batch_idx"], r["pos_in_batch"], r["image_id"], r["complete"])
            for r in bucket_images_by_aspect(_mk(spark, rows), 4).collect()
        )
    )
    assert [(b, p, i) for b, p, i, _ in out] == [
        (b, p, b * 4 + p) for b in range(3) for p in range(4) if b * 4 + p < 10
    ]
    assert all(c for b, _, _, c in out if b < 2)
    assert all(not c for b, _, _, c in out if b == 2)


def test_deterministic(spark):
    rows = [(i, 64 + i % 777, 64 + (i * 7) % 777) for i in range(300)]

    def run():
        return sorted(
            map(tuple, bucket_images_by_aspect(_mk(spark, rows), 16).collect())
        )

    assert run() == run()


def test_assignment_adds_no_exchange(spark):
    # the only exchange is the per-bucket batching window — assignment
    # itself is per-row Column arithmetic
    rows = [(i, 100 + i, 100) for i in range(50)]
    plan = (
        bucket_images_by_aspect(_mk(spark, rows), 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
