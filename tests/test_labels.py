"""Greedy label placement (operators/labels.py): hand-worked collisions,
an independent brute-force reference over random rects, the chain
recurrence the oracle uses, cap semantics, and the one-exchange plan pin."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osm_render_spark.operators.labels import greedy_mask, place_labels


def _df(spark, rows):
    """rows: (tile, label_id, priority, x, y, w, h)."""
    return spark.createDataFrame(
        rows,
        "tile long, label_id long, priority long, x long, y long, w long, h long",
    )


def _brute_mask(rows):
    """Independent greedy reference: plain python loops, no numpy, no
    shared code with the kernel. rows sorted by (priority, label_id)."""
    accepted = []
    mask = []
    for _t, _lid, _p, x, y, w, h in rows:
        ok = all(
            not (x < ax + aw and ax < x + w and y < ay + ah and ay < y + h)
            for ax, ay, aw, ah in accepted
        )
        mask.append(ok)
        if ok:
            accepted.append((x, y, w, h))
    return mask


def test_hand_worked(spark):
    rows = [
        # tile 0: A accepted; B overlaps A → rejected; C clear → accepted;
        # D touches A's right edge exactly (half-open) → accepted
        (0, 1, 0, 0, 0, 10, 10),
        (0, 2, 1, 5, 5, 10, 10),
        (0, 3, 2, 50, 50, 10, 10),
        (0, 4, 3, 10, 0, 10, 10),
        # tile 1: same geometry, reversed priorities → B wins, A loses
        (1, 1, 9, 0, 0, 10, 10),
        (1, 2, 1, 5, 5, 10, 10),
    ]
    got = {
        (r.tile, r.label_id): r.place_rank
        for r in place_labels(_df(spark, rows)).collect()
    }
    assert set(got) == {(0, 1), (0, 3), (0, 4), (1, 2)}
    assert got[(0, 1)] == 0 and got[(0, 3)] == 1 and got[(0, 4)] == 2


def test_matches_independent_bruteforce(spark):
    rng = np.random.default_rng(11)
    rows = []
    for tile in range(6):
        for i in range(60):
            rows.append(
                (
                    tile,
                    int(rng.integers(0, 10_000)) * 10 + i,
                    int(rng.integers(0, 5)),
                    int(rng.integers(0, 200)),
                    int(rng.integers(0, 200)),
                    int(rng.integers(4, 40)),
                    int(rng.integers(4, 20)),
                )
            )
    got = sorted(
        (r.tile, r.label_id)
        for r in place_labels(_df(spark, rows)).collect()
    )
    want = []
    for tile in range(6):
        trows = sorted(
            (r for r in rows if r[0] == tile), key=lambda r: (r[2], r[1])
        )
        want += [
            (tile, r[1]) for r, keep in zip(trows, _brute_mask(trows)) if keep
        ]
    assert got == sorted(want)


def test_chain_recurrence():
    """The oracle fixture's regime: same y, overlap only with the
    immediate predecessor → accepted(i) = NOT (gap_i < w AND
    accepted(i-1)). greedy_mask must reproduce the recurrence exactly."""
    for step in (10, 12, 18):
        xs = np.array(
            [i * step + (i % 3) * 4 for i in range(1, 40)], dtype=np.int64
        )
        n = len(xs)
        ys = np.zeros(n, dtype=np.int64)
        ws = np.full(n, 16, dtype=np.int64)
        hs = np.full(n, 10, dtype=np.int64)
        got = greedy_mask(xs, ys, ws, hs)
        want = np.zeros(n, dtype=bool)
        want[0] = True
        for i in range(1, n):
            want[i] = not (xs[i] - xs[i - 1] < 16 and want[i - 1])
        assert (got == want).all(), step


def test_cap_truncates_candidates(spark):
    # 5 non-overlapping labels; cap 3 keeps only the top-3 priorities
    rows = [(0, i, i, i * 100, 0, 10, 10) for i in range(5)]
    got = sorted(
        r.label_id
        for r in place_labels(_df(spark, rows), max_per_tile=3).collect()
    )
    assert got == [0, 1, 2]


def test_single_exchange_plan(spark):
    rows = [(0, 1, 0, 0, 0, 10, 10)]
    out = place_labels(_df(spark, rows))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # one hash exchange for the cap window; FlatMapGroupsInPandas reuses
    # that partitioning rather than adding its own
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "FlatMapGroupsInPandas" in plan
