"""Clip (F7) + coastline merge (A3/A4) kernel tests: hand-computed cases
pin exact semantics; hypothesis pins invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from osm_render_spark.operators.clip import clip_polyline
from osm_render_spark.operators.coast_merge import (
    clockwise_box_position,
    concat_fixpoint,
    drop_interior_endpoints,
    merge_coast_paths,
)

RECT = (0.0, 0.0, 10.0, 10.0)


# ---------------------------------------------------------------------------
# clip
# ---------------------------------------------------------------------------

def test_clip_inside_passthrough():
    pts = np.array([[1, 1], [5, 5], [9, 2]], dtype=float)
    out = clip_polyline(pts, RECT)
    assert len(out) == 1
    assert (out[0] == pts).all()


def test_clip_single_crossing_exact_boundary():
    pts = np.array([[5, 5], [15, 5]], dtype=float)
    out = clip_polyline(pts, RECT)
    assert len(out) == 1
    assert out[0][-1][0] == 10.0  # exactly on the boundary (F7 requirement)
    assert out[0][-1][1] == 5.0


def test_clip_splits_on_exit_and_reentry():
    # in → out → back in: two sub-paths
    pts = np.array([[5, 5], [15, 5], [15, 8], [5, 8]], dtype=float)
    out = clip_polyline(pts, RECT)
    assert len(out) == 2
    assert out[0][-1][0] == 10.0 and out[1][0][0] == 10.0


def test_clip_fully_outside():
    pts = np.array([[20, 20], [30, 30]], dtype=float)
    assert clip_polyline(pts, RECT) == []


def test_clip_crossing_segment_both_endpoints_outside():
    pts = np.array([[-5, 5], [15, 5]], dtype=float)
    out = clip_polyline(pts, RECT)
    assert len(out) == 1
    assert out[0][0][0] == 0.0 and out[0][-1][0] == 10.0


@given(seed=st.integers(0, 5000))
@settings(max_examples=60, deadline=None)
@example(seed=5)  # previously discovered failure (hypothesis find)
def test_clip_invariants(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-5, 15, size=(int(rng.integers(2, 30)), 2))
    out = clip_polyline(pts, RECT)
    originals = {(p[0], p[1]) for p in pts}
    for sub in out:
        assert len(sub) >= 2
        # every output point is inside-or-on the rect
        assert (sub[:, 0] >= 0).all() and (sub[:, 0] <= 10).all()
        assert (sub[:, 1] >= 0).all() and (sub[:, 1] <= 10).all()
        # F7 exactness: any endpoint that is NOT an original input vertex
        # was produced by clipping and must lie EXACTLY on the boundary
        # (required by the merge's exact-equality tests, OsmRender.m:368-371)
        for p in (sub[0], sub[-1]):
            if (p[0], p[1]) not in originals:
                assert p[0] in (0.0, 10.0) or p[1] in (0.0, 10.0)


# ---------------------------------------------------------------------------
# clockwise position + merge
# ---------------------------------------------------------------------------

def test_clockwise_positions():
    # W2 (OsmRender.m:137-160): top→right→bottom→left, y-down
    assert clockwise_box_position(3, 0, RECT) == 3  # top edge
    assert clockwise_box_position(10, 4, RECT) == 14  # right edge
    assert clockwise_box_position(7, 10, RECT) == 23  # bottom edge (reversed)
    assert clockwise_box_position(0, 6, RECT) == 34  # left edge (reversed)


def test_concat_fixpoint_chains():
    a = np.array([[0.0, 5.0], [4.0, 5.0]])
    b = np.array([[4.0, 5.0], [8.0, 5.0]])
    c = np.array([[8.0, 5.0], [10.0, 5.0]])
    out = concat_fixpoint([a, b, c])
    assert len(out) == 1
    assert (out[0] == np.array([[0, 5], [4, 5], [8, 5], [10, 5]])).all()


def test_drop_interior_endpoint_paths():
    open_inside = np.array([[0.0, 5.0], [5.0, 5.0]])  # ends strictly inside
    boundary = np.array([[0.0, 5.0], [10.0, 5.0]])
    closed = np.array([[2.0, 2.0], [4.0, 2.0], [3.0, 4.0], [2.0, 2.0]])
    out = drop_interior_endpoints([open_inside, boundary, closed], RECT)
    assert len(out) == 2


def test_merge_single_crossing_path_closes_with_corners():
    # coastline entering at left edge (0,4), exiting at top (6,0):
    # clockwise walk from end (6,0) back to start (0,4) passes corners
    # (10,0),(10,10),(0,10) — wait: from top position 6 clockwise to left
    # position 36: corners at top-right(10), bottom-right(20), bottom-left(30)
    path = np.array([[0.0, 4.0], [5.0, 5.0], [6.0, 0.0]])
    out = merge_coast_paths([path], RECT)
    assert len(out) == 1
    poly = out[0]
    assert (poly[0] == poly[-1]).all()  # closed
    # corners inserted in clockwise order
    corner_list = [tuple(p) for p in poly]
    assert (10.0, 0.0) in corner_list
    assert (10.0, 10.0) in corner_list
    assert (0.0, 10.0) in corner_list


def test_merge_two_paths_chain_clockwise():
    # p1 ends on top edge at x=6 (pos 6); p2 starts on top edge at x=8
    # (pos 8) and ends on right edge y=3 (pos 13): chain p1 → p2, then
    # close p2's end back to p1's start on the left edge (pos 35).
    p1 = np.array([[0.0, 5.0], [4.0, 4.0], [6.0, 0.0]])
    p2 = np.array([[8.0, 0.0], [9.0, 2.0], [10.0, 3.0]])
    out = merge_coast_paths([p1, p2], RECT)
    assert len(out) == 1
    poly = out[0]
    assert (poly[0] == poly[-1]).all()
    pts = [tuple(p) for p in poly]
    # p2 was appended after p1 (no corner between pos 6 and 8 on top edge)
    assert pts.index((8.0, 0.0)) == pts.index((6.0, 0.0)) + 1
    # closing passes bottom-right and bottom-left corners
    assert (10.0, 10.0) in pts and (0.0, 10.0) in pts


def test_merge_closed_ring_untouched():
    ring = np.array([[2.0, 2.0], [6.0, 2.0], [4.0, 6.0], [2.0, 2.0]])
    out = merge_coast_paths([ring], RECT)
    assert len(out) == 1
    assert (out[0] == ring).all()


def test_merge_coast_df_matches_kernel(spark):
    """Distributed per-tile merge == single-process kernel per tile."""
    from osm_render_spark.operators.coast_merge import merge_coast_df

    tiles = {
        0: [
            np.array([[0.0, 4.0], [5.0, 5.0], [6.0, 0.0]]),
            np.array([[8.0, 0.0], [9.0, 2.0], [10.0, 3.0]]),
        ],
        1: [np.array([[2.0, 2.0], [6.0, 2.0], [4.0, 6.0], [2.0, 2.0]])],
    }
    rows = [
        (t, i, [float(x) for x in p[:, 0]], [float(y) for y in p[:, 1]])
        for t, ps in tiles.items()
        for i, p in enumerate(ps)
    ]
    df = spark.createDataFrame(
        rows, "tile_key long, path_id long, xs array<double>, ys array<double>"
    )
    got = {}
    for r in merge_coast_df(df, RECT).collect():
        got.setdefault(r["tile_key"], []).append(
            np.column_stack([r["xs"], r["ys"]])
        )
    for t, paths in tiles.items():
        want = merge_coast_paths(paths, RECT)
        assert len(got[t]) == len(want)
        for a, b in zip(got[t], want):
            assert (a == b).all()


@given(seed=st.integers(0, 3000))
@settings(max_examples=40, deadline=None)
def test_merge_invariants(seed):
    """All outputs closed; all boundary-incident inputs consumed or
    dropped deterministically."""
    rng = np.random.default_rng(seed)
    paths = []
    for _ in range(int(rng.integers(1, 6))):
        # random path that starts and ends on the boundary
        def bpoint():
            edge = rng.integers(0, 4)
            t = float(rng.uniform(0, 10))
            return {
                0: (t, 0.0),
                1: (10.0, t),
                2: (t, 10.0),
                3: (0.0, t),
            }[int(edge)]

        mid = rng.uniform(1, 9, size=(int(rng.integers(1, 5)), 2))
        paths.append(np.vstack([np.array(bpoint()), mid, np.array(bpoint())]))
    out = merge_coast_paths(paths, RECT)
    for poly in out:
        assert (poly[0] == poly[-1]).all(), "every output polygon is closed"
