"""Polyline clipping to a rectangle (SURVEY.md F7).

The reference calls Swanston's ``clipToRect:`` (OsmRender.m:478) with
standard Liang–Barsky semantics: each exit/entry of the rect splits the
polyline into sub-paths, and clipped endpoints land EXACTLY on the
boundary (required by the endpoint tests in OsmRender.m:167-175,368-371
and by the coastline merge's exact-equality point matching).

Exactness discipline: boundary coordinates are ASSIGNED (x = x0), never
recomputed through arithmetic, so later exact comparisons (is the
endpoint on edge x0?) hold bitwise.

This is a numpy kernel (no Spark builtin expresses it); it runs inside
grouped Arrow batches (per-tile path groups) in the render pipeline.
"""

from __future__ import annotations

import numpy as np

Rect = tuple[float, float, float, float]  # (x0, y0, x1, y1)


def clip_polyline(pts: np.ndarray, rect: Rect) -> list[np.ndarray]:
    """Clip an (n,2) polyline to rect; return list of (k,2) sub-paths.

    Liang–Barsky per segment, vectorized over segments for the t-range
    computation; sub-path assembly is a linear scan.
    """
    x0, y0, x1, y1 = rect
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) < 2:
        inside = (
            (pts[:, 0] >= x0) & (pts[:, 0] <= x1) & (pts[:, 1] >= y0) & (pts[:, 1] <= y1)
        )
        return [pts] if len(pts) and bool(inside.all()) else []

    p = pts[:-1]
    q = pts[1:]
    d = q - p

    # Liang–Barsky t-interval per segment against each of the 4 half-planes.
    # Track WHICH plane produced each t so the clipped coordinate can be
    # ASSIGNED the exact boundary value (clamping is not enough: the float
    # p + t*d can land epsilon-inside the rect, and the coastline merge
    # relies on exact boundary equality — OsmRender.m:368-371).
    t_enter = np.zeros(len(p))
    t_exit = np.ones(len(p))
    enter_axis = np.full(len(p), -1, dtype=np.int8)
    enter_bound = np.zeros(len(p))
    exit_axis = np.full(len(p), -1, dtype=np.int8)
    exit_bound = np.zeros(len(p))
    valid = np.ones(len(p), dtype=bool)
    for lo, hi, axis in ((x0, x1, 0), (y0, y1, 1)):
        dp = d[:, axis]
        pp = p[:, axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            t_lo = (lo - pp) / dp
            t_hi = (hi - pp) / dp
        t0 = np.where(dp >= 0, t_lo, t_hi)
        b0 = np.where(dp >= 0, lo, hi)
        t1 = np.where(dp >= 0, t_hi, t_lo)
        b1 = np.where(dp >= 0, hi, lo)
        par_out = (dp == 0) & ((pp < lo) | (pp > hi))
        valid &= ~par_out
        upd0 = (dp != 0) & (t0 > t_enter)
        t_enter = np.where(upd0, t0, t_enter)
        enter_axis = np.where(upd0, axis, enter_axis)
        enter_bound = np.where(upd0, b0, enter_bound)
        upd1 = (dp != 0) & (t1 < t_exit)
        t_exit = np.where(upd1, t1, t_exit)
        exit_axis = np.where(upd1, axis, exit_axis)
        exit_bound = np.where(upd1, b1, exit_bound)
    valid &= t_enter <= t_exit

    def cut(point: np.ndarray, axis: int, bound: float) -> np.ndarray:
        out = point.copy()
        if axis >= 0:
            out[axis] = bound  # exact boundary assignment
        out[0] = min(max(out[0], x0), x1)
        out[1] = min(max(out[1], y0), y1)
        return out

    subpaths: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(p)):
        if not valid[i]:
            if len(cur) >= 2:
                subpaths.append(cur)
            cur = []
            continue
        te, tx = t_enter[i], t_exit[i]
        a = (
            p[i]
            if te <= 0
            else cut(p[i] + te * d[i], int(enter_axis[i]), float(enter_bound[i]))
        )
        b = (
            q[i]
            if tx >= 1
            else cut(p[i] + tx * d[i], int(exit_axis[i]), float(exit_bound[i]))
        )
        if te > 0:  # segment enters the rect: start a new sub-path
            if len(cur) >= 2:
                subpaths.append(cur)
            cur = [a]
        elif not cur:
            cur = [a]
        cur.append(b)
        if tx < 1:  # segment exits: close this sub-path
            if len(cur) >= 2:
                subpaths.append(cur)
            cur = []
    if len(cur) >= 2:
        subpaths.append(cur)
    return [np.array(s) for s in subpaths]
