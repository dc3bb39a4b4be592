"""Map matching: snap points to their nearest way segment — the
geospatial join behind GPS-trace conflation, address interpolation, and
trajectory→road assignment.

Reference semantics: the nearest-feature family the reference solves
for the clockwise-successor walk (OsmRenderConnect analog,
operators/coast_merge.py J7) and generalized kNN (operators/knn.py) —
this is the point→SEGMENT variant: distance to a line segment with
endpoint clamping, not to a vertex.

100 TB shape (the knn.py celled discipline, but both sides big):
- segments explode to the grid cells their max_dist-expanded bbox
  overlaps (a short segment lands in 1–4 cells);
- each point keys to exactly ONE cell, so the cell equi-join yields
  every candidate within max_dist exactly once (no dedup pass);
- the refine is INTEGER-EXACT: d²·len2 = |AP|²·len2 − (AP·AB)² for the
  interior case, |AP|²/|BP|² at the clamps, quantized to
  d2_milli = floor(1000·d²) via two-step floor division so every
  intermediate stays in int64 (coords |x|,|y| < 2^15, documented);
- top-1 per point by (d2_milli, way_id, seg_idx) — deterministic,
  engine-independent ordering, one window exchange.

Plan: one cell-join exchange + one point-window exchange, no Python.
The brute-force DuckDB oracle formulation (all pairs, no cells) pins
that the cover never loses a candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# shifts coordinates non-negative so integer DIV == floor division
# (Spark DIV truncates toward zero); bounds the exact-arithmetic proof
_OFF = 1 << 20


def _d2_milli_expr() -> str:
    """floor(1000·d²(P, seg AB)) in pure int64 arithmetic.
    num/den is d²: interior case den=len2, clamp cases den=1."""
    return """
    CASE WHEN len2 = 0 OR dot <= 0 THEN 1000 * (apx*apx + apy*apy)
         WHEN dot >= len2 THEN
           1000 * ((x-bx)*(x-bx) + (y-by)*(y-by))
         ELSE
           ((apx*apx + apy*apy) * len2 - dot*dot) DIV len2 * 1000
           + (((apx*apx + apy*apy) * len2 - dot*dot) % len2) * 1000 DIV len2
    END
    """


def _snap_candidates(
    points: DataFrame,
    segments: DataFrame,
    cell: int,
    max_dist: int,
    extra_cols: list[str],
) -> DataFrame:
    """All (point, segment) candidates within max_dist with their exact
    d2_milli — the shared cover+refine behind snap_points_to_segments
    (top-1) and match_trajectories (Viterbi over top-K)."""
    seg_cells = segments.selectExpr(
        "way_id",
        "seg_idx",
        "ax",
        "ay",
        "bx",
        "by",
        f"sequence((least(ax, bx) - {max_dist} + {_OFF}) DIV {cell},"
        f"         (greatest(ax, bx) + {max_dist} + {_OFF}) DIV {cell})"
        " AS cxs",
        f"sequence((least(ay, by) - {max_dist} + {_OFF}) DIV {cell},"
        f"         (greatest(ay, by) + {max_dist} + {_OFF}) DIV {cell})"
        " AS cys",
    ).selectExpr(
        "way_id", "seg_idx", "ax", "ay", "bx", "by",
        "explode(cxs) AS cx", "cys",
    ).selectExpr(
        "way_id", "seg_idx", "ax", "ay", "bx", "by",
        "cx", "explode(cys) AS cy",
    )

    pts = points.selectExpr(
        *extra_cols,
        "point_id",
        "x",
        "y",
        f"(x + {_OFF}) DIV {cell} AS cx",
        f"(y + {_OFF}) DIV {cell} AS cy",
    )

    return (
        pts.join(seg_cells, ["cx", "cy"])
        .selectExpr(
            *extra_cols,
            "point_id",
            "way_id",
            "seg_idx",
            "x", "y", "bx", "by",
            "x - ax AS apx",
            "y - ay AS apy",
            "bx - ax AS abx",
            "by - ay AS aby",
        )
        .selectExpr(
            *extra_cols,
            "point_id", "way_id", "seg_idx", "x", "y", "bx", "by",
            "apx", "apy",
            "apx*abx + apy*aby AS dot",
            "abx*abx + aby*aby AS len2",
        )
        .selectExpr(
            *extra_cols,
            "point_id",
            "way_id",
            "seg_idx",
            f"({_d2_milli_expr()}) AS d2_milli",
        )
        .where(f"d2_milli <= {1000 * max_dist * max_dist}")
    )


def snap_points_to_segments(
    points: DataFrame,
    segments: DataFrame,
    *,
    cell: int = 256,
    max_dist: int = 128,
) -> DataFrame:
    """points (point_id, x, y) × segments (way_id, seg_idx, ax, ay, bx,
    by) → (point_id, way_id, seg_idx, d2_milli) for each point whose
    nearest segment lies within max_dist.  Integer pixel coordinates,
    |coord| < 2^15 (keeps d²·len2 < 2^62)."""
    cand = _snap_candidates(points, segments, cell, max_dist, [])
    w = Window.partitionBy("point_id").orderBy("d2_milli", "way_id", "seg_idx")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("point_id", "way_id", "seg_idx", "d2_milli")
    )


def match_trajectories(
    points: DataFrame,
    segments: DataFrame,
    *,
    cell: int = 256,
    max_dist: int = 128,
    top_k: int = 4,
    switch_penalty: int = 10_000_000,
) -> DataFrame:
    """HMM-style (Viterbi) trajectory map matching: points
    (traj_id, seq, x, y) → (traj_id, seq, way_id, seg_idx, d2_milli,
    total_cost) — the jointly-optimal segment assignment per
    trajectory, where path cost = Σ emission d2_milli + switch_penalty
    per way change between consecutive points.

    The simplification vs a full road-network HMM is documented: the
    transition model is a flat way-switch penalty, not route distance
    (the engine has no turn-restriction graph); what this keeps is the
    defining property snap-per-point lacks — a noisy ping near a wrong
    way is overridden by its neighbors.

    Determinism: all costs are integers, candidates are the top_k by
    (d2_milli, way_id, seg_idx), and among equal-cost paths the
    lexicographically-first (way_id, seg_idx) SEQUENCE wins — the DP
    carries (cost, prefix) pairs, which is sound because prefixes of
    equal length compare positionally (the oracle enumerates all paths
    and sorts; the kernel must agree exactly).

    Trajectories where ANY point has no candidate within max_dist are
    dropped whole (partial matches are ambiguous; callers pre-split).

    Plan: cover join → top-k window → ONE applyInPandas per trajectory
    (group size = seq_len·top_k rows — bounded, never corpus-sized)."""
    import pandas as pd

    cand = _snap_candidates(
        points.selectExpr(
            "traj_id", "seq", "concat(traj_id, ':', seq) AS point_id",
            "x", "y",
        ),
        segments,
        cell,
        max_dist,
        ["traj_id", "seq"],
    )
    w = Window.partitionBy("point_id").orderBy("d2_milli", "way_id", "seg_idx")
    topk = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(f"rn <= {top_k}")
        .select("traj_id", "seq", "way_id", "seg_idx", "d2_milli")
    )

    n_points = points.groupBy("traj_id").agg(
        F.count("*").alias("n_seq")
    )
    full = topk.join(n_points, "traj_id")

    def viterbi(key, g: pd.DataFrame) -> pd.DataFrame:
        cols = ["traj_id", "seq", "way_id", "seg_idx", "d2_milli",
                "total_cost"]
        n_seq = int(g["n_seq"].iloc[0])
        by_seq: dict[int, list] = {}
        for r in g.itertuples(index=False):
            by_seq.setdefault(int(r.seq), []).append(
                (int(r.way_id), int(r.seg_idx), int(r.d2_milli))
            )
        seqs = sorted(by_seq)
        if len(seqs) != n_seq:  # some point had zero candidates
            return pd.DataFrame(columns=cols)
        # DP state per candidate: (cost, prefix_tuple_of_(way,seg), way)
        states = [
            (d2, ((wid, sidx),), wid)
            for wid, sidx, d2 in sorted(by_seq[seqs[0]])
        ]
        for s in seqs[1:]:
            nxt = []
            for wid, sidx, d2 in sorted(by_seq[s]):
                best = None
                for cost, prefix, pw in states:
                    c = cost + d2 + (switch_penalty if pw != wid else 0)
                    k2 = (c, prefix + ((wid, sidx),))
                    if best is None or k2 < best:
                        best = k2
                nxt.append((best[0], best[1], wid))
            states = nxt
        cost, path, _ = min(states, key=lambda t: (t[0], t[1]))
        rows = [
            (key[0], s, wid, sidx,
             dict(((w_, s_), d_) for w_, s_, d_ in by_seq[s])[(wid, sidx)],
             cost)
            for s, (wid, sidx) in zip(seqs, path)
        ]
        return pd.DataFrame(rows, columns=cols)

    return full.groupBy("traj_id").applyInPandas(
        viterbi,
        schema=(
            "traj_id long, seq long, way_id long, seg_idx long, "
            "d2_milli long, total_cost long"
        ),
    )
