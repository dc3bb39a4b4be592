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
  engine-independent ordering, as a min(struct) aggregation that
  combines map-side (the shuffle carries ≤1 row per point per task,
  not the candidate fan-out).

Plan: one cell-join exchange + one partial-agg exchange, no Python.
The brute-force DuckDB oracle formulation (all pairs, no cells) pins
that the cover never loses a candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    key_cols: list[str],
) -> DataFrame:
    """All (point, segment) candidates within max_dist with their exact
    d2_milli — the shared cover+refine behind snap_points_to_segments
    (top-1) and match_trajectories (Viterbi over top-K). ``key_cols``
    identify the point (``["point_id"]`` / ``["traj_id", "seq"]``).

    A cheap expanded-bbox prefilter runs right at the cell join (guide
    §3: cut join output before the expensive refine): d ≤ max_dist
    implies the point lies in the segment bbox grown by max_dist, so
    the filter is a superset of the exact d2 test and drops most of a
    cell's non-candidates with 4 comparisons before the integer d2
    expression and the downstream aggregation ever see them.

    Per-segment invariants (bbox bounds, abx/aby/len2) are computed
    BELOW the join on the segment side, so the d2 filter that Catalyst
    pushes into the join condition references plain attributes rather
    than re-expanded arithmetic — without this the fused
    WholeStageCodegen method blows past the JVM JIT's huge-method
    threshold and the whole join stage runs in the bytecode
    interpreter (measured 10 s vs 2.7 s on the bench viterbi cover;
    guide §7.2 'duplicated subtrees').

    The y axis joins at cell/4 granularity (x stays at ``cell``): a
    segment's max_dist-grown bbox covers ~2-3 quarter-bands instead of
    1-2 full cells, so the segment index grows ~2x, but each point
    probes a 4x thinner slab — the (point, segment) join output (the
    quadratic term a denser cell would otherwise pay) shrinks ~4x.
    Pure cover refinement: the exact d2 filter is unchanged, so the
    candidate SET is identical."""
    ycell = max(cell // 4, 1)
    seg_cells = segments.selectExpr(
        "way_id",
        "seg_idx",
        "ax",
        "ay",
        "bx",
        "by",
        f"least(ax, bx) - {max_dist} AS xlo",
        f"greatest(ax, bx) + {max_dist} AS xhi",
        f"least(ay, by) - {max_dist} AS ylo",
        f"greatest(ay, by) + {max_dist} AS yhi",
        "bx - ax AS abx",
        "by - ay AS aby",
        "(bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS len2",
        f"sequence((least(ax, bx) - {max_dist} + {_OFF}) DIV {cell},"
        f"         (greatest(ax, bx) + {max_dist} + {_OFF}) DIV {cell})"
        " AS cxs",
        f"sequence((least(ay, by) - {max_dist} + {_OFF}) DIV {ycell},"
        f"         (greatest(ay, by) + {max_dist} + {_OFF}) DIV {ycell})"
        " AS cys",
    ).selectExpr(
        "way_id", "seg_idx", "ax", "ay", "bx", "by",
        "xlo", "xhi", "ylo", "yhi", "abx", "aby", "len2",
        "explode(cxs) AS cx", "cys",
    ).selectExpr(
        "way_id", "seg_idx", "ax", "ay", "bx", "by",
        "xlo", "xhi", "ylo", "yhi", "abx", "aby", "len2",
        "cx", "explode(cys) AS cy",
    )

    pts = points.selectExpr(
        *key_cols,
        "x",
        "y",
        f"(x + {_OFF}) DIV {cell} AS cx",
        f"(y + {_OFF}) DIV {ycell} AS cy",
    )

    return (
        pts.join(seg_cells, ["cx", "cy"])
        .where("x >= xlo AND x <= xhi AND y >= ylo AND y <= yhi")
        .selectExpr(
            *key_cols,
            "way_id",
            "seg_idx",
            "x", "y", "bx", "by",
            "x - ax AS apx",
            "y - ay AS apy",
            "abx",
            "aby",
            "len2",
        )
        .selectExpr(
            *key_cols,
            "way_id", "seg_idx", "x", "y", "bx", "by",
            "apx", "apy",
            "apx*abx + apy*aby AS dot",
            "len2",
        )
        .selectExpr(
            *key_cols,
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
    |coord| < 2^15 (keeps d²·len2 < 2^62).

    Top-1 is ``min(struct(d2_milli, way_id, seg_idx))`` — the same
    deterministic (d2, way, seg) ordering the old row_number window
    used, but as an aggregation it combines MAP-SIDE (guide §2.3):
    each task ships one candidate per point instead of shuffling the
    full candidate fan-out to a window sort."""
    cand = _snap_candidates(points, segments, cell, max_dist, ["point_id"])
    return (
        cand.groupBy("point_id")
        .agg(F.min(F.struct("d2_milli", "way_id", "seg_idx")).alias("_b"))
        .select(
            "point_id",
            F.col("_b.way_id").alias("way_id"),
            F.col("_b.seg_idx").alias("seg_idx"),
            F.col("_b.d2_milli").alias("d2_milli"),
        )
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

    Plan (r7): cover join → per-(traj, seq) top-k as ONE hash-agg
    (``slice(array_sort(collect_list(struct(d2, way, seg))), 1, k)`` —
    the same deterministic top-k set the old row_number window
    produced, without the window sort, and one row per POINT crosses
    the shuffle instead of top_k rows) → broadcast n_seq join → the
    Viterbi DP in a single streaming mapInPandas kernel over
    traj_id-sorted partitions (many trajectories per Arrow batch). The
    old one-applyInPandas-group-per-trajectory shape paid ~4 ms of
    per-group overhead, which at 25k bench trajectories was ~100 s of
    pure overhead (guide §4.5); the DP itself is unchanged and
    produces identical rows."""
    cand = _snap_candidates(
        points.selectExpr("traj_id", "seq", "x", "y"),
        segments,
        cell,
        max_dist,
        ["traj_id", "seq"],
    )
    topk = cand.groupBy("traj_id", "seq").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct("d2_milli", "way_id", "seg_idx"))
            ),
            1,
            top_k,
        ).alias("cands")
    )

    n_points = points.groupBy("traj_id").agg(
        F.count("*").alias("n_seq")
    )
    full = topk.join(F.broadcast(n_points), "traj_id")

    def viterbi_rows(
        traj: int, n_seq: int, group: list[tuple]
    ) -> list[tuple]:
        if len(group) != n_seq:  # some point had zero candidates
            return []
        # per-seq candidate lists (wid, sidx, d2) — cands arrive sorted
        # by (d2, way, seg); the DP takes min over ALL (prev, cand)
        # combinations by (cost, prefix), so iteration order is free
        by_seq = sorted(
            (
                int(s),
                [
                    (int(c["way_id"]), int(c["seg_idx"]), int(c["d2_milli"]))
                    for c in cl
                ],
            )
            for s, cl in group
        )
        # DP state per candidate: (cost, prefix_tuple_of_(way,seg), way)
        states = [
            (d2, ((wid, sidx),), wid)
            for wid, sidx, d2 in by_seq[0][1]
        ]
        for _s, cands in by_seq[1:]:
            nxt = []
            for wid, sidx, d2 in cands:
                best = None
                for cost, prefix, pw in states:
                    c = cost + d2 + (switch_penalty if pw != wid else 0)
                    k2 = (c, prefix + ((wid, sidx),))
                    if best is None or k2 < best:
                        best = k2
                nxt.append((best[0], best[1], wid))
            states = nxt
        cost, path, _ = min(states, key=lambda t: (t[0], t[1]))
        return [
            (traj, s, wid, sidx,
             {(w_, s_): d_ for w_, s_, d_ in cands}[(wid, sidx)],
             cost)
            for (s, cands), (wid, sidx) in zip(by_seq, path)
        ]

    # single-pass streaming kernel over traj_id-sorted partitions:
    # groups are consecutive, so one python zip-iteration flushes each
    # trajectory's buffered rows on key change — no per-group pandas
    # sub-frame (~0.4 ms each, the residual cost of the generic
    # buffered_group_flatmap measured at 25k groups; guide §4.2: keep
    # the per-row python to plain tuples)
    import pandas as pd

    n_part = max(full.sparkSession.sparkContext.defaultParallelism, 8)
    arranged = full.repartition(n_part, "traj_id").sortWithinPartitions(
        "traj_id"
    )
    out_cols = ["traj_id", "seq", "way_id", "seg_idx", "d2_milli",
                "total_cost"]

    def kernel(batches):
        cur_key = None
        cur_n = 0
        buf: list[tuple] = []
        out: list[tuple] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for traj, s, cl, ns in zip(
                pdf["traj_id"], pdf["seq"], pdf["cands"], pdf["n_seq"]
            ):
                if traj != cur_key:
                    if cur_key is not None:
                        out.extend(viterbi_rows(int(cur_key), cur_n, buf))
                    cur_key, cur_n, buf = traj, int(ns), []
                buf.append((s, cl))
            if len(out) > 8192:
                yield pd.DataFrame(out, columns=out_cols)
                out = []
        if cur_key is not None:
            out.extend(viterbi_rows(int(cur_key), cur_n, buf))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return arranged.mapInPandas(
        kernel,
        schema=(
            "traj_id long, seq long, way_id long, seg_idx long, "
            "d2_milli long, total_cost long"
        ),
    )
