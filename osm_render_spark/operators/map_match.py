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
        "point_id",
        "x",
        "y",
        f"(x + {_OFF}) DIV {cell} AS cx",
        f"(y + {_OFF}) DIV {cell} AS cy",
    )

    cand = (
        pts.join(seg_cells, ["cx", "cy"])
        .selectExpr(
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
            "point_id", "way_id", "seg_idx", "x", "y", "bx", "by",
            "apx", "apy",
            "apx*abx + apy*aby AS dot",
            "abx*abx + aby*aby AS len2",
        )
        .selectExpr(
            "point_id",
            "way_id",
            "seg_idx",
            f"({_d2_milli_expr()}) AS d2_milli",
        )
        .where(f"d2_milli <= {1000 * max_dist * max_dist}")
    )
    w = Window.partitionBy("point_id").orderBy("d2_milli", "way_id", "seg_idx")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("point_id", "way_id", "seg_idx", "d2_milli")
    )
