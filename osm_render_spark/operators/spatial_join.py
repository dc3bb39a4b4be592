"""Distance-threshold spatial range join (cell-bucketed, exact refine).

The prompt-level "range join" shape: all (query, point) pairs within a
radius.  A naive theta-join is O(|Q|·|P|) — the classic scale-killer.
This operator grids the plane into radius-sized cells: every point lands
in exactly ONE cell, every query expands to its 3×3 cell neighborhood
(a 9× fan-out of the SMALL side only), and the pair space collapses to
an equi-join on (cell_x, cell_y) followed by an exact distance refine.
Any qualifying pair is guaranteed to meet in exactly one (point-cell,
query-neighbor-cell) bucket — |Δlon| ≤ dist < r bounds the cell offset
to ±1 — so no dedup pass is needed.

100 TB shape: ONE shuffle per side on the cell key (or ZERO shuffles of
the big side when the exploded query side fits a broadcast — `hint=
"broadcast"`); candidate volume is density-bounded (points within the
9r² neighborhood), never |Q|·|P|.  Skewed cells (urban cores) are plain
equi-join skew — AQE's skew-join splitting applies; the refine predicate
is whole-stage-codegen Column arithmetic.

Geometry is planar degrees (no antimeridian / pole wrap): the engine's
synthetic lon/lat tables never straddle ±180, and the reference's bbox
predicates (predicates.py P1) share the same planar convention.  The
refine expression text is exported (`dist_sq_sql`) so the DuckDB oracle
evaluates the byte-identical IEEE expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dist_sq_sql(qlon: str, qlat: str, plon: str, plat: str) -> str:
    """Squared planar distance — ONE shared expression text for Spark
    and DuckDB (identical IEEE mul/add tree ⇒ bitwise-equal doubles)."""
    return (
        f"(({qlon}) - ({plon})) * (({qlon}) - ({plon}))"
        f" + (({qlat}) - ({plat})) * (({qlat}) - ({plat}))"
    )


_OFFSETS = ", ".join(
    f"struct({dx} AS dx, {dy} AS dy)" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
)


def distance_join(
    queries: DataFrame,
    points: DataFrame,
    radius: float,
    query_id: str = "qid",
    point_id: str = "pid",
    lon: str = "lon",
    lat: str = "lat",
    hint: str = "auto",
) -> DataFrame:
    """Pairs (query_id, point_id, dist_sq) with planar distance < radius
    (strict), excluding self-pairs (query_id == point_id).  `hint`:
    "broadcast" broadcasts the exploded query side (the big side never
    shuffles), "shuffle" forces the keyed equi-join, "auto" leaves the
    choice to Catalyst/AQE statistics."""
    r = float(radius)

    def cell(c):
        return F.floor(F.col(c) / F.lit(r)).cast("long")

    p = points.select(
        F.col(point_id).alias("pid"),
        F.col(lon).alias("plon"),
        F.col(lat).alias("plat"),
        cell(lon).alias("cx"),
        cell(lat).alias("cy"),
    )
    q = (
        queries.select(
            F.col(query_id).alias("qid"),
            F.col(lon).alias("qlon"),
            F.col(lat).alias("qlat"),
            cell(lon).alias("qcx"),
            cell(lat).alias("qcy"),
        )
        .select("*", F.explode(F.expr(f"array({_OFFSETS})")).alias("o"))
        .select(
            "qid",
            "qlon",
            "qlat",
            (F.col("qcx") + F.col("o.dx")).alias("cx"),
            (F.col("qcy") + F.col("o.dy")).alias("cy"),
        )
    )
    if hint == "broadcast":
        q = F.broadcast(q)
    elif hint == "shuffle":
        q = q.hint("shuffle_hash")
    refine = F.expr(dist_sq_sql("qlon", "qlat", "plon", "plat"))
    return (
        q.join(p, ["cx", "cy"])
        .withColumn("dist_sq", refine)
        .filter((F.col("dist_sq") < F.lit(r * r)) & (F.col("qid") != F.col("pid")))
        .select("qid", "pid", "dist_sq")
    )
