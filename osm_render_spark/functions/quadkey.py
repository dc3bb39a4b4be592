"""Quadkey tile addressing as shared-dialect SQL — the Bing-maps
string key for z/x/y tiles (public scheme: digit i of the z-digit
base-4 string is bit i of ty times 2 plus bit i of tx, MSB first).

Quadkeys are the STRING-prefix form of the engine's integer tile_key
(functions/projection.tile_key_sql): truncating a quadkey by one digit
is EXACTLY the parent tile in the pyramid (raster/pyramid.rollup_level
arithmetic), so prefix predicates express subtree scans — `WHERE
quadkey LIKE '0231%'` prunes to one zoom-4 tile's descendants the same
way tile_key ranges prune row groups (S6).

Pure closed-form arithmetic on the already-clamped tile_x/tile_y
expressions: DIV/% bit picks + CONCAT of single-char substrings — the
Spark∩DuckDB subset, so ONE text is both the engine path (codegen, no
UDF) and the oracle.  Compute tx/ty once (withColumn) before inlining;
the expression references them z times each (the geohash.py contract).
"""

from __future__ import annotations


def quadkey_from_xy_sql(tx: str, ty: str, zoom: int) -> str:
    """Base-4 quadkey string of a tile-coordinate pair at ``zoom``."""
    if zoom < 1:
        raise ValueError("quadkey needs zoom >= 1")
    digits = []
    for i in range(zoom):
        shift = 1 << (zoom - 1 - i)
        # FLOOR(x / 2^s) instead of an integer-div operator: Spark DIV
        # has no DuckDB twin and DuckDB // has no Spark twin; the float
        # form is exact below 2^53 and both engines share it (the
        # geohash.py discipline)
        d = (
            f"CAST(FLOOR(({tx}) / {shift}) % 2"
            f" + 2 * (FLOOR(({ty}) / {shift}) % 2) AS INT)"
        )
        digits.append(f"substr('0123', 1 + {d}, 1)")
    return "CONCAT(" + ", ".join(digits) + ")"


def quadkey_py(tx: int, ty: int, zoom: int) -> str:
    """Python twin for goldens/tests (same bit-pick formulation)."""
    return "".join(
        "0123"[((tx >> (zoom - 1 - i)) & 1) + 2 * ((ty >> (zoom - 1 - i)) & 1)]
        for i in range(zoom)
    )
