"""Geohash encoding as shared-dialect SQL — the string-keyed sibling of
the Morton key (functions/zorder.py) for spatial bucketing, prefix
joins, and interoperable cell ids.

A geohash is the base-32 rendering of the interleaved binary-bisection
bits of (lon, lat), longitude first — truncating the string widens the
cell, so prefix equality is a proximity bucket (the property LSH-style
spatial joins key on).  The encoding here is pure closed-form integer
arithmetic: quantize each axis once (the idx of the final bisection
cell is floor((v - lo) / range · 2^bits)), then assemble each output
character from five single-bit CASE tests — only ``&``, ``+``, CASE,
``substr`` and CONCAT, the subset Spark SQL and DuckDB share, so ONE
SQL text is both the engine implementation (whole-stage codegen, no
UDF) and the oracle.  Works for odd precisions (the canonical 5-char
test vectors) — unlike a spread-ladder interleave, per-character bit
picking never needs equal lon/lat widths.

Scale note: the expression references the idx columns 5p/2 times each
— compute lon_idx/lat_idx once in a CTE / withColumn (simple column
refs), exactly like _spread16_sql's inlining contract."""

from __future__ import annotations

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def lon_idx_sql(lon: str, p: int) -> str:
    b = (5 * p + 1) // 2
    return _idx_sql(lon, 180, 360, b)


def lat_idx_sql(lat: str, p: int) -> str:
    b = (5 * p) // 2
    return _idx_sql(lat, 90, 180, b)


def _idx_sql(v: str, off: int, rng: int, b: int) -> str:
    """floor((v + off) / rng * 2^b), clamped into [0, 2^b): the index of
    the axis's final bisection interval (the upper domain edge folds
    into the last cell, as bisection does)."""
    return (
        f"LEAST(CAST(FLOOR((({v}) + CAST({off} AS DOUBLE))"
        f" / CAST({rng} AS DOUBLE) * CAST({1 << b} AS DOUBLE)) AS BIGINT),"
        f" {(1 << b) - 1})"
    )


def geohash_chars_sql(lon_idx: str, lat_idx: str, p: int) -> str:
    """Base-32 string from pre-computed axis indices (simple column
    refs!).  Bit t of the 5p-bit stream (MSB first) is a longitude bit
    for even t, latitude for odd t."""
    b_lon, b_lat = (5 * p + 1) // 2, (5 * p) // 2
    chars = []
    for i in range(p):
        terms = []
        for j in range(5):
            t = 5 * i + j
            if t % 2 == 0:
                src, bit = lon_idx, b_lon - 1 - t // 2
            else:
                src, bit = lat_idx, b_lat - 1 - (t - 1) // 2
            terms.append(
                f"CASE WHEN (({src}) & {1 << bit}) > 0"
                f" THEN {1 << (4 - j)} ELSE 0 END"
            )
        chars.append(
            f"substr('{ALPHABET}', 1 + ({' + '.join(terms)}), 1)"
        )
    return f"CONCAT({', '.join(chars)})"


def geohash_sql(lat: str, lon: str, p: int) -> str:
    """One-shot form for simple column-ref inputs.  For computed
    coordinates, CTE lon_idx_sql/lat_idx_sql first and use
    geohash_chars_sql (each idx is referenced ~5p/2 times)."""
    return geohash_chars_sql(lon_idx_sql(lon, p), lat_idx_sql(lat, p), p)


def geohash_py(lat: float, lon: float, p: int) -> str:
    """Independent reference: the textbook bisection loop (not the
    closed form above) — tests pin SQL == bisection on the canonical
    public vectors and random points."""
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    out, digit, nbits, even = [], 0, 0, True
    while len(out) < p:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                digit, lon_lo = digit * 2 + 1, mid
            else:
                digit, lon_hi = digit * 2, mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                digit, lat_lo = digit * 2 + 1, mid
            else:
                digit, lat_hi = digit * 2, mid
        even, nbits = not even, nbits + 1
        if nbits == 5:
            out.append(ALPHABET[digit])
            digit = nbits = 0
    return "".join(out)


def add_geohash(df, lat_col: str, lon_col: str, p: int, out_col: str = "geohash"):
    """DataFrame helper: append the geohash cell of (lat_col, lon_col)
    via the shared SQL (codegen Column arithmetic — no UDF).  The idx
    projections materialize once as intermediate columns."""
    from pyspark.sql import functions as F

    return (
        df.withColumn("_ghlon", F.expr(lon_idx_sql(lon_col, p)))
        .withColumn("_ghlat", F.expr(lat_idx_sql(lat_col, p)))
        .withColumn(out_col, F.expr(geohash_chars_sql("_ghlon", "_ghlat", p)))
        .drop("_ghlon", "_ghlat")
    )
