"""Property-based tests (SURVEY.md §5.2 #3): projection round-trips,
delta-decode inverse, tile containment."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_render_spark.functions.cells import merc_xy, tile_xy
from osm_render_spark.functions.projection import MERC_MAX_LAT

finite_lon = st.floats(-180.0, 180.0, allow_nan=False)
finite_lat = st.floats(-MERC_MAX_LAT, MERC_MAX_LAT, allow_nan=False)


@given(lon=finite_lon, lat=finite_lat, zoom=st.integers(0, 18))
@settings(max_examples=200, deadline=None)
def test_mercator_round_trip(lon, lat, zoom):
    """P8 generalized: merc forward then inverse recovers lon/lat within
    float tolerance."""
    x, y = merc_xy(np.array([lon]), np.array([lat]), zoom)
    n = 1 << zoom
    lon2 = x[0] / n * 360.0 - 180.0
    lat2 = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y[0] / n))))
    assert abs(lon2 - lon) < 1e-9 * max(1.0, abs(lon)) + 1e-9
    assert abs(lat2 - lat) < 1e-6


@given(lon=finite_lon, lat=finite_lat, zoom=st.integers(0, 16))
@settings(max_examples=200, deadline=None)
def test_tile_contains_its_point(lon, lat, zoom):
    """A point's tile square must contain its continuous merc coords."""
    tx, ty = tile_xy(np.array([lon]), np.array([lat]), zoom)
    x, y = merc_xy(np.array([lon]), np.array([lat]), zoom)
    n = 1 << zoom
    assert 0 <= tx[0] < n and 0 <= ty[0] < n
    # containment (up to the clamp at the antimeridian/pole edges)
    if 0 < x[0] < n:
        assert tx[0] <= x[0] <= tx[0] + 1
    if 0 < y[0] < n:
        assert ty[0] <= y[0] <= ty[0] + 1


@given(
    start=st.integers(-(10**12), 10**12),
    deltas=st.lists(st.integers(-(10**6), 10**6), min_size=1, max_size=200),
)
@settings(max_examples=100, deadline=None)
def test_delta_decode_inverse(start, deltas):
    """W1 (MapData.m:96-100): decode(encode(xs)) == xs. Encode = first
    value + successive differences; decode = cumulative sum."""
    xs = np.cumsum(np.array([start] + deltas, dtype=np.int64))
    encoded = np.diff(xs, prepend=0)
    decoded = np.cumsum(encoded)
    assert (decoded == xs).all()


def test_mercator_three_way_bitwise_agreement(spark):
    """The three mercator encodings (shared SQL text, Column-lambda in
    raster/ops, numpy in functions/cells) must agree BITWISE — a drift in
    any copy silently misassigns tiles."""
    import pandas as pd
    from pyspark.sql import functions as F

    from osm_render_spark.functions.projection import merc_x_sql, merc_y_sql
    from osm_render_spark.raster.ops import _merc_x, _merc_y

    zoom = 11
    lons = np.linspace(-179.9, 179.9, 41)
    lats = np.linspace(-88.0, 88.0, 41)
    pdf = pd.DataFrame({"lon": lons, "lat": lats})
    df = spark.createDataFrame(pdf)
    rows = df.select(
        F.expr(merc_x_sql("lon", zoom)).alias("sx"),
        F.expr(merc_y_sql("lat", zoom)).alias("sy"),
        _merc_x(F.col("lon"), zoom).alias("cx"),
        _merc_y(F.col("lat"), zoom).alias("cy"),
    ).collect()
    nx, ny = merc_xy(lons, lats, zoom)
    for i, r in enumerate(rows):
        # the two JVM encodings must agree BITWISE; numpy's libm differs
        # from JVM Math by a few ulps on tan/log, so the numpy mirror is
        # held to a tight relative tolerance instead (tile assignment is
        # insensitive: floor boundaries are measure-zero)
        assert r["sx"] == r["cx"]
        assert r["sy"] == r["cy"]
        assert nx[i] == r["sx"]  # pure arithmetic: exact everywhere
        assert abs(ny[i] - r["sy"]) <= 1e-11 * max(1.0, abs(r["sy"]))


@given(lat=st.floats(-90, 90, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_latitude_clamp_monotonic(lat):
    """Mercator y is monotone decreasing in latitude (y-down, W2/P8)."""
    y1 = merc_xy(np.array([0.0]), np.array([lat]), 10)[1][0]
    y2 = merc_xy(np.array([0.0]), np.array([min(lat + 1.0, 90.0)]), 10)[1][0]
    assert y2 <= y1 + 1e-12


# ---------------------------------------------------------------------------
# overflow-safe SQL XOR identity (queries._phash_rows_sql)
# ---------------------------------------------------------------------------

@given(
    x=st.integers(min_value=0, max_value=(1 << 63) - 1),
    m=st.integers(min_value=0, max_value=(1 << 62) - 1),
)
def test_carry_identity_xor_overflow_safe(x, m):
    """(x - (x&m)) + (m - (x&m)) == x ^ m with every intermediate inside
    signed-int64 — the association the phash oracle SQL uses. The naive
    x + m - 2*(x&m) overflows when x+m >= 2^63 (the bug a review caught
    at sf0.1); this form's first operand clears m's bits from x, so the
    sum IS the XOR and never exceeds max(x, x^m) < 2^63 when the final
    result fits."""
    a = x - (x & m)
    b = m - (x & m)
    assert a >= 0 and b >= 0
    assert a + b == x ^ m
    if (x ^ m) < (1 << 63):
        # every intermediate fits signed int64
        for v in (a, b, a + b):
            assert -(1 << 63) <= v < (1 << 63)


@given(
    x0=st.integers(0, 300),
    dx=st.integers(0, 60),
    y0=st.integers(0, 300),
    dy=st.integers(0, 60),
    budget=st.sampled_from([2, 7, 64, 10**9]),
)
@settings(max_examples=60, deadline=None)
def test_bbox_morton_ranges_properties(x0, dx, y0, dy, budget):
    """Quadtree Z-range decomposition invariants under fuzz: ranges are
    sorted/disjoint, within the hard budget, a SUPERSET of the bbox's
    exact Morton set at any budget, and EXACT when unbudgeted."""
    from osm_render_spark.functions.zorder import _morton_py, bbox_morton_ranges

    x1, y1 = x0 + dx, y0 + dy
    rs = bbox_morton_ranges(x0, x1, y0, y1, max_ranges=budget)
    assert len(rs) <= budget
    assert all(rs[i][1] < rs[i + 1][0] for i in range(len(rs) - 1))
    want = {_morton_py(x, y) for x in range(x0, x1 + 1) for y in range(y0, y1 + 1)}
    got = set()
    for lo, hi in rs:
        got.update(range(lo, hi + 1))
    assert got >= want
    if budget >= 10**9:
        assert got == want


@given(data=st.binary(max_size=4000))
@settings(max_examples=300, deadline=None)
def test_lz4_roundtrip_property(data):
    """LZ4 block codec: compress∘decompress is the identity for ANY
    byte string (the compressor's end-of-block restrictions and the
    decompressor's overlap copies fuzzed together)."""
    from osm_render_spark.sources.lz4 import (
        lz4_compress_block,
        lz4_decompress_block,
    )

    assert lz4_decompress_block(lz4_compress_block(data), len(data)) == data


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
    block=st.sampled_from([192, 256, 1000, 4096]),
)
@settings(max_examples=150, deadline=None)
def test_flac_roundtrip_property(samples, block):
    """FLAC: encode∘decode is lossless for ANY int16 signal and block
    size — fuzzes the predictor-order cost ranking (constant / FIXED
    0-2 / verbatim / rice-escape arbitration) the fixed test corpus
    can't enumerate."""
    from osm_render_spark.raster.flac import decode_flac, encode_flac

    pcm = np.array(samples, dtype=np.int16)
    dec, rate, bps = decode_flac(encode_flac(pcm, 8000, block=block))
    assert (dec[:, 0] == pcm).all()
    assert (rate, bps) == (8000, 16)
