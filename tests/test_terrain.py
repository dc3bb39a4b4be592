"""Terrain derivatives (raster/terrain.py) + GeoTIFF tile source
(sources/geotiff_source.py): the distributed halo-exchange result must
be IDENTICAL to the whole-array computation, the source's regrid must
be exact across strip/tile layouts, and the plans must carry exactly
one exchange per operator."""

import struct

import numpy as np
import pytest

from osm_render_spark.raster.geotiff import GeoRef, encode_geotiff
from osm_render_spark.raster.terrain import (
    dem_to_tiles,
    hillshade,
    horn_gradients,
    pad_clamp,
    slope_aspect_octant,
    terrain_tiles,
)
from osm_render_spark.sources.geotiff_source import (
    read_geotiff_tiles,
    tiff_segment_index,
)

RNG = np.random.default_rng(46)
T = 64


@pytest.fixture(scope="module")
def spark():
    from osm_render_spark.session import get_spark

    s = get_spark("test_terrain", cpus=4, shuffle_partitions=4)
    yield s


def _mosaic(h=128, w=192):
    return RNG.integers(-500, 4000, (h, w)).astype(np.int32)


def _tiles_df(spark, dem):
    return spark.createDataFrame(
        [(tx, ty, bytearray(b)) for tx, ty, b in dem_to_tiles(dem, T)],
        "tx long, ty long, dem binary",
    )


# ------------------------------------------------------- numpy kernels

def test_horn_hand_worked():
    """3×3 DEM worked by hand against the Horn 1981 stencil."""
    z = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=np.int32)
    gx, gy = horn_gradients(z)  # core is the single center pixel
    # gx = (3+2·6+9) − (1+2·4+7) = 24 − 16 = 8
    # gy = (7+2·8+9) − (1+2·2+3) = 32 − 8 = 24
    assert gx[0, 0] == 8 and gy[0, 0] == 24


def test_flat_dem_constant_hillshade():
    p = pad_clamp(np.full((20, 20), 1234, dtype=np.int32))
    hs = hillshade(p, altitude_deg=45.0)
    # flat: hs = 255·cos(45°) = 180.31 → floor(+.5) = 180, everywhere
    assert (hs == 180).all()


def test_hillshade_slope_orientation():
    """A plane RISING to the south-east tilts its surface normal toward
    the default NW (315°) sun — brighter than flat; rising to the
    north-west tilts away — darker."""
    y, x = np.mgrid[0:40, 0:40]
    rise_se = ((x + y) * 20).astype(np.int32)
    rise_nw = ((78 - x - y) * 20).astype(np.int32)
    flat = hillshade(pad_clamp(np.zeros((40, 40), np.int32)))[5, 5]
    assert hillshade(pad_clamp(rise_se), cellsize=1.0)[5, 5] > flat
    assert hillshade(pad_clamp(rise_nw), cellsize=1.0)[5, 5] < flat


def test_slope_aspect_octant():
    y, x = np.mgrid[0:10, 0:10]
    east_up = (x * 100).astype(np.int32)  # gx > 0, gy = 0 → octant 0
    sm, oc = slope_aspect_octant(pad_clamp(east_up))
    assert (oc[1:-1, 1:-1] == 0).all()
    # interior gx = 4·100·... Horn: (E−W) terms = 4·Δ = 4·100 → ·? check >0
    assert (sm[1:-1, 1:-1] > 0).all()
    flat = np.zeros((5, 5), np.int32)
    sm0, oc0 = slope_aspect_octant(pad_clamp(flat))
    assert (sm0 == 0).all() and (oc0 == 8).all()


# -------------------------------------------------- distributed == whole

def test_tiled_equals_whole_array_gradient_stats(spark):
    dem = _mosaic()
    gx, gy = horn_gradients(pad_clamp(dem))
    out = {
        (r.tx, r.ty): r
        for r in terrain_tiles(
            _tiles_df(spark, dem), T, mode="gradient_stats"
        ).collect()
    }
    assert len(out) == 6
    for (tx, ty), r in out.items():
        sl = np.s_[ty * T : (ty + 1) * T, tx * T : (tx + 1) * T]
        assert r.sum_z == int(dem[sl].astype(np.int64).sum())
        assert r.sum_abs_gx == int(np.abs(gx[sl]).sum())
        assert r.sum_abs_gy == int(np.abs(gy[sl]).sum())


def test_tiled_equals_whole_array_hillshade(spark):
    dem = _mosaic()
    ref = hillshade(pad_clamp(dem))
    for r in terrain_tiles(_tiles_df(spark, dem), T).collect():
        got = np.frombuffer(r.shade, np.uint8).reshape(T, T)
        sl = np.s_[r.ty * T : (r.ty + 1) * T, r.tx * T : (r.tx + 1) * T]
        assert (got == ref[sl]).all()


def test_single_tile_grid_clamps_everywhere(spark):
    dem = _mosaic(T, T)
    ref = hillshade(pad_clamp(dem))
    (row,) = terrain_tiles(_tiles_df(spark, dem), T).collect()
    assert (np.frombuffer(row.shade, np.uint8).reshape(T, T) == ref).all()


def test_terrain_single_exchange(spark):
    plan = terrain_tiles(
        _tiles_df(spark, _mosaic()), T, mode="gradient_stats"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# ------------------------------------------------------------- source

LAYOUTS = [
    dict(tile=(64, 64), compression="deflate", predictor=2),  # fast path
    dict(rows_per_strip=23, compression="lzw", predictor=2),
    dict(tile=(48, 32), compression="packbits"),
    dict(rows_per_strip=64, compression="none"),
]


def _write_files(tmp_path, n=4):
    dems, paths = {}, []
    for k in range(n):
        dem = RNG.integers(-100, 3000, (128, 192)).astype(np.int32)
        p = str(tmp_path / f"k{k}.tif")
        with open(p, "wb") as f:
            f.write(
                encode_geotiff(
                    dem, georef=GeoRef(7.0, 46.0, 0.01, 0.01),
                    **LAYOUTS[k % len(LAYOUTS)],
                )
            )
        dems[f"k{k}.tif"] = dem
        paths.append(p)
    return dems, paths


def test_segment_index_is_header_only(tmp_path):
    dems, paths = _write_files(tmp_path, 1)
    lay, segs = tiff_segment_index(paths[0])
    assert lay.tiled and (lay.seg_w, lay.seg_h) == (64, 64)
    assert len(segs) == 6  # 3×2 tiles of 64² over 192×128
    raw = open(paths[0], "rb").read()
    for _, off, cnt in segs:
        assert 0 < off and off + cnt <= len(raw)


def test_source_regrid_exact_all_layouts(spark, tmp_path):
    dems, paths = _write_files(tmp_path)
    df = read_geotiff_tiles(spark, paths, T)
    got = {
        (r.raster, r.tx, r.ty): np.frombuffer(r.dem, np.int32).reshape(T, T)
        for r in df.collect()
    }
    assert len(got) == 4 * 6
    for name, dem in dems.items():
        for ty in range(2):
            for tx in range(3):
                assert (
                    got[name, tx, ty]
                    == dem[ty * T : (ty + 1) * T, tx * T : (tx + 1) * T]
                ).all()


def test_source_fast_path_has_no_regrid_exchange(spark, tmp_path):
    """Aligned TIFF tiles skip the assembly groupBy: only the pointer
    index repartition exchanges; the misaligned path adds exactly one."""
    _, paths = _write_files(tmp_path)
    fast = read_geotiff_tiles(spark, [paths[0]], T)
    slow = read_geotiff_tiles(spark, [paths[1]], T)
    n_fast = fast._jdf.queryExecution().executedPlan().toString().count("Exchange")
    n_slow = slow._jdf.queryExecution().executedPlan().toString().count("Exchange")
    assert n_fast == 1 and n_slow == 2


def test_source_rejects_unaligned_extent(spark, tmp_path):
    dem = RNG.integers(0, 100, (100, 100)).astype(np.int32)
    p = str(tmp_path / "odd.tif")
    with open(p, "wb") as f:
        f.write(encode_geotiff(dem))
    with pytest.raises(ValueError, match="multiple of tile_px"):
        read_geotiff_tiles(spark, [p], T)


def test_source_float_dem_rounds_f6(spark, tmp_path):
    """float32 DEM samples land as floor(x+0.5) int32 (engine-wide F6)."""
    dem = np.full((64, 64), 12.5, dtype=np.float32)
    dem[0, 0] = -2.5
    p = str(tmp_path / "f.tif")
    with open(p, "wb") as f:
        f.write(encode_geotiff(dem, tile=(64, 64)))
    (row,) = read_geotiff_tiles(spark, [p], T).collect()
    a = np.frombuffer(row.dem, np.int32).reshape(T, T)
    assert a[0, 1] == 13 and a[0, 0] == -2


def test_source_to_terrain_end_to_end(spark, tmp_path):
    dems, paths = _write_files(tmp_path)
    tiles = read_geotiff_tiles(spark, paths, T)
    stats = terrain_tiles(
        tiles, T, mode="gradient_stats", raster_col="raster"
    ).collect()
    byk = {(r.raster, r.tx, r.ty): r for r in stats}
    assert len(byk) == 24
    for name, dem in dems.items():
        gx, gy = horn_gradients(pad_clamp(dem))
        for ty in range(2):
            for tx in range(3):
                r = byk[name, tx, ty]
                sl = np.s_[ty * T : (ty + 1) * T, tx * T : (tx + 1) * T]
                assert r.sum_abs_gx == int(np.abs(gx[sl]).sum())
                assert r.sum_abs_gy == int(np.abs(gy[sl]).sum())
