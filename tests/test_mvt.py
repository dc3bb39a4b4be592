"""MVT vector-tile sink: spec-documented command/zigzag fixtures,
winding correction, tag value types, round-trips, and the Spark
operator vs a single-process reference."""

from __future__ import annotations

import numpy as np

from osm_render_spark.raster.mvt import (
    _signed_area2,
    decode_geometry,
    decode_mvt,
    encode_geometry,
    encode_mvt,
    unzigzag,
    vector_tiles,
    zigzag,
)

from test_slippy import _ways


def test_spec_documented_examples():
    # MVT 2.1 §4.3.5.2 example linestring: MoveTo(2,2), LineTo(+0,+8),
    # LineTo(+8,+0) → [9, 4, 4, 18, 0, 16, 16, 0]
    assert encode_geometry("line", [2, 2, 10], [2, 10, 10]) == [
        9, 4, 4, 18, 0, 16, 16, 0,
    ]
    # §4.3.5.3 example polygon: (3,6) (8,12) (20,34) + ClosePath →
    # [9, 6, 12, 18, 10, 12, 24, 44, 15]
    assert encode_geometry("polygon", [3, 8, 20], [6, 12, 34]) == [
        9, 6, 12, 18, 10, 12, 24, 44, 15,
    ]
    # §4.3.1 zigzag examples
    assert zigzag(25) == 50 and zigzag(-25) == 49
    assert unzigzag(50) == 25 and unzigzag(49) == -25


def test_decode_is_spec_based_not_encoder_based():
    # hand-assembled stream (NOT produced by encode_geometry): two
    # MoveTo points then a 3-point LineTo run
    cmds = [
        (1 & 7) | (2 << 3), zigzag(1), zigzag(1), zigzag(4), zigzag(-2),
        (2 & 7) | (3 << 3), zigzag(2), zigzag(2), zigzag(0), zigzag(5),
        zigzag(-7), zigzag(0),
    ]
    ops = decode_geometry(cmds)
    assert ops == [
        ("move", [(1, 1), (5, -1)]),
        ("line", [(7, 1), (7, 6), (0, 6)]),
    ]


def test_polygon_winding_corrected():
    # CCW ring in y-down coords (negative surveyor area) gets re-wound
    xs, ys = [0, 0, 10, 10], [0, 10, 10, 0]
    assert _signed_area2(xs, ys) < 0
    cmds = encode_geometry("polygon", xs, ys)
    ops = decode_geometry(cmds)
    ring = ops[0][1] + ops[1][1]
    rx = [p[0] for p in ring]
    ry = [p[1] for p in ring]
    assert _signed_area2(rx, ry) > 0
    assert set(ring) == set(zip(xs, ys))  # same vertices, re-wound
    assert ops[-1] == ("close", [])


def test_tag_value_types_roundtrip():
    feats = [
        {
            "id": 1,
            "kind": "point",
            "xs": [5],
            "ys": [5],
            "tags": {
                "name": "pond",
                "rank": 3,
                "depth": -7,
                "score": 1.5,
                "visible": True,
            },
        }
    ]
    d = decode_mvt(encode_mvt({"poi": feats}))
    tags = d["poi"]["features"][0]["tags"]
    assert tags == {
        "name": "pond", "rank": 3, "depth": -7, "score": 1.5, "visible": True,
    }


def test_multi_layer_and_extent():
    blob = encode_mvt(
        {
            "water": [{"id": 1, "kind": "polygon", "xs": [0, 9, 9], "ys": [0, 0, 9]}],
            "roads": [{"id": 2, "kind": "line", "xs": [1, 8], "ys": [1, 8]}],
        },
        extent=512,
    )
    d = decode_mvt(blob)
    assert set(d) == {"water", "roads"}
    assert all(layer["extent"] == 512 and layer["version"] == 2 for layer in d.values())
    assert d["water"]["features"][0]["type"] == 3
    assert d["roads"]["features"][0]["type"] == 2


def test_spark_operator_matches_reference(spark):
    from osm_render_spark.functions.cells import merc_xy

    ZOOM, EXTENT = 10, 256
    ways = _ways(spark)
    rows = ways.collect()
    got = {
        (r["tile_x"], r["tile_y"]): r
        for r in vector_tiles(ways, ZOOM, extent=EXTENT).collect()
    }
    # single-process reference: same fan-out arithmetic in numpy
    n = 1 << ZOOM
    ref: dict = {}
    for r in rows:
        lons = np.array([p["lon"] for p in r["geometry"]])
        lats = np.array([p["lat"] for p in r["geometry"]])
        mx, my = merc_xy(lons, lats, ZOOM)
        tx0 = int(np.clip(np.floor(mx.min()), 0, n - 1))
        tx1 = int(np.clip(np.floor(mx.max()), 0, n - 1))
        ty0 = int(np.clip(np.floor(my.min()), 0, n - 1))
        ty1 = int(np.clip(np.floor(my.max()), 0, n - 1))
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                qx = np.floor((mx - tx) * EXTENT + 0.5).astype(np.int64)
                qy = np.floor((my - ty) * EXTENT + 0.5).astype(np.int64)
                ref.setdefault((tx, ty), []).append(
                    (int(r["way_id"]), str(r["kind"]), qx, qy)
                )
    assert set(got) == set(ref)
    for key, feats in ref.items():
        r = got[key]
        assert r["n_features"] == len(feats)
        want_digest = sum(int((qx * 31 + qy).sum()) for _, _, qx, qy in feats)
        assert r["coord_digest"] == want_digest, key
        layer = decode_mvt(bytes(r["bytes"]))["ways"]
        assert layer["extent"] == EXTENT
        by_id = {f["id"]: f for f in layer["features"]}
        for wid, kind, qx, qy in feats:
            f = by_id[wid]
            assert f["tags"]["kind"] == kind
            assert f["type"] == (3 if kind == "water" else 2)
            # decoded vertices = encoded integer coords (polygons may be
            # re-wound and drop the closing duplicate)
            ops = decode_geometry(f["geometry"])
            pts = [p for op, ps in ops for p in ps]
            want = list(zip(qx.tolist(), qy.tolist()))
            if f["type"] == 3 and want[0] == want[-1]:
                want = want[:-1]
            assert pts in (want, want[::-1]), wid


def test_operator_deterministic(spark):
    ways = _ways(spark)

    def digest():
        return sorted(
            (r["tile_key"], bytes(r["bytes"]))
            for r in vector_tiles(ways, 10, extent=256).collect()
        )

    assert digest() == digest()
