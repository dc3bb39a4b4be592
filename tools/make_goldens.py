"""Generate golden manifests (FIXTURES.md §7) from the INDEPENDENT
single-process oracle (fixtures.oracle + raster kernels run outside
Spark). Committed under tests/goldens/; tests/test_goldens.py asserts the
distributed engine reproduces them exactly (PNG: bit-exact, since engine
and oracle share the raster kernels; join rows: exact, order-insensitive).

Rerun: python tools/make_goldens.py  (output is deterministic — a diff
after rerun means semantics changed).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from osm_render_spark.fixtures.oracle import ways_in_rect_oracle  # noqa: E402
from osm_render_spark.fixtures.osm import ALL_SCENES  # noqa: E402
from osm_render_spark.functions.cells import tile_xy  # noqa: E402
from osm_render_spark.operators.pip import raycast_even_odd  # noqa: E402

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")

KNN_QUERIES = [(float(-170 + 40 * i), float(-60 + 15 * i)) for i in range(8)]
KNN_CANDS = [
    (float(((i * 73) % 340) - 170), float(((i * 97) % 160) - 80)) for i in range(200)
]
PIP_POINTS = [(float(((i * 37) % 160) - 80), float(((i * 53) % 140) - 70)) for i in range(300)]
PIP_POLYS = {
    0: [(-40.0, -30.0), (30.0, -45.0), (55.0, 10.0), (0.0, 50.0), (-50.0, 25.0)],
    1: [(-70.0, -65.0), (-10.0, -60.0), (-35.0, -20.0)],
}


def golden_ways() -> dict:
    out = {}
    for name, mk in ALL_SCENES.items():
        scene = mk()
        res = ways_in_rect_oracle(scene)
        out[name] = {
            str(wid): {"geometry": geom, "tags": tags}
            for wid, (geom, tags) in sorted(res.items())
        }
    return out


def golden_tile_assignments(zoom: int = 8) -> dict:
    """First-vertex tile assignment of every oracle way, per scene."""
    out = {}
    for name, mk in ALL_SCENES.items():
        scene = mk()
        res = ways_in_rect_oracle(scene)
        rows = {}
        for wid, (geom, _tags) in sorted(res.items()):
            lon, lat = geom[0]
            tx, ty = tile_xy(np.array([lon]), np.array([lat]), zoom)
            rows[str(wid)] = {"z": zoom, "x": int(tx[0]), "y": int(ty[0])}
        out[name] = rows
    return out


def golden_knn(k: int = 3) -> list:
    rows = []
    cands = np.array(KNN_CANDS)
    for qi, (qlon, qlat) in enumerate(KNN_QUERIES):
        d2 = (cands[:, 0] - qlon) ** 2 + (cands[:, 1] - qlat) ** 2
        order = np.lexsort((np.arange(len(cands)), d2))[:k]
        for rank, ci in enumerate(order, 1):
            rows.append({"query_id": qi, "cand_id": int(ci), "rank": rank})
    return rows


def golden_pip() -> list:
    rows = []
    pts = np.array(PIP_POINTS)
    for aid, poly in PIP_POLYS.items():
        p = np.array(poly)
        inside = raycast_even_odd(pts[:, 0], pts[:, 1], p[:, 0], p[:, 1])
        for i in np.flatnonzero(inside):
            rows.append({"point_id": int(i), "area_id": aid})
    return sorted(rows, key=lambda r: (r["point_id"], r["area_id"]))


def golden_tiles() -> None:
    """Single-process render of each scene's base tile (396×396)."""
    import pandas as pd

    from osm_render_spark.raster.codec import encode_png
    from osm_render_spark.raster.ops import render_map_kernel

    for name, mk in ALL_SCENES.items():
        scene = mk()
        res = ways_in_rect_oracle(scene)
        lat_min, lon_min, lat_max, lon_max = scene.bbox
        w = h = 396
        rows = []
        for wid, (geom, tags) in sorted(res.items()):
            if "bridge" in tags:
                kind = "bridge"
            elif tags.get("natural") == "coastline":
                kind = "coast"
            else:
                kind = "water"
            # same association as the engine's Column expr: (v - min) * scale
            # with scale precomputed — bitwise-identical doubles
            sx = w / (lon_max - lon_min)
            sy = h / (lat_min - lat_max)
            xs = [(lon - lon_min) * sx for lon, _ in geom]
            ys = [(lat - lat_max) * sy for _, lat in geom]
            rows.append((wid, kind, xs, ys))
        pdf = pd.DataFrame(rows, columns=["way_id", "kind", "xs", "ys"])
        surf = render_map_kernel(pdf, w, h)
        with open(os.path.join(GOLDEN_DIR, f"tile_{name}.png"), "wb") as f:
            f.write(encode_png(surf))


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(os.path.join(GOLDEN_DIR, "ways.json"), "w") as f:
        json.dump(golden_ways(), f, indent=1, sort_keys=True)
    with open(os.path.join(GOLDEN_DIR, "tile_assignments.json"), "w") as f:
        json.dump(golden_tile_assignments(), f, indent=1, sort_keys=True)
    with open(os.path.join(GOLDEN_DIR, "knn.json"), "w") as f:
        json.dump(golden_knn(), f, indent=1)
    with open(os.path.join(GOLDEN_DIR, "pip.json"), "w") as f:
        json.dump(golden_pip(), f, indent=1)
    golden_tiles()
    glyph_atlas_fixture()
    print("goldens written to", GOLDEN_DIR)


def glyph_atlas_fixture() -> None:
    """Pre-render the AA proportional glyph atlas (R7, sizes 8/10/11 —
    OsmRender.m:611-622) into the package so the label path loads fixed
    bits; test_raster pins fixture == build_atlas()."""
    import numpy as np

    from osm_render_spark.raster.font import _ATLAS_PATH, build_atlas

    np.savez_compressed(_ATLAS_PATH, **build_atlas())
    print("glyph atlas written to", _ATLAS_PATH)


if __name__ == "__main__":
    main()
