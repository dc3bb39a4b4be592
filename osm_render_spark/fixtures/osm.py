"""Deterministic OSM-shaped scene fixtures (FIXTURES.md §2-§6).

Pure functions of (scene, seed) — no external data, no wall clock. Scenes
exercise every semantic corner surveyed from the reference:

* minimal   — 1 closed pond way, smoke test
* coast     — open coastline chains crossing bbox edges (clip F7, merge A3/A4)
* bridges   — overlapping water + bridge ways (DEST_OUT erase)
* relations — ways whose tags only match after relation merge must NOT
              appear (filter runs before merge, MapData.m:213 vs 249), and
              matching ways must surface relation-won tag collisions
* sparse    — ways referencing nodes outside the bbox (extraNodes J2)
* urban-hot — ~50% of features in one tile cell (skew / salting path)

Coordinates are generated in integer nanodegrees then scaled by 1e-9,
matching the reference's decode (MapData.m:178), so doubles are exactly
the values the reference would produce.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("block_id", T.IntegerType(), False),
    ]
)

WAY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("refs", T.ArrayType(T.LongType()), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

REL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField(
            "members",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType(), False),
                        T.StructField("ref", T.LongType(), False),
                        T.StructField("role", T.StringType(), True),
                    ]
                )
            ),
            False,
        ),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _nano(deg: float) -> float:
    """Round-trip through integer nanodegrees (MapData.m:178 semantics)."""
    return int(round(deg * 1e9)) * 1e-9


@dataclass
class Scene:
    name: str
    bbox: tuple[float, float, float, float]  # (lat_min, lon_min, lat_max, lon_max)
    nodes: list[tuple] = field(default_factory=list)  # (id, lat, lon, tags, block)
    ways: list[tuple] = field(default_factory=list)  # (id, refs, tags)
    relations: list[tuple] = field(default_factory=list)  # (id, members, tags)

    _next_node: int = 1000

    def add_node(self, lat: float, lon: float, tags=None, block=0) -> int:
        nid = self._next_node
        self._next_node += 7  # deterministic gaps (delta-decode fidelity, W1)
        self.nodes.append((nid, _nano(lat), _nano(lon), tags or {}, block))
        return nid

    def add_way(self, wid: int, coords: list[tuple[float, float]], tags, closed=False):
        refs = [self.add_node(lat, lon) for lat, lon in coords]
        if closed:
            refs.append(refs[0])
        self.ways.append((wid, refs, tags))
        return refs

    def nodes_pdf(self) -> pd.DataFrame:
        return pd.DataFrame(self.nodes, columns=["id", "lat", "lon", "tags", "block_id"])

    def ways_pdf(self) -> pd.DataFrame:
        return pd.DataFrame(self.ways, columns=["id", "refs", "tags"])

    def relations_pdf(self) -> pd.DataFrame:
        return pd.DataFrame(self.relations, columns=["id", "members", "tags"])

    def to_spark(self, spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
        nodes = spark.createDataFrame(
            [(i, la, lo, t, b) for i, la, lo, t, b in self.nodes], NODE_SCHEMA
        )
        ways = spark.createDataFrame(self.ways, WAY_SCHEMA)
        rels = spark.createDataFrame(self.relations, REL_SCHEMA)
        return nodes, ways, rels


def scene_minimal() -> Scene:
    s = Scene("minimal", bbox=(10.0, 20.0, 10.1, 20.1))
    # closed pond inside bbox
    s.add_way(
        1,
        [(10.02, 20.02), (10.02, 20.05), (10.05, 20.05), (10.05, 20.02)],
        {"natural": "pond", "name": "tiny pond"},
        closed=True,
    )
    # decoy way (no matching tags) — must be filtered out
    s.add_way(2, [(10.03, 20.03), (10.04, 20.04)], {"highway": "residential"})
    # way fully outside bbox — must not match
    s.add_way(3, [(11.5, 21.5), (11.6, 21.6)], {"natural": "water"}, closed=False)
    return s


def scene_coast() -> Scene:
    s = Scene("coast", bbox=(0.0, 0.0, 1.0, 1.0))
    # open coastline chain crossing the west and east edges
    s.add_way(
        10,
        [(0.5, -0.2), (0.5, 0.3), (0.6, 0.7), (0.55, 1.2)],
        {"natural": "coastline"},
    )
    # chain crossing north edge, needs corner insertion when merged
    s.add_way(
        11,
        [(1.2, 0.2), (0.8, 0.25), (0.7, 0.4), (1.15, 0.45)],
        {"natural": "coastline"},
    )
    # self-closing coastline island fully inside
    s.add_way(
        12,
        [(0.2, 0.2), (0.2, 0.4), (0.35, 0.4), (0.35, 0.2)],
        {"natural": "coastline"},
        closed=True,
    )
    # two chains that concatenate exactly (A3: last point == first point)
    mid = (0.1, 0.5)
    a = s.add_way(13, [(-0.1, 0.45), mid], {"natural": "coastline"})
    # way 14 starts at way 13's exact last node coordinate
    s.add_way(14, [mid, (0.1, 0.6), (-0.05, 0.65)], {"natural": "coastline"})
    _ = a
    return s


def scene_bridges() -> Scene:
    s = Scene("bridges", bbox=(50.0, 8.0, 50.2, 8.2))
    s.add_way(
        20,
        [(50.05, 8.05), (50.05, 8.15), (50.15, 8.15), (50.15, 8.05)],
        {"natural": "water", "name": "river basin"},
        closed=True,
    )
    s.add_way(21, [(50.04, 8.10), (50.16, 8.10)], {"bridge": "yes", "highway": "primary"})
    # landuse=reservoid — the reference's literal misspelling (OsmRender.m:407)
    s.add_way(
        22,
        [(50.01, 8.01), (50.01, 8.03), (50.03, 8.03), (50.03, 8.01)],
        {"landuse": "reservoid"},
        closed=True,
    )
    # landuse=reservoir (correct spelling) must NOT match — pins the quirk
    s.add_way(
        23,
        [(50.06, 8.01), (50.06, 8.03), (50.08, 8.03), (50.08, 8.01)],
        {"landuse": "reservoir"},
        closed=True,
    )
    return s


def scene_relations() -> Scene:
    s = Scene("relations", bbox=(-5.0, -5.0, -4.0, -4.0))
    # way 30: own tags match (water); relation adds name + overrides 'src'
    s.add_way(
        30,
        [(-4.8, -4.8), (-4.8, -4.6), (-4.6, -4.6), (-4.6, -4.8)],
        {"natural": "water", "src": "way"},
        closed=True,
    )
    # way 31: own tags do NOT match; relation would add natural=water —
    # but the filter runs before the merge, so way 31 must NOT appear.
    s.add_way(31, [(-4.5, -4.5), (-4.4, -4.4)], {"name": "plain way"})
    # way 32: matches; two relations collide on key 'k' — higher rel id wins
    s.add_way(32, [(-4.3, -4.8), (-4.2, -4.7)], {"bridge": "yes"})
    s.relations.append(
        (100, [{"type": "WAY", "ref": 30, "role": "outer"},
               {"type": "NODE", "ref": 1000, "role": ""},        # ignored: not WAY
               {"type": "WAY", "ref": 9999, "role": "outer"}],   # dangling: skipped
         {"name": "lake rel", "src": "rel"})
    )
    s.relations.append((101, [{"type": "WAY", "ref": 31, "role": ""}], {"natural": "water"}))
    s.relations.append((102, [{"type": "WAY", "ref": 32, "role": ""}], {"k": "first"}))
    s.relations.append((103, [{"type": "WAY", "ref": 32, "role": ""}], {"k": "second"}))
    return s


def scene_sparse() -> Scene:
    s = Scene("sparse", bbox=(30.0, 30.0, 30.5, 30.5))
    # way with one vertex inside the bbox and several outside: matches via
    # the inside vertex, and its FULL geometry must be assembled (J2).
    s.add_way(
        40,
        [(29.5, 29.5), (30.25, 30.25), (31.0, 31.0), (31.5, 29.0)],
        {"waterway": "riverbank"},
    )
    # 64-bit way id (> 2^32): engine keeps full ids (divergence from the
    # reference's uint32 truncation, MapData.m:245)
    s.add_way(2**33 + 5, [(30.1, 30.1), (30.2, 30.2)], {"natural": "lake"})
    return s


def scene_urban_hot(n_hot: int = 400, n_cold: int = 100) -> Scene:
    """~80% of ways concentrated in one 0.01° cell — the skew fixture."""
    s = Scene("urban-hot", bbox=(40.0, -74.2, 40.9, -73.7))
    rng = np.random.default_rng(42)
    hot = rng.uniform([40.70, -74.01], [40.71, -74.00], size=(n_hot, 2))
    cold = rng.uniform([40.0, -74.2], [40.9, -73.7], size=(n_cold, 2))
    wid = 5000
    for lat, lon in np.vstack([hot, cold]):
        d = 0.0005
        s.add_way(
            wid,
            [(lat, lon), (lat, lon + d), (lat + d, lon + d), (lat + d, lon)],
            {"natural": "pond"},
            closed=True,
        )
        wid += 3
    return s


ALL_SCENES = {
    "minimal": scene_minimal,
    "coast": scene_coast,
    "bridges": scene_bridges,
    "relations": scene_relations,
    "sparse": scene_sparse,
    "urban-hot": scene_urban_hot,
}
