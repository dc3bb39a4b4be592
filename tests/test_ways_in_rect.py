"""Spark waysInRect pipeline vs the pure-Python oracle, per scene."""

from __future__ import annotations

import pytest

from osm_render_spark.fixtures.oracle import ways_in_rect_oracle
from osm_render_spark.fixtures.osm import ALL_SCENES
from osm_render_spark.operators.ways_in_rect import ways_in_rect


@pytest.mark.parametrize("scene_name", list(ALL_SCENES))
def test_scene_matches_oracle(spark, scene_name):
    scene = ALL_SCENES[scene_name]()
    nodes, ways, rels = scene.to_spark(spark)
    got = {
        r["way_id"]: ([(p["lon"], p["lat"]) for p in r["geometry"]], dict(r["tags"]))
        for r in ways_in_rect(nodes, ways, rels, scene.bbox).collect()
    }
    want = ways_in_rect_oracle(scene)
    assert set(got) == set(want), (
        f"way-id sets differ: extra={set(got) - set(want)} missing={set(want) - set(got)}"
    )
    for wid in want:
        assert got[wid][0] == want[wid][0], f"geometry mismatch for way {wid}"
        assert got[wid][1] == want[wid][1], f"tags mismatch for way {wid}"


def test_relations_scene_pins_filter_before_merge(spark):
    """Way 31 only matches via relation tags — must be absent (MapData.m:213
    runs the filter before the relation merge at MapData.m:249)."""
    scene = ALL_SCENES["relations"]()
    nodes, ways, rels = scene.to_spark(spark)
    ids = [r["way_id"] for r in ways_in_rect(nodes, ways, rels, scene.bbox).collect()]
    assert 31 not in ids
    assert 30 in ids and 32 in ids


def test_relation_collision_last_wins(spark):
    scene = ALL_SCENES["relations"]()
    nodes, ways, rels = scene.to_spark(spark)
    rows = {r["way_id"]: dict(r["tags"]) for r in ways_in_rect(nodes, ways, rels, scene.bbox).collect()}
    assert rows[32]["k"] == "second"  # relation 103 merges after 102
    assert rows[30]["src"] == "rel"  # relation value wins over way value


def test_duplicate_node_ids_last_wins(spark):
    """E4 for nodes (MapData.m:176-180: hash insert overwrites): a
    duplicated node id must yield ONE vertex — the one from the highest
    block — not two."""
    from osm_render_spark.fixtures.osm import NODE_SCHEMA, WAY_SCHEMA

    nodes = spark.createDataFrame(
        [
            (1, 10.0, 20.0, {}, 0),
            (1, 11.0, 21.0, {}, 1),  # same id, later block → wins
            (2, 10.5, 20.5, {}, 0),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame([(7, [1, 2], {"natural": "water"})], WAY_SCHEMA)
    rows = ways_in_rect(nodes, ways, None, (9.0, 19.0, 12.0, 22.0)).collect()
    geom = [(p["lon"], p["lat"]) for p in rows[0]["geometry"]]
    assert geom == [(21.0, 11.0), (20.5, 10.5)]


def test_sparse_scene_full_geometry(spark):
    """Way 40 has 3 of 4 vertices outside the bbox — all 4 must be present
    (extraNodes back-join J2, MapData.m:129-137)."""
    scene = ALL_SCENES["sparse"]()
    nodes, ways, rels = scene.to_spark(spark)
    rows = {r["way_id"]: r for r in ways_in_rect(nodes, ways, rels, scene.bbox).collect()}
    assert len(rows[40]["geometry"]) == 4
    assert (2**33 + 5) in rows  # 64-bit way ids survive
