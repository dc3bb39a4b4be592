"""Pure-Python single-process oracle for the waysInRect semantics.

An INDEPENDENT implementation (plain dicts/loops, written fresh — not a
copy of either the Spark pipeline or the reference) of the semantics
surveyed in SURVEY.md §3.2. Used only in tests to validate the
distributed pipeline; intentionally simple and slow.
"""

from __future__ import annotations

from .osm import Scene

WATER_NATURAL = {"lake", "pond", "water"}
WATER_LANDUSE = {"basin", "lake", "pond", "reservoid", "water"}
WATER_WATERWAY = {"dock", "riverbank"}


def is_water(tags: dict) -> bool:
    return (
        tags.get("natural") in WATER_NATURAL
        or tags.get("landuse") in WATER_LANDUSE
        or tags.get("waterway") in WATER_WATERWAY
    )


def filter_way(tags: dict) -> bool:
    return "bridge" in tags or tags.get("natural") == "coastline" or is_water(tags)


def ways_in_rect_oracle(scene: Scene, tag_filter=filter_way):
    """Returns {way_id: (geometry [(lon,lat)...], tags)} per the reference
    semantics: bbox node match -> way semi-match -> tag filter on own tags
    -> full geometry assembly -> relation tag merge (relation wins,
    later relation wins; dangling/non-way members skipped)."""
    lat_min, lon_min, lat_max, lon_max = scene.bbox
    node_pos = {nid: (lon, lat) for nid, lat, lon, _t, _b in scene.nodes}
    matching = {
        nid
        for nid, lat, lon, _t, _b in scene.nodes
        if lat_min <= lat <= lat_max and lon_min <= lon <= lon_max
    }
    out: dict[int, tuple[list[tuple[float, float]], dict]] = {}
    for wid, refs, tags in scene.ways:
        if not any(r in matching for r in refs):
            continue
        if not tag_filter(tags):
            continue
        geom = [node_pos[r] for r in refs if r in node_pos]
        out[wid] = (geom, dict(tags))
    for _rid, members, rtags in sorted(scene.relations, key=lambda r: r[0]):
        for m in members:
            if m["type"] != "WAY":
                continue
            if m["ref"] in out:
                out[m["ref"]][1].update(rtags)
    return out
