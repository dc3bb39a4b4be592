"""Filter predicates (SURVEY.md §2.2 P1-P6, P10-P11).

The tag vocabulary reproduces the reference exactly, including the literal
``reservoid`` misspelling (OsmIsWater, OsmRender.m:407) — it changes filter
semantics so parity requires keeping it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# OsmIsWater (OsmRender.m:389-420): value sets per tag key.
WATER_NATURAL = ("lake", "pond", "water")
WATER_LANDUSE = ("basin", "lake", "pond", "reservoid", "water")
WATER_WATERWAY = ("dock", "riverbank")


def is_water(tags: Column) -> Column:
    """OsmIsWater (OsmRender.m:389-420) over a map<string,string> column."""
    return (
        F.element_at(tags, "natural").isin(*WATER_NATURAL)
        | F.element_at(tags, "landuse").isin(*WATER_LANDUSE)
        | F.element_at(tags, "waterway").isin(*WATER_WATERWAY)
    )


def is_coastline(tags: Column) -> Column:
    return F.element_at(tags, "natural") == "coastline"


def has_bridge(tags: Column) -> Column:
    """OsmFilterWay checks mere key presence for bridge (OsmRender.m:424)."""
    return F.map_contains_key(tags, "bridge")


def filter_way(tags: Column) -> Column:
    """OsmFilterWay (OsmRender.m:422-428): bridge ∨ coastline ∨ water."""
    return has_bridge(tags) | is_coastline(tags) | is_water(tags)


def classify_kinds(tags: Column) -> Column:
    """ADDITIVE render-kind array for a way — one entry per reference
    render pass that touches it (coastline collect, water-fill re-scan
    of ALL ways with OsmIsWater at OsmRender.m:508-517, bridge erase):
    a bridge∧water way yields ['water','bridge'], a coastline way that
    is also OsmIsWater yields ['water','coast']. Ways matching no pass
    default to 'water' (callers have already tag-filtered; the branch
    serves custom tag_filter users). Single definition shared by
    pipeline.project_ways, tools/render_pbf, and tests."""
    is_b = has_bridge(tags)
    is_c = F.coalesce(is_coastline(tags), F.lit(False))
    is_w = F.coalesce(is_water(tags), F.lit(False))
    return F.array_compact(
        F.array(
            F.when(is_w | (~is_b & ~is_c), F.lit("water")),
            F.when(is_c, F.lit("coast")),
            F.when(is_b, F.lit("bridge")),
        )
    )


def bbox_contains(lon: Column, lat: Column, bbox: tuple[float, float, float, float]) -> Column:
    """P1: point-in-bbox. bbox = (lat_min, lon_min, lat_max, lon_max),
    matching the reference's MapDataBounds field order (MapData.m:28-32)."""
    lat_min, lon_min, lat_max, lon_max = bbox
    return (
        (lat >= F.lit(lat_min))
        & (lat <= F.lit(lat_max))
        & (lon >= F.lit(lon_min))
        & (lon <= F.lit(lon_max))
    )


def bbox_contains_sql(lon: str, lat: str, bbox: tuple[float, float, float, float]) -> str:
    lat_min, lon_min, lat_max, lon_max = bbox
    return (
        f"({lat} >= {lat_min!r} AND {lat} <= {lat_max!r} "
        f"AND {lon} >= {lon_min!r} AND {lon} <= {lon_max!r})"
    )


def normalize_bbox_sql(lat0: str, lon0: str, lat1: str, lon1: str) -> dict[str, str]:
    """P11 (OsmRender.m:893-909): swap inverted bounds via least/greatest."""
    return {
        "lat_min": f"LEAST({lat0}, {lat1})",
        "lat_max": f"GREATEST({lat0}, {lat1})",
        "lon_min": f"LEAST({lon0}, {lon1})",
        "lon_max": f"GREATEST({lon0}, {lon1})",
    }


def is_cyclic(geometry: Column) -> Column:
    """P5 (OsmRender.m:497-498): first point == last point (exact equality,
    mirroring NSEqualPoints at OsmRender.m:338)."""
    return F.element_at(geometry, 1) == F.element_at(geometry, -1)


def endpoint_strictly_inside(
    pt: Column, bbox_px: tuple[float, float, float, float]
) -> Column:
    """P6/F12 (OsmRender.m:368-371): endpoint strictly inside the pixel rect
    ⇒ the open path cannot be a clipped coastline and is discarded."""
    x0, y0, x1, y1 = bbox_px
    return (
        (pt["x"] > F.lit(x0)) & (pt["x"] < F.lit(x1))
        & (pt["y"] > F.lit(y0)) & (pt["y"] < F.lit(y1))
    )
