"""The waysInRect pipeline — the engine's core spatial join.

Reimplements (Spark-first, not a translation) the reference's two-pass
spatial join ``-[MapData waysInRect:matchingFilter:]`` (MapData.m:361-482,
SURVEY.md §3.2). Semantics, in reference order:

1. bbox-filter nodes (P1, MapData.m:102-103)                 -> narrow filter
2. way matches iff ≥1 ref in the bbox node set (J1,
   MapData.m:110-127)                                         -> left-semi join
3. tag filter on the way's OWN tags — it runs BEFORE the
   relation tag merge in the reference (MapData.m:213 vs 249) -> filter
4. geometry uses ALL refs of a matched way, including nodes
   outside the bbox (J2 "extraNodes", MapData.m:129-137,
   470-472)                                                   -> inner join on
                                                                 full nodes
5. ordered vertex assembly (J3/A1, MapData.m:216-238)         -> posexplode +
                                                                 join + sort-agg
6. relation tags merged OVER member-way tags, relation wins
   on collision; later relations win over earlier ones
   (J5, MapData.m:249-284, merge at 282)                      -> explode + agg
                                                                 + map_concat
                                                                 (LAST_WIN)

Divergences from the reference, deliberate (SURVEY.md §7.3): 64-bit way
ids kept (reference truncates to uint32 at MapData.m:245); output is
canonically ordered by way_id (reference order is nondeterministic hash
order, MapData.m:481).

Scale notes: step 2 and step 5 shuffle on way id; step 4+5 is one
explode + shuffle-hash equi-join against nodes (at 100 TB the nodes table
is bucket-partitioned by id so this join co-locates without a full
shuffle). The bbox node set is typically small relative to nodes — Spark's
runtime row-level filtering (InjectRuntimeFilter) plays the role of the
reference's hand-rolled two-pass semi-join filter (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import bbox_contains, filter_way

Bbox = tuple[float, float, float, float]  # (lat_min, lon_min, lat_max, lon_max)


def matching_node_ids(nodes: DataFrame, bbox: Bbox) -> DataFrame:
    """A2: distinct ids of nodes inside the bbox (MapData.m:102-105)."""
    return (
        nodes.where(bbox_contains(F.col("lon"), F.col("lat"), bbox))
        .select(F.col("id").alias("node_id"))
        .distinct()
    )


def matching_way_ids(ways: DataFrame, mnodes: DataFrame) -> DataFrame:
    """J1: ways with ≥1 ref in the bbox node set (MapData.m:110-127).

    explode + equi-join + distinct (the distributed form of the
    reference's short-circuit `break` — semi-join semantics).
    """
    refs = ways.select(F.col("id").alias("way_id"), F.explode("refs").alias("ref"))
    return (
        refs.join(mnodes, refs.ref == mnodes.node_id, "left_semi")
        .select("way_id")
        .distinct()
    )


def dedupe_nodes(nodes: DataFrame) -> DataFrame:
    """E4 for nodes: the reference's id→point hash map makes the LAST
    inserted node win on id collisions (insert at MapData.m:176-180, file
    order). Distributed input has no file order, so the engine's
    deterministic stand-in is max block_id, tie-broken by (lat, lon).
    Real OSM ids are unique — this only matters for concatenated extracts.
    """
    order = F.struct(F.col("block_id"), F.col("lat"), F.col("lon"))
    return nodes.groupBy("id").agg(
        F.max_by(F.struct("lon", "lat"), order).alias("_p")
    ).select("id", F.col("_p.lon").alias("lon"), F.col("_p.lat").alias("lat"))


def assemble_geometry(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J2+J3+A1: ordered vertex arrays for each way, using ALL refs.

    posexplode keeps the ref position (W4); the join against nodes
    retrieves coordinates (including outside-bbox "extraNodes", J2);
    sort-agg restores ref order (A1). The reference asserts every ref
    resolves (MapData.m:227-228) — we inner-join, so unresolvable refs
    drop the vertex; a lineage count check catches mismatches upstream.
    Node-id duplicates are collapsed first (dedupe_nodes) — a plain join
    would duplicate vertices where the reference's hash map overwrites.
    """
    exploded = ways.select(
        F.col("id").alias("way_id"),
        F.posexplode("refs").alias("pos", "ref"),
    )
    unique_nodes = dedupe_nodes(nodes) if "block_id" in nodes.columns else nodes
    joined = exploded.join(
        unique_nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref", "inner"
    )
    return joined.groupBy("way_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))),
            lambda x: F.struct(x["lon"].alias("lon"), x["lat"].alias("lat")),
        ).alias("geometry")
    )


def relation_tags_per_way(relations: DataFrame) -> DataFrame:
    """J5 build side: per member way, all relation tag maps merged in
    relation-id order with LAST_WIN (the reference applies relations in
    file order, each merging over the previous — MapData.m:249-284)."""
    members = relations.select(
        F.col("id").alias("rel_id"), F.col("tags").alias("rel_tags"), F.explode("members").alias("m")
    ).where(F.col("m.type") == "WAY")
    entries = members.select(
        F.col("m.ref").alias("way_id"),
        F.col("rel_id"),
        F.explode("rel_tags").alias("k", "v"),
    )
    winners = entries.groupBy("way_id", "k").agg(F.max_by("v", "rel_id").alias("v"))
    return winners.groupBy("way_id").agg(
        F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("rel_tags")
    )


def ways_in_rect(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame | None,
    bbox: Bbox,
    tag_filter: Column | None = None,
) -> DataFrame:
    """Full pipeline. ``tag_filter`` is a Column over ``tags`` (the
    engine's equivalent of the reference's pluggable predicate block,
    MapData.h:31-32); defaults to OsmFilterWay.

    Returns (way_id, geometry:array<struct<lon,lat>>, tags) ordered by
    way_id.
    """
    mnodes = matching_node_ids(nodes, bbox)
    mway_ids = matching_way_ids(ways, mnodes)

    matched = ways.join(
        mway_ids, ways.id == mway_ids.way_id, "left_semi"
    )
    # Tag filter on the way's own tags — BEFORE relation merge (MapData.m:213).
    pred = tag_filter if tag_filter is not None else filter_way(F.col("tags"))
    matched = matched.where(pred)

    geom = assemble_geometry(matched, nodes)
    with_tags = matched.select(F.col("id").alias("way_id"), "tags").join(
        geom, "way_id", "inner"
    )

    if relations is not None:
        rel = relation_tags_per_way(relations)
        with_tags = with_tags.join(F.broadcast(rel), "way_id", "left").withColumn(
            "tags",
            F.when(
                F.col("rel_tags").isNull(), F.col("tags")
            ).otherwise(F.map_concat(F.col("tags"), F.col("rel_tags"))),
        ).drop("rel_tags")

    return with_tags.select("way_id", "geometry", "tags").orderBy("way_id")
