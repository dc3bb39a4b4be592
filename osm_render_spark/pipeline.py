"""End-to-end scene pipeline — the engine's `main` (reference
OsmRender.m:1177-1296, SURVEY.md §3.1), distributed and checkpointed.

Stages (each one a checkpointed unit; resume skips completed stages):

1. spatial join  — waysInRect over (nodes, ways, relations)      [M2]
2. projection    — lon/lat → scene pixel space (Column HOFs)     [M1]
3. base render   — per-scene raster kernel (clip/merge/fill)     [M5/M6]
4. sprite fan-out — per-(area, mode) variants + diffs            [A6/J10]
5. atlas         — per-scene packed sprite sheet                 [A5]

The cache probe the reference does per render (OsmRenderMapCached,
OsmRender.m:539-588) is the CheckpointStore key hit: rerunning with the
same params + inputs recomputes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures.osm import Scene
from .operators.ways_in_rect import ways_in_rect
from .plans.checkpoint import CheckpointStore
from .raster.ops import pack_atlas, render_map_tiles, sprite_variants


def project_ways(
    result: DataFrame, bbox: tuple[float, float, float, float], w: int, h: int,
    scene_id: int = 0,
) -> DataFrame:
    """Way rows → pixel-space (scene_id, way_id, kind, xs, ys). Pure
    Column HOFs (P8/P9); kind classification mirrors the render order of
    OsmRenderMap (bridges erase, coastline merges, water fills).

    Kinds are ADDITIVE per reference render pass — see
    predicates.classify_kinds (single shared definition)."""
    from .functions.predicates import classify_kinds

    lat_min, lon_min, lat_max, lon_max = bbox
    sx = w / (lon_max - lon_min)
    sy = h / (lat_min - lat_max)
    kinds = classify_kinds(F.col("tags"))
    return result.select(
        F.lit(scene_id).cast("long").alias("scene_id"),
        "way_id",
        F.explode(kinds).alias("kind"),
        F.transform("geometry", lambda p: (p["lon"] - F.lit(lon_min)) * F.lit(sx)).alias("xs"),
        F.transform("geometry", lambda p: (p["lat"] - F.lit(lat_max)) * F.lit(sy)).alias("ys"),
    )


def project_areas(
    areas: DataFrame, bbox: tuple[float, float, float, float], w: int, h: int
) -> DataFrame:
    """areas(scene_id, area_id, polygon:array<struct<lon,lat>>) → pixel
    xs/ys arrays for the sprite mask kernel."""
    lat_min, lon_min, lat_max, lon_max = bbox
    sx = w / (lon_max - lon_min)
    sy = h / (lat_min - lat_max)
    return areas.select(
        "scene_id",
        "area_id",
        F.transform("polygon", lambda p: (p["lon"] - F.lit(lon_min)) * F.lit(sx)).alias("xs"),
        F.transform("polygon", lambda p: (p["lat"] - F.lit(lat_max)) * F.lit(sy)).alias("ys"),
    )


def render_scene_pipeline(
    spark: SparkSession,
    scene: Scene,
    areas: DataFrame,
    store: CheckpointStore,
    w: int = 396,
    h: int = 396,
) -> dict[str, DataFrame]:
    """Full pipeline with per-stage checkpoints. Returns the stage outputs
    {ways, tiles, sprites, atlas}."""
    from .plans.checkpoint import dataframe_token

    nodes, ways, rels = scene.to_spark(spark)
    params = {"scene": scene.name, "bbox": list(scene.bbox), "w": w, "h": h}
    # input snapshot tokens (S10: a stage key must cover its INPUTS, not
    # just its parameters — the reference's stale-cache hazard). Scene
    # tables are a pure function of scene.name (fixtures contract), so
    # params covers them; areas is external input and gets a content token.
    areas_token = dataframe_token(areas)

    joined = store.run_stage(
        spark,
        "ways_in_rect",
        params,
        lambda: ways_in_rect(nodes, ways, rels, scene.bbox),
        partition_col="way_id",
    )
    proj = project_ways(joined, scene.bbox, w, h)
    tiles = store.run_stage(
        spark, "base_render", params, lambda: render_map_tiles(proj, w, h),
        partition_col="scene_id",
    )
    px_areas = project_areas(areas, scene.bbox, w, h)
    sprites = store.run_stage(
        spark,
        "sprites",
        params,
        lambda: sprite_variants(tiles, px_areas),
        partition_col="area_id",
        input_token=areas_token,
    )
    atlas = store.run_stage(
        spark,
        "atlas",
        params,
        lambda: pack_atlas(sprites),
        partition_col="scene_id",
        input_token=areas_token,
    )

    # second-resolution callout pass (OsmRender.m:1261-1291: globals mutate
    # to 290×290 and each area gets its own highlighted render)
    cw = ch = 290
    cparams = {**params, "w": cw, "h": ch}
    ctiles = store.run_stage(
        spark,
        "callout_base",
        cparams,
        lambda: render_map_tiles(project_ways(joined, scene.bbox, cw, ch), cw, ch),
        partition_col="scene_id",
    )
    callouts = store.run_stage(
        spark,
        "callouts",
        cparams,
        lambda: sprite_variants(
            ctiles, project_areas(areas, scene.bbox, cw, ch), modes=("active",)
        ).withColumn("mode", F.lit("callout")),
        partition_col="area_id",
        input_token=areas_token,
    )
    return {
        "ways": joined,
        "tiles": tiles,
        "sprites": sprites,
        "atlas": atlas,
        "callouts": callouts,
    }
