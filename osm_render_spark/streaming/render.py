"""Incremental tile maintenance — the streaming form of the slippy
renderer (raster/ops.render_slippy_tiles): a continuously-appended way
stream keeps a tile tree up to date by re-rendering ONLY the tiles each
micro-batch touches.

This is incremental view maintenance over the raster view:

1. the micro-batch's ways append to a compacted WAY STORE partitioned by
   tile_key (the engine's spatial partition key — S6 pruning applies)
2. the batch's affected tile set = distinct tile keys of its fan-out
3. affected tiles re-render from ALL ways stored for those tiles (the
   partition-pruned read — a tile's render is a pure function of its
   ways, so re-render is exact, never approximate)
4. rendered PNGs land in the tile tree via raster.sink.write_tile_tree
   (atomic per-file replace: readers never see a torn tile)

Cost per batch is O(batch fan-out + ways-in-affected-tiles), independent
of the total corpus — the un-touched tile majority is never read,
re-rendered, or rewritten. At 10^12 ways the way store is the bucketed/
partitioned table and step 3's scan prunes to the affected partitions
(pinned for the batch engine in tests/test_plans.py's partition-pruning
test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..raster.ops import render_slippy_tiles
from ..raster.sink import write_tile_tree


def _fan_out_tiles(ways: DataFrame, zoom: int) -> DataFrame:
    """(way_id, kind, geometry, tile_key) — one row per covered tile,
    same bbox arithmetic as render_slippy_tiles steps 1-2."""
    from ..raster.ops import _merc_x, _merc_y

    n = 1 << zoom
    g = F.col("geometry")
    lon_min = F.array_min(F.transform(g, lambda p: p["lon"]))
    lon_max = F.array_max(F.transform(g, lambda p: p["lon"]))
    lat_min = F.array_min(F.transform(g, lambda p: p["lat"]))
    lat_max = F.array_max(F.transform(g, lambda p: p["lat"]))

    def clamp_tile(c):
        return F.least(F.greatest(F.floor(c), F.lit(0)), F.lit(n - 1)).cast("long")

    ranged = ways.select(
        "way_id",
        "kind",
        "geometry",
        clamp_tile(_merc_x(lon_min, zoom)).alias("tx0"),
        clamp_tile(_merc_x(lon_max, zoom)).alias("tx1"),
        clamp_tile(_merc_y(lat_max, zoom)).alias("ty0"),
        clamp_tile(_merc_y(lat_min, zoom)).alias("ty1"),
    )
    return (
        ranged.withColumn("tile_x", F.explode(F.sequence("tx0", "tx1")))
        .withColumn("tile_y", F.explode(F.sequence("ty0", "ty1")))
        .withColumn("tile_key", F.col("tile_x") * n + F.col("tile_y"))
        .select("way_id", "kind", "geometry", "tile_key")
    )


def incremental_tile_render(
    ways_stream: DataFrame,
    out_dir: str,
    zoom: int,
    tile_px: int = 128,
    checkpoint_dir: str | None = None,
):
    """ways_stream (streaming: way_id, kind, geometry) → a continuously
    maintained tile tree under ``out_dir``. Returns the StreamingQuery.

    foreachBatch is the right tool (not a stateful operator): the tile
    render needs ALL ways of an affected tile — arbitrarily old state —
    which is a keyed TABLE, not bounded stream state; the way store is
    that table, partitioned by tile_key so step 3 is partition-pruned.
    """
    store = os.path.join(out_dir, "_way_store")
    tree = os.path.join(out_dir, "tiles")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fanned = _fan_out_tiles(batch, zoom).persist()
        try:
            if fanned.isEmpty():
                return
            # 1. append the batch's fan-out to the tile-partitioned store
            fanned.write.mode("append").partitionBy("tile_key").parquet(store)
            # 2-3. re-render ONLY the affected tiles from the full store
            affected = fanned.select("tile_key").distinct()
            stored = spark.read.parquet(store).join(
                F.broadcast(affected), "tile_key", "left_semi"
            )
            # dedup re-appended ways within a tile (a way replayed in a
            # later batch must not double-draw): last write wins per
            # (tile_key, way_id)
            stored = stored.dropDuplicates(["tile_key", "way_id"])
            ways_flat = stored.select("way_id", "kind", "geometry")
            tiles = render_slippy_tiles(ways_flat, zoom, tile_px).join(
                F.broadcast(affected), "tile_key", "left_semi"
            )
            # 4. atomic per-file writes into the served tree
            write_tile_tree(tiles, tree, zoom).count()
        finally:
            fanned.unpersist()

    writer = ways_stream.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
