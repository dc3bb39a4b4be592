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

Updates are first-class: a way re-sent with new geometry wins
deterministically (a per-way latest-batch side table marks superseded
store rows dead — including old rows in tiles the way moved AWAY from,
which are also re-rendered), and rows are deduplicated to one per way
before the re-render so a multi-tile way is never double-drawn into the
even-odd fill.

Cost per batch: O(batch fan-out + ways-in-affected-tiles) for the
re-render — the un-touched tile majority is never read, re-rendered, or
rewritten — plus two bookkeeping terms that are cheap but not
batch-local: the latest-batch upsert is O(distinct ways seen) over an
ids-only table, and the moved-away-tile lookup scans the store for the
batch's way ids (at 10^12 ways, give the store a way_id-bucketed twin
or a way→tiles index to make that lookup pruned too). At 10^12 ways the
way store is the bucketed/partitioned table and the re-render's scan
prunes to the affected tile partitions (pinned for the batch engine in
tests/test_plans.py's partition-pruning test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..raster.ops import fan_out_tiles, render_slippy_tiles
from ..raster.sink import write_tile_tree


def _newest_committed(prefix: str) -> str | None:
    """Newest COMMITTED version dir ``{prefix}{N}`` (has _SUCCESS).
    Versioned dirs (never deleted-then-renamed in place) make upserts
    crash-safe: a kill between writing vN and pruning vN-1 leaves both
    and the reader picks the newest committed one; a kill mid-write
    leaves vN without _SUCCESS and it is ignored. One definition shared
    by the per-batch upsert and compact_way_store — a protocol change
    cannot desynchronize them."""
    parent = os.path.dirname(prefix)
    base = os.path.basename(prefix)
    versions = []
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            if d.startswith(base) and os.path.exists(
                os.path.join(parent, d, "_SUCCESS")
            ):
                versions.append(int(d[len(base):]))
    return f"{prefix}{max(versions)}" if versions else None


def _recover_store(store: str) -> None:
    """Heal a compaction interrupted between its two renames: if the
    store dir is missing, adopt the completed compacted copy (newest)
    or the set-aside original. Called by both the stream and
    compact_way_store, so no crash sequencing can leave the store
    looking permanently empty."""
    if os.path.exists(store):
        return
    for cand in (f"{store}.compact", f"{store}.old"):
        if os.path.exists(cand):
            os.rename(cand, store)
            return


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
    latest_prefix = os.path.join(out_dir, "_way_latest_v")

    def _newest_latest_dir() -> str | None:
        return _newest_committed(latest_prefix)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch.sparkSession
        # within-batch conflict resolution: a single micro-batch may carry
        # several versions of one way (no maxFilesPerTrigger); batches are
        # unordered sets so "latest" is undefined INSIDE one — pick a
        # DETERMINISTIC content-keyed winner (max geometry hash) so the
        # rendered tile never flips between runs or replays
        wv = Window.partitionBy("way_id").orderBy(
            F.xxhash64("kind", "geometry").desc()
        )
        batch_one = (
            batch.withColumn("_rn", F.row_number().over(wv))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        fanned = (
            fan_out_tiles(batch_one, zoom)
            .select("way_id", "kind", "geometry", "tile_key")
            .withColumn("batch_id", F.lit(int(batch_id)))
            .persist()
        )
        affected = None
        try:
            if fanned.isEmpty():
                return
            batch_ways = (
                fanned.select("way_id").distinct()
                .withColumn("latest_batch", F.lit(int(batch_id)))
            )
            _recover_store(store)  # heal an interrupted compaction
            store_exists = os.path.exists(store)
            # affected = the batch's NEW tiles ∪ tiles the batch's ways
            # covered BEFORE (a geometry update must also re-render the
            # tiles the way moved AWAY from, else they keep stale pixels)
            affected = fanned.select("tile_key").distinct()
            if store_exists:
                old_tiles = (
                    spark.read.parquet(store)
                    .join(F.broadcast(batch_ways), "way_id", "left_semi")
                    .select("tile_key")
                    .distinct()
                )
                affected = affected.union(old_tiles).distinct()
            affected = affected.persist()
            affected.count()
            # 1a. append the batch's fan-out to the tile-partitioned store
            fanned.write.mode("append").partitionBy("tile_key").parquet(store)
            # 1b. upsert the per-way latest-batch side table (way_id →
            # latest_batch). This is what makes superseded rows DEAD
            # forever: without it, a way that moved away from tile T
            # leaves old-geometry rows there, and a LATER batch touching
            # T would resurrect them (the newer rows live only in other
            # tiles). Versioned write (see _newest_latest_dir): the new
            # version commits fully before older ones are pruned, so no
            # crash window can lose the table.
            prev = _newest_latest_dir()
            new_dir = f"{latest_prefix}{int(batch_id)}"
            if prev == new_dir:
                # REPLAYED batch (crash after the side-table commit but
                # before the streaming checkpoint): vN already contains
                # this batch's upsert — rewriting it would read and
                # overwrite the same path in one job. Reuse it as-is.
                pass
            else:
                if prev is not None:
                    merged = (
                        spark.read.parquet(prev)
                        .unionByName(batch_ways)
                        .groupBy("way_id")
                        .agg(F.max("latest_batch").alias("latest_batch"))
                    )
                else:
                    merged = batch_ways
                merged.write.mode("overwrite").parquet(new_dir)
                # prune older committed versions (best effort, AFTER commit)
                parent = os.path.dirname(latest_prefix)
                base = os.path.basename(latest_prefix)
                for d in os.listdir(parent):
                    if d.startswith(base) and d != os.path.basename(new_dir):
                        shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
            # 2-3. re-render ONLY the affected tiles: store rows in those
            # tiles, filtered to each way's LATEST version, deduplicated
            # to ONE row per way — render_slippy_tiles re-fans each way
            # itself, so keeping the per-tile fan-out copies would draw a
            # multi-tile way once PER COPY into the same even-odd fill,
            # where duplicates cancel (water → land).
            way_latest = spark.read.parquet(new_dir)
            store_rows = spark.read.parquet(store).join(
                F.broadcast(affected), "tile_key", "left_semi"
            )
            latest = (
                store_rows.join(
                    way_latest,
                    (store_rows["way_id"] == way_latest["way_id"])
                    & (store_rows["batch_id"] == way_latest["latest_batch"]),
                    "left_semi",
                )
                # per-tile fan-out copies of one (way, batch) version are
                # identical rows — batch_one guarantees one version per
                # batch, so this dedup is content-safe
                .dropDuplicates(["way_id"])
                .select("way_id", "kind", "geometry")
            )
            tiles = render_slippy_tiles(latest, zoom, tile_px).join(
                F.broadcast(affected), "tile_key", "left_semi"
            )
            # 4. atomic per-file writes into the served tree
            manifest = write_tile_tree(tiles, tree, zoom)
            written = {r["tile_key"] for r in manifest.select("tile_key").collect()}
            # 5. VACATED tiles: an affected tile that no remaining way
            # covers gets no render group at all — its old PNG must be
            # DELETED or the tree serves the moved-away geometry forever.
            # (Matches the batch renderer's tile set, which only contains
            # covered tiles.) The affected set is per-batch small, so the
            # driver-side remove is bounded.
            n = 1 << zoom
            for r in affected.collect():
                tk = r["tile_key"]
                if tk not in written:
                    p = os.path.join(
                        tree, f"z{zoom}", f"x{tk // n}", f"y{tk % n}.png"
                    )
                    if os.path.exists(p):
                        os.remove(p)
        finally:
            fanned.unpersist()
            if affected is not None:
                affected.unpersist()

    writer = ways_stream.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


def compact_way_store(spark, out_dir: str) -> int:
    """Offline maintenance: rewrite the way store keeping ONLY each way's
    latest-version rows — under a heavy update stream the store otherwise
    grows with every superseded version (they are logically dead via the
    latest-batch table but still occupy storage and the moved-away-tile
    lookup's scan). MUST run while the stream is stopped (the swap is a
    directory replace, not transactional against a concurrent batch).
    Returns the number of rows retained. Kept rows keep their original
    batch_id, so the latest-batch semi-join is unaffected."""
    import shutil

    from pyspark.sql import functions as F

    store = os.path.join(out_dir, "_way_store")
    _recover_store(store)
    if not os.path.exists(store):
        return 0
    newest = _newest_committed(os.path.join(out_dir, "_way_latest_v"))
    if newest is None:
        return 0
    way_latest = spark.read.parquet(newest)
    rows = spark.read.parquet(store)
    kept = rows.join(
        way_latest,
        (rows["way_id"] == way_latest["way_id"])
        & (rows["batch_id"] == way_latest["latest_batch"]),
        "left_semi",
    )
    tmp = f"{store}.compact"
    kept.write.mode("overwrite").partitionBy("tile_key").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    # crash-safe swap (shared with plans/compact): rename the old aside
    # first (both renames are atomic), then drop it. A kill between the
    # renames leaves {store}.old to garbage-collect, never a lost store
    # that would silently restart history as empty. No census guard:
    # this runs inside the foreachBatch, which is the store's only
    # writer by construction.
    from ..plans.compact import atomic_dir_swap

    atomic_dir_swap(store, tmp)
    return n
