"""Tile-tree PNG sink — the engine's equivalent of the reference's
actual OUTPUT (PNG files on disk: the scene/sprite writes at
OsmRender.m:1243-1257 and the '%@-%02lu-callout.png' names at
OsmRender.m:1286-1290 / operator F11).

Two layouts:

* ``write_tile_tree``: slippy ``{out}/z{z}/x{x}/y{y}.png`` — one file
  per rendered tile, written FROM THE EXECUTORS (foreachPartition-style
  mapInPandas; the driver never sees tile bytes), plus a returned
  manifest DataFrame (tile_key, path, n_bytes) for downstream joins and
  idempotent re-runs. Files are written to a temp name and renamed, so
  a killed job leaves no truncated PNGs, and a rerun overwrites
  deterministically (same bytes → same file).
* ``write_sprite_files``: scene sprite/callout naming per F11.

At 100 TB the same kernel shape targets an object store via whatever
filesystem the cluster mounts; the manifest (not a directory listing)
is the source of truth, mirroring sources/manifest.py on the read side.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame


def _write_atomic(path: str, data: bytes) -> int:
    """Write-then-rename with a WRITER-UNIQUE temp name: speculative or
    retried task attempts may write the same tile concurrently, and a
    shared '{path}.tmp' would interleave their bytes before the rename
    (a torn PNG behind the atomicity guarantee). Each attempt renames
    its own complete file; last rename wins with identical bytes."""
    import uuid

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(data)


def write_tile_tree(tiles: DataFrame, out_dir: str, zoom: int) -> DataFrame:
    """tiles(tile_key, tile_x, tile_y, bytes, ...) → files
    ``{out_dir}/z{zoom}/x{tile_x}/y{tile_y}.png`` + manifest DF.
    The write happens inside the returned DataFrame's evaluation
    (executor-side); collect()/write the manifest to materialize."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                path = os.path.join(
                    out_dir, f"z{zoom}", f"x{int(r.tile_x)}", f"y{int(r.tile_y)}.png"
                )
                n = _write_atomic(path, bytes(r.bytes))
                rows.append((int(r.tile_key), path, n))
            yield pd.DataFrame(rows, columns=["tile_key", "path", "n_bytes"])

    return tiles.select("tile_key", "tile_x", "tile_y", "bytes").mapInPandas(
        kernel, schema="tile_key long, path string, n_bytes long"
    )


def write_sprite_files(sprites: DataFrame, out_dir: str) -> DataFrame:
    """sprites(scene_id, area_id, mode, sprite, ...) → files named per
    the reference's callout convention (F11, OsmRender.m:1286-1290):
    ``scene{scene_id}-{area_id:02d}-{mode}.png`` — '%02lu' semantics:
    pad to two digits, NEVER truncate (area ids ≥ 100 keep all digits;
    a % 100 here would silently overwrite colliding sprites). Returns
    the manifest."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                fname = f"scene{int(r.scene_id)}-{int(r.area_id):02d}-{r.mode}.png"
                path = os.path.join(out_dir, fname)
                n = _write_atomic(path, bytes(r.sprite))
                rows.append((int(r.scene_id), int(r.area_id), r.mode, path, n))
            yield pd.DataFrame(
                rows, columns=["scene_id", "area_id", "mode", "path", "n_bytes"]
            )

    return sprites.select("scene_id", "area_id", "mode", "sprite").mapInPandas(
        kernel,
        schema="scene_id long, area_id long, mode string, path string, n_bytes long",
    )


def write_pyramid_tree(pyramid: DataFrame, out_dir: str) -> DataFrame:
    """Multi-zoom variant of write_tile_tree for build_tile_pyramid's
    output (carries a ``zoom`` column): every level lands in its own
    ``{out}/z{z}/x{x}/y{y}.png`` slot of ONE slippy tree — the layout a
    tile server mounts directly. Same executor-side atomic writes and
    manifest contract (zoom, tile_key, path, n_bytes)."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                path = os.path.join(
                    out_dir,
                    f"z{int(r.zoom)}",
                    f"x{int(r.tile_x)}",
                    f"y{int(r.tile_y)}.png",
                )
                n = _write_atomic(path, bytes(r.bytes))
                rows.append((int(r.zoom), int(r.tile_key), path, n))
            yield pd.DataFrame(
                rows, columns=["zoom", "tile_key", "path", "n_bytes"]
            )

    return pyramid.select("zoom", "tile_key", "tile_x", "tile_y", "bytes").mapInPandas(
        kernel, schema="zoom long, tile_key long, path string, n_bytes long"
    )
