"""spark-submit entry point for the TILE-TREE product: base slippy
render → full pyramid → PNG z/x/y tree + MVT vector tiles.

Usage:
  zip -r /tmp/osm_render_spark.zip osm_render_spark
  spark-submit --master local[8] --py-files /tmp/osm_render_spark.zip \
      tools/run_tiles.py [n_ways] [base_zoom] [out_dir]

Synthesises ``n_ways`` rectangle water ways world-wide (the bench
fixture recipe — deterministic, no external data), renders the base
zoom once, rolls every ancestor level up, writes the PNG tree and the
base-zoom MVT tiles, and prints a one-line JSON summary. On a real
cluster the same invocation targets YARN/K8s; nothing assumes local
mode.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> int:
    n_ways = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    base_zoom = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    out_dir = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(prefix="tiles_")

    spark = SparkSession.builder.appName("osm_render_spark_tiles").getOrCreate()
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from osm_render_spark.functions.projection import (
        derived_lat_sql,
        derived_lon_sql,
    )
    from osm_render_spark.raster.mvt import vector_tiles
    from osm_render_spark.raster.ops import render_slippy_tiles
    from osm_render_spark.raster.pyramid import build_tile_pyramid
    from osm_render_spark.raster.sink import write_pyramid_tree

    d = 0.03
    ways = spark.range(n_ways).select(
        F.col("id").alias("way_id"),
        F.lit("water").alias("kind"),
        F.expr(
            f"""array(
              struct({derived_lon_sql('id * 13 + 5')} AS lon, {derived_lat_sql('id * 17 + 3')} AS lat),
              struct({derived_lon_sql('id * 13 + 5')} + {d} AS lon, {derived_lat_sql('id * 17 + 3')} AS lat),
              struct({derived_lon_sql('id * 13 + 5')} + {d} AS lon, {derived_lat_sql('id * 17 + 3')} + {d} AS lat),
              struct({derived_lon_sql('id * 13 + 5')} AS lon, {derived_lat_sql('id * 17 + 3')} + {d} AS lat),
              struct({derived_lon_sql('id * 13 + 5')} AS lon, {derived_lat_sql('id * 17 + 3')} AS lat)
            )"""
        ).alias("geometry"),
    )
    base = render_slippy_tiles(ways, base_zoom, 128)
    pyramid = build_tile_pyramid(base, base_zoom, zoom_min=0, tile_px=128)
    manifest = write_pyramid_tree(pyramid, f"{out_dir}/png")
    png_rows = manifest.collect()
    per_zoom: dict[int, int] = {}
    for r in png_rows:
        per_zoom[r["zoom"]] = per_zoom.get(r["zoom"], 0) + 1
    mvt = vector_tiles(ways, base_zoom, extent=4096)
    n_mvt = mvt.count()
    print(
        json.dumps(
            {
                "out_dir": out_dir,
                "n_ways": n_ways,
                "base_zoom": base_zoom,
                "png_tiles": len(png_rows),
                "png_tiles_per_zoom": {str(z): per_zoom[z] for z in sorted(per_zoom)},
                "png_bytes": sum(r["n_bytes"] for r in png_rows),
                "mvt_tiles": n_mvt,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
