"""spark-submit entry point for the TERRAIN product: GeoTIFF DEM
mosaic → segment-pointer ingest → distributed hillshade (perimeter
halo exchange) → PNG slippy pyramid tree.

Usage:
  zip -r /tmp/osm_render_spark.zip osm_render_spark
  spark-submit --master local[8] --py-files /tmp/osm_render_spark.zip \
      tools/run_terrain.py [quad_px] [tile_px] [out_dir]

Synthesises a 2×2 quadrant mosaic of GeoTIFF DEMs from one GLOBAL
closed form (so quadrant seams are real data continuations — the halo
exchange is exercised across file boundaries), ingests via the
header-only segment index, hillshades every tile with ONE exchange,
PNG-encodes, rolls the full pyramid, writes the z/x/y tree, and prints
a one-line JSON summary. Nothing assumes local mode.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> int:
    quad_px = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tile_px = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out_dir = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(prefix="terrain_")

    spark = SparkSession.builder.appName("osm_render_spark_terrain").getOrCreate()
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.sparkContext.setLogLevel("WARN")

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from osm_render_spark.raster.codec import encode_png
    from osm_render_spark.raster.geotiff import GeoRef, encode_geotiff
    from osm_render_spark.raster.pyramid import build_tile_pyramid
    from osm_render_spark.raster.sink import write_pyramid_tree
    from osm_render_spark.raster.terrain import terrain_tiles
    from osm_render_spark.sources.geotiff_source import read_geotiff_tiles

    if quad_px % tile_px:
        raise SystemExit("quad_px must be a multiple of tile_px")
    n_across = 2 * quad_px // tile_px
    base_zoom = max(1, math.ceil(math.log2(n_across)))

    # --- quadrant GeoTIFFs from one global ridged surface ------------
    dem_dir = tempfile.mkdtemp(prefix="terrain_dem_")
    layouts = [
        dict(tile=(tile_px, tile_px), compression="deflate", predictor=2),
        dict(rows_per_strip=tile_px, compression="lzw", predictor=2),
        dict(tile=(tile_px * 2, tile_px * 2), compression="packbits"),
        dict(rows_per_strip=37, compression="deflate", predictor=2),
    ]
    paths = []
    for qi in range(2):
        for qj in range(2):
            gy, gx = np.mgrid[0:quad_px, 0:quad_px].astype(np.int64)
            gx += qj * quad_px
            gy += qi * quad_px
            dem = (
                (gx * 3 + gy * 7) % 512
                + ((gx * gx + gy * gy) // 257) % 997
                + ((gx // 64 + gy // 64) % 2) * 300
            ).astype(np.int32)
            p = os.path.join(dem_dir, f"q{qi}{qj}.tif")
            with open(p, "wb") as f:
                f.write(
                    encode_geotiff(
                        dem,
                        georef=GeoRef(qj * 1.0, 46.0 - qi * 1.0, 1e-3, 1e-3),
                        **layouts[qi * 2 + qj],
                    )
                )
            paths.append(p)

    # --- ingest, fold quadrants into ONE global grid, hillshade ------
    tiles = read_geotiff_tiles(spark, paths, tile_px).selectExpr(
        f"CAST(substring(raster, 3, 1) AS BIGINT) * {quad_px // tile_px}"
        " + tx AS tx",
        f"CAST(substring(raster, 2, 1) AS BIGINT) * {quad_px // tile_px}"
        " + ty AS ty",
        "dem",
    )
    shaded = terrain_tiles(tiles, tile_px, mode="hillshade", cellsize=30.0)

    # --- PNG encode + pyramid manifest columns ------------------------
    def to_png(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = np.frombuffer(r.shade, np.uint8).reshape(tile_px, tile_px)
                rows.append(
                    (int(r.tx) * n_across + int(r.ty), int(r.tx), int(r.ty),
                     encode_png(a), 1, 0)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "tile_key", "tile_x", "tile_y", "bytes", "n_ways",
                    "way_sum",
                ],
            )

    base = shaded.mapInPandas(
        to_png,
        schema=(
            "tile_key long, tile_x long, tile_y long, bytes binary, "
            "n_ways long, way_sum long"
        ),
    )
    pyramid = build_tile_pyramid(base, base_zoom, zoom_min=0, tile_px=tile_px)
    manifest = write_pyramid_tree(pyramid, out_dir)
    by_zoom = {
        int(r["zoom"]): int(r["n"])
        for r in manifest.groupBy("zoom").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "entry": "run_terrain",
                "quad_px": quad_px,
                "tile_px": tile_px,
                "base_zoom": base_zoom,
                "tiles_base": by_zoom.get(base_zoom, 0),
                "tiles_total": sum(by_zoom.values()),
                "levels": len(by_zoom),
                "out_dir": out_dir,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
