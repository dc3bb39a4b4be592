"""End-to-end reference-replacement entry point: render map tiles
straight from a real ``.osm.pbf`` — the reference's own workflow
(`make images`: Geofabrik extract → per-city render, Makefile.am:35-40)
re-expressed on Spark.

Usage:
  zip -r /tmp/osm_render_spark.zip osm_render_spark
  spark-submit --master local[8] --py-files /tmp/osm_render_spark.zip \
      tools/render_pbf.py INPUT.osm.pbf LAT_MIN LON_MIN LAT_MAX LON_MAX \
      OUT_DIR [ZOOM] [TILE_PX]

Pipeline: read_pbf (framed-blob decode) → ways_in_rect (the two-pass
spatial join + relation tag merge) → kind classification (additive,
pipeline.project_ways semantics) → render_slippy_tiles → write_tile_tree
(z/x/y PNG files + manifest). Prints a one-line JSON summary.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def render_pbf(
    spark,
    pbf_path: str,
    bbox: tuple[float, float, float, float],
    out_dir: str,
    zoom: int = 12,
    tile_px: int = 256,
) -> dict:
    """Run the pipeline; returns the summary dict (n_ways, n_tiles...)."""
    from pyspark.sql import functions as F

    from osm_render_spark.functions.predicates import (
        has_bridge,
        is_coastline,
        is_water,
    )
    from osm_render_spark.operators.ways_in_rect import ways_in_rect
    from osm_render_spark.raster.ops import render_slippy_tiles
    from osm_render_spark.raster.sink import write_tile_tree
    from osm_render_spark.sources.pbf import read_pbf

    nodes, ways, rels = read_pbf(spark, pbf_path)
    matched = ways_in_rect(nodes, ways, rels, bbox)

    # additive kind classification (pipeline.project_ways semantics —
    # the reference's independent render passes)
    tags = F.col("tags")
    is_b = has_bridge(tags)
    is_c = F.coalesce(is_coastline(tags), F.lit(False))
    is_w = F.coalesce(is_water(tags), F.lit(False))
    kinds = F.array_compact(
        F.array(
            F.when(is_w | (~is_b & ~is_c), F.lit("water")),
            F.when(is_c, F.lit("coast")),
            F.when(is_b, F.lit("bridge")),
        )
    )
    scene_ways = matched.select(
        "way_id", F.explode(kinds).alias("kind"), "geometry"
    )
    tiles = render_slippy_tiles(scene_ways, zoom=zoom, tile_px=tile_px)
    manifest = write_tile_tree(tiles, out_dir, zoom)
    n_tiles = manifest.count()
    return {
        "pbf": pbf_path,
        "bbox": list(bbox),
        "zoom": zoom,
        "n_ways": matched.count(),
        "n_tiles": n_tiles,
        "out_dir": out_dir,
    }


def main() -> int:
    from pyspark.sql import SparkSession

    if len(sys.argv) < 7:
        print(__doc__, file=sys.stderr)
        return 2
    pbf_path = sys.argv[1]
    bbox = tuple(float(v) for v in sys.argv[2:6])
    out_dir = sys.argv[6]
    zoom = int(sys.argv[7]) if len(sys.argv) > 7 else 12
    tile_px = int(sys.argv[8]) if len(sys.argv) > 8 else 256

    spark = SparkSession.builder.appName("osm_render_spark_pbf").getOrCreate()
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.sparkContext.setLogLevel("WARN")
    print(json.dumps(render_pbf(spark, pbf_path, bbox, out_dir, zoom, tile_px)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
