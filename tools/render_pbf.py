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
    """Run the pipeline; returns the summary dict (n_ways, n_tiles...).
    Self-sufficient on a bare SparkSession (sets the LAST_WIN map policy
    the relation tag merge needs)."""
    from pyspark.sql import functions as F

    from osm_render_spark.functions.predicates import classify_kinds
    from osm_render_spark.operators.ways_in_rect import ways_in_rect
    from osm_render_spark.raster.ops import render_slippy_tiles
    from osm_render_spark.raster.sink import write_tile_tree
    from osm_render_spark.sources.pbf import read_pbf

    # relation tag merge (map_concat) raises DUPLICATE_MAP_KEY under the
    # default EXCEPTION policy — set it here so direct callers work too
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")

    nodes, ways, rels = read_pbf(spark, pbf_path)
    # persist: matched feeds BOTH the render and the summary count —
    # without it the PBF decode + two-pass spatial join runs twice
    matched = ways_in_rect(nodes, ways, rels, bbox).persist()
    try:
        n_ways = matched.count()
        scene_ways = matched.select(
            "way_id",
            F.explode(classify_kinds(F.col("tags"))).alias("kind"),
            "geometry",
        )
        tiles = render_slippy_tiles(scene_ways, zoom=zoom, tile_px=tile_px)
        n_tiles = write_tile_tree(tiles, out_dir, zoom).count()
    finally:
        matched.unpersist()
    return {
        "pbf": pbf_path,
        "bbox": list(bbox),
        "zoom": zoom,
        "n_ways": n_ways,
        "n_tiles": n_tiles,
        "out_dir": out_dir,
    }


def render_cities(
    spark,
    pbf_path: str,
    cities: list[dict],
    out_dir: str,
    zoom: int = 12,
    tile_px: int = 256,
) -> list[dict]:
    """The full `make images` analog: ONE decode of the extract, then a
    render per configured city (cities.cfg semantics: name + bbox).
    ``cities`` = [{"name": str, "bbox": [lat0, lon0, lat1, lon1]}, ...].
    The decoded entity tables are persisted across cities so the
    framed-blob decode runs once, not once per city; each city's tiles
    land under ``{out_dir}/{name}``. Returns one summary dict per city."""
    from pyspark.sql import functions as F

    from osm_render_spark.functions.predicates import classify_kinds
    from osm_render_spark.operators.ways_in_rect import ways_in_rect
    from osm_render_spark.raster.ops import render_slippy_tiles
    from osm_render_spark.raster.sink import write_tile_tree
    from osm_render_spark.sources.pbf import read_pbf

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    nodes, ways, rels = read_pbf(spark, pbf_path)
    nodes, ways, rels = nodes.persist(), ways.persist(), rels.persist()
    summaries = []
    try:
        for city in cities:
            name = city["name"]
            bbox = tuple(float(v) for v in city["bbox"])
            matched = ways_in_rect(nodes, ways, rels, bbox).persist()
            try:
                n_ways = matched.count()
                scene_ways = matched.select(
                    "way_id",
                    F.explode(classify_kinds(F.col("tags"))).alias("kind"),
                    "geometry",
                )
                tiles = render_slippy_tiles(scene_ways, zoom=zoom, tile_px=tile_px)
                city_out = os.path.join(out_dir, name)
                n_tiles = write_tile_tree(tiles, city_out, zoom).count()
            finally:
                matched.unpersist()
            summaries.append(
                {
                    "name": name,
                    "bbox": list(bbox),
                    "n_ways": n_ways,
                    "n_tiles": n_tiles,
                    "out_dir": city_out,
                }
            )
    finally:
        nodes.unpersist()
        ways.unpersist()
        rels.unpersist()
    return summaries


def main() -> int:
    from pyspark.sql import SparkSession

    # cities mode: render_pbf.py --cities INPUT.osm.pbf CITIES.json OUT [Z] [PX]
    if len(sys.argv) >= 2 and sys.argv[1] == "--cities":
        if len(sys.argv) < 5:
            print(__doc__, file=sys.stderr)
            return 2
        spark = SparkSession.builder.appName("osm_render_spark_cities").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        with open(sys.argv[3]) as f:
            cities = json.load(f)
        zoom = int(sys.argv[5]) if len(sys.argv) > 5 else 12
        px = int(sys.argv[6]) if len(sys.argv) > 6 else 256
        print(json.dumps(render_cities(spark, sys.argv[2], cities, sys.argv[4], zoom, px)))
        return 0

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
