"""Scene-config JSON source (SURVEY.md S7, reference
OsmRenderLoadNeighborhoods, OsmRender.m:851-949).

The reference streams a city-config JSON and extracts: the scene bbox
(``areaBox``, normalized by swapping inverted bounds, OsmRender.m:893-909),
neighborhood polygons with labels/centers/types (OsmRender.m:913-946),
and landmarks with a display flag (OsmRender.m:948, consumed :821-829).
Polygon vertices come as "lat lon" strings, comma-separated
(OsmRender.m:923-927 — note lat FIRST).

Spark form: ``from_json`` with an explicit schema (never inference in
production), higher-order functions for the vertex parsing — all
JVM-side Column work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONFIG_SCHEMA = T.StructType(
    [
        T.StructField(
            "areaBox",
            T.StructType(
                [
                    T.StructField("latMin", T.DoubleType()),
                    T.StructField("lonMin", T.DoubleType()),
                    T.StructField("latMax", T.DoubleType()),
                    T.StructField("lonMax", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "areas",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("label", T.StringType()),
                        T.StructField("vertices", T.StringType()),  # "lat lon, lat lon"
                        T.StructField("centerLat", T.DoubleType()),
                        T.StructField("centerLon", T.DoubleType()),
                        T.StructField("type", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "landmarks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("label", T.StringType()),
                        T.StructField("lat", T.DoubleType()),
                        T.StructField("lon", T.DoubleType()),
                        T.StructField("display", T.BooleanType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_config(configs: DataFrame, json_col: str = "config_json") -> DataFrame:
    """(scene_id, config_json) → parsed struct with NORMALIZED bbox
    (P11: inverted bounds swapped via least/greatest)."""
    parsed = configs.withColumn("cfg", F.from_json(F.col(json_col), CONFIG_SCHEMA))
    return parsed.select(
        "scene_id",
        F.least("cfg.areaBox.latMin", "cfg.areaBox.latMax").alias("lat_min"),
        F.least("cfg.areaBox.lonMin", "cfg.areaBox.lonMax").alias("lon_min"),
        F.greatest("cfg.areaBox.latMin", "cfg.areaBox.latMax").alias("lat_max"),
        F.greatest("cfg.areaBox.lonMin", "cfg.areaBox.lonMax").alias("lon_max"),
        F.col("cfg.areas").alias("areas"),
        F.col("cfg.landmarks").alias("landmarks"),
    )


def areas_table(parsed: DataFrame) -> DataFrame:
    """Explode areas; parse "lat lon" vertex strings (F1/F2 — lat FIRST,
    OsmRender.m:925); area_id is positional (activeArea is an index in the
    reference, OsmRender.m:662-713)."""
    ex = parsed.select(
        "scene_id", F.posexplode("areas").alias("area_id", "a")
    )
    verts = F.transform(
        F.split(F.col("a.vertices"), ",\\s*"),
        lambda s: F.struct(
            F.split(s, " ")[1].cast("double").alias("lon"),
            F.split(s, " ")[0].cast("double").alias("lat"),
        ),
    )
    return ex.select(
        "scene_id",
        F.col("area_id").cast("long").alias("area_id"),
        F.col("a.label").alias("label"),
        verts.alias("polygon"),
        F.struct(
            F.col("a.centerLon").alias("lon"), F.col("a.centerLat").alias("lat")
        ).alias("center"),
        F.col("a.type").alias("type"),
    )


def landmarks_table(parsed: DataFrame) -> DataFrame:
    """Explode landmarks and apply the display filter (P4,
    OsmRender.m:821-822)."""
    ex = parsed.select("scene_id", F.explode("landmarks").alias("l"))
    return ex.select(
        "scene_id",
        F.col("l.label").alias("label"),
        F.col("l.lon").alias("lon"),
        F.col("l.lat").alias("lat"),
        F.col("l.display").alias("display"),
    ).where(F.col("display"))


def demo_config(scene_id: int = 0) -> tuple[int, str]:
    """A deterministic config JSON (inverted bbox on purpose — pins P11)."""
    import json

    cfg = {
        "areaBox": {"latMin": 10.1, "lonMin": 20.1, "latMax": 10.0, "lonMax": 20.0},
        "areas": [
            {
                "label": "Old Town\nCenter",
                "vertices": "10.02 20.02, 10.02 20.05, 10.05 20.05, 10.05 20.02",
                "centerLat": 10.035,
                "centerLon": 20.035,
                "type": 0,
            },
            {
                "label": "Park",
                "vertices": "10.06 20.06, 10.06 20.08, 10.08 20.07",
                "centerLat": 10.066,
                "centerLon": 20.07,
                "type": 2,
            },
        ],
        "landmarks": [
            {"label": "Museum", "lat": 10.03, "lon": 20.03, "display": True},
            {"label": "Hidden", "lat": 10.04, "lon": 20.04, "display": False},
        ],
    }
    return scene_id, json.dumps(cfg)


def load_demo_configs(spark: SparkSession, n_scenes: int = 1) -> DataFrame:
    return spark.createDataFrame(
        [demo_config(i) for i in range(n_scenes)], "scene_id long, config_json string"
    )
