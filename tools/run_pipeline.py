"""spark-submit entry point (north rule: "runs via spark-submit
--py-files on a multi-executor cluster").

Usage:
  zip -r /tmp/osm_render_spark.zip osm_render_spark
  spark-submit --master local[8] --py-files /tmp/osm_render_spark.zip \
      tools/run_pipeline.py [scene] [checkpoint_dir]

Runs the full checkpointed scene pipeline and prints a one-line JSON
summary. On a real cluster the same invocation targets YARN/K8s masters;
nothing in the package assumes local mode.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> int:
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "bridges"
    auto_ckpt = len(sys.argv) <= 2
    ckpt = sys.argv[2] if not auto_ckpt else tempfile.mkdtemp(prefix="pipe_ckpt_")
    if auto_ckpt:
        # an auto-created scratch checkpoint is removed at exit; a
        # user-supplied dir (the reuse-the-cache workflow) is kept
        import atexit
        import shutil

        atexit.register(shutil.rmtree, ckpt, ignore_errors=True)

    spark = SparkSession.builder.appName("osm_render_spark_pipeline").getOrCreate()
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.sparkContext.setLogLevel("WARN")

    from osm_render_spark.fixtures.osm import ALL_SCENES
    from osm_render_spark.pipeline import render_scene_pipeline
    from osm_render_spark.plans.checkpoint import CheckpointStore

    scene = ALL_SCENES[scene_name]()
    lat_min, lon_min, lat_max, lon_max = scene.bbox
    mid_lat = (lat_min + lat_max) / 2
    mid_lon = (lon_min + lon_max) / 2
    areas = spark.createDataFrame(
        [
            (
                0,
                0,
                [
                    (mid_lon - 0.02, mid_lat - 0.02),
                    (mid_lon + 0.02, mid_lat - 0.02),
                    (mid_lon + 0.02, mid_lat + 0.02),
                    (mid_lon - 0.02, mid_lat + 0.02),
                ],
            )
        ],
        "scene_id long, area_id long, polygon array<struct<lon:double,lat:double>>",
    )
    out = render_scene_pipeline(spark, scene, areas, CheckpointStore(ckpt))
    summary = {
        "scene": scene_name,
        "checkpoint_dir": ckpt,
        "n_ways": out["ways"].count(),
        "n_tiles": out["tiles"].count(),
        "n_sprites": out["sprites"].count(),
        "n_callouts": out["callouts"].count(),
        "atlas_sprites": out["atlas"].collect()[0]["n_sprites"],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
