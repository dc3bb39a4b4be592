"""spark-submit entry point for the TRAINING-DATA pipeline (north rule:
the curation path must run "via spark-submit --py-files on a
multi-executor cluster", not just inside pytest).

Usage:
  zip -r /tmp/osm_render_spark.zip osm_render_spark
  spark-submit --master local[8] --py-files /tmp/osm_render_spark.zip \
      tools/run_training.py [n_images] [checkpoint_dir] [export_dir]

Generates the planted input_hint corpus on the executors, runs the
checkpointed decode→dedup→curate→split→pack pipeline, exports the
curated corpus as WebDataset tar shards, audits them against the
manifest, and prints a one-line JSON summary. A user-supplied
checkpoint_dir enables the resume workflow (rerun = cache hits);
auto-created scratch dirs are removed at exit.
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    auto_ckpt = len(sys.argv) <= 2
    ckpt = sys.argv[2] if not auto_ckpt else tempfile.mkdtemp(prefix="train_ckpt_")
    auto_export = len(sys.argv) <= 3
    export = sys.argv[3] if not auto_export else tempfile.mkdtemp(prefix="train_wds_")
    if auto_ckpt or auto_export:
        import atexit
        import shutil

        if auto_ckpt:
            atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
        if auto_export:
            atexit.register(shutil.rmtree, export, ignore_errors=True)

    spark = SparkSession.builder.appName("osm_render_spark_training").getOrCreate()
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F

    from osm_render_spark.fixtures.images import pipeline_corpus_df
    from osm_render_spark.pipeline import training_data_pipeline
    from osm_render_spark.plans.checkpoint import CheckpointStore
    from osm_render_spark.sources.webdataset import (
        verify_webdataset,
        write_webdataset,
    )

    corpus = pipeline_corpus_df(spark, n)
    out = training_data_pipeline(
        spark, corpus, CheckpointStore(ckpt), params={"corpus": "planted", "n": n}
    )
    curated_ids = out["curated"].select("image_id")
    export_rows = corpus.join(curated_ids, "image_id").select(
        "image_id", "bytes", "fmt", "caption"
    )
    stats = write_webdataset(export_rows, export, n_shards=8)
    audit = verify_webdataset(spark, export)
    n_ok = audit.where(F.col("ok")).count()
    splits = {
        r["split"]: r["n"]
        for r in out["splits"].groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "n_images": n,
                "checkpoint_dir": ckpt,
                "n_curated": curated_ids.count(),
                "splits": splits,
                "n_packed": out["packed"].count(),
                "export_shards": stats["n_shards"],
                "export_samples": stats["n_samples"],
                "shards_verified_ok": n_ok,
            },
            sort_keys=True,
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
