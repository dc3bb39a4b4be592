"""SparkSession builder tuned for the engine.

Defaults are chosen for the sandbox (single JVM, ``local[N]``) but every
knob is the one we would set on a real 1000-executor cluster too:

* AQE on (runtime coalescing + skew-join splitting) — the reference has no
  skew handling at all (SURVEY.md §4); we rely on AQE plus explicit salting
  for hot tile cells.
* ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster this
  is overridden to ~2-3× total cores (AQE coalesces down).
* Arrow enabled — all custom kernels are pandas-on-Arrow (no per-row
  Python, per BASELINE.json input_hint).
* ``mapKeyDedupPolicy=LAST_WIN`` — required for the relation→way tag merge
  (J5): the reference merges relation tags *over* way tags
  (``addEntriesFromDictionary``, MapData.m:282), i.e. last write wins.
* Session timezone pinned to UTC so DuckDB-oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "osm_render_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    n = cpus or DEFAULT_CPUS
    shuffle = shuffle_partitions or max(n, 8)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet: keep pushdown + dictionary decode on (the reference's PBF
        # format has delta+dictionary encoding natively; Parquet is our
        # equivalent — SURVEY.md §1.2).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # spill-aware input sizing: ~128 MB splits keep a task's working set
        # well under executor memory even with wide image rows; at 100 TB
        # this bounds tasks at ~800k and AQE coalesces the small tail
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
