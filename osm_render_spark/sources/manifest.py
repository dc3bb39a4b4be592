"""File-manifest pruning — the Iceberg-manifest analog (SURVEY.md S4/S6).

The reference reads only a file's header blob to get its bbox, then skips
files whose bbox can't contain the query (MapData.m:290-359,
OsmRender.m:986-993). Iceberg does the same with per-file column min/max
stats in manifests. Without Iceberg jars, this module keeps an explicit
manifest: ``write_dataset`` writes the table partitioned into files
bucketed by a sort on the cell key and records per-file (cell_min,
cell_max, row_count); ``read_pruned`` consults the manifest and hands
Spark ONLY the files whose range intersects the query — file skipping
before any data IO, exactly the reference's header-probe semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest"


def _resolve(path: str, name: str) -> str:
    """Manifest entries are relative basenames (see write_dataset);
    absolute entries from pre-relocatable manifests still resolve."""
    return name if "/" in name else os.path.join(path, name)


def write_dataset(
    df: DataFrame, path: str, cell_col: str, n_files: int
) -> None:
    """Range-partition by ``cell_col`` into ``n_files`` files (so each
    file owns a compact cell range — the precondition for useful min/max
    pruning), then record per-file stats in the manifest."""
    spark = df.sparkSession
    (
        df.repartitionByRange(n_files, F.col(cell_col))
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    # store the BASENAME, not input_file_name()'s absolute URI: the
    # manifest must survive a directory rename (compaction's atomic
    # swap writes into a tmp dir and renames it into place — absolute
    # paths would strand every entry; relative ones make the table
    # relocatable). Files are flat under path by construction here.
    data = spark.read.parquet(path).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    manifest = data.groupBy("_file").agg(
        F.min(cell_col).alias("cell_min"),
        F.max(cell_col).alias("cell_max"),
        F.count("*").alias("row_count"),
    )
    manifest.write.mode("overwrite").parquet(os.path.join(path, MANIFEST))


def pruned_files(
    spark: SparkSession, path: str, cell_lo: int, cell_hi: int
) -> list[str]:
    m = spark.read.parquet(os.path.join(path, MANIFEST))
    rows = m.where(
        (F.col("cell_max") >= cell_lo) & (F.col("cell_min") <= cell_hi)
    ).collect()
    return [_resolve(path, r["_file"]) for r in rows]


def read_pruned(
    spark: SparkSession, path: str, cell_col: str, cell_lo: int, cell_hi: int
) -> DataFrame:
    """Read only the files whose cell range intersects [cell_lo, cell_hi]
    (the residual WHERE is still applied — pruning is a superset)."""
    files = pruned_files(spark, path, cell_lo, cell_hi)
    if not files:
        return (
            spark.read.parquet(path)
            .where(F.lit(False))
        )
    df = spark.read.parquet(*files)
    return df.where((F.col(cell_col) >= cell_lo) & (F.col(cell_col) <= cell_hi))


def is_path_not_found(e) -> bool:
    """Classify an AnalysisException as the missing-path condition —
    the ONE probe used everywhere a table is optional (streaming dedup
    side table, optional IVF quantized stores), so the error-class
    dance (getCondition vs the deprecated getErrorClass) lives in one
    place, next to the rest of the optional-file-tree machinery.
    Anything else — permissions, corrupt footers, transient FS errors —
    is NOT a missing table and must propagate."""
    cond = (
        e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
    ) or ""
    return cond == "PATH_NOT_FOUND"


def read_optional_parquet(
    spark: SparkSession, path: str, before_batch: int | None = None
):
    """Read a table that may not exist yet (first micro-batch of a
    streaming sink): returns the DataFrame, or None iff the path is
    absent — any OTHER failure (permissions, corrupt footer, transient
    FS error) propagates, because silently treating it as "first batch"
    would skip a dedup anti-join and emit duplicates. With
    ``before_batch``, filters to ``batch_id < N`` (the replay-safety
    convention: a half-written replayed batch must not suppress its own
    rows)."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.option("basePath", path).parquet(path)
    except AnalysisException as e:
        if not is_path_not_found(e):
            raise
        return None
    if before_batch is not None:
        df = df.where(F.col("batch_id") < F.lit(int(before_batch)))
    return df


class dynamic_partition_overwrite:
    """Context manager scoping partitionOverwriteMode=dynamic — the
    idempotent-replay write mode every batch_id-partitioned streaming
    sink uses; restores the previous mode on exit."""

    _KEY = "spark.sql.sources.partitionOverwriteMode"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get(self._KEY, "static")
        self.spark.conf.set(self._KEY, "dynamic")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set(self._KEY, self.old)
        return False
