"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``osm_render_spark`` (see SURVEY.md §2 for the
operator inventory this covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from osm_render_spark.queries import build_queries, flagship_df  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: assign image points and
    feature points to Web-Mercator tiles, join per tile, aggregate."""
    return flagship_df(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark_fn for name, qd in build_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in build_queries().items() if qd.oracle is not None
    }
