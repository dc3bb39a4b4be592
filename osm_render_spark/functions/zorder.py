"""Z-order (Morton) clustering — the OPTIMIZE ZORDER analog for spatial
layouts. A 1-D sort on tile-x gives file-level min/max stats that prune
x-ranges but not y; interleaving the bits of (x, y) into one Morton key
makes a compact key range correspond to a compact 2-D block, so BOTH
axes of a bbox query prune at file level (manifest file skipping /
parquet row-group stats) — the standard multi-dimensional clustering
trick lakehouses ship as Z-ordering.

The bit-spread is written in shared-dialect SQL arithmetic: multiplies
and bitwise AND/OR only — Spark SQL has shiftleft() but no `<<`, DuckDB
has `<<` but no shiftleft(), and x*2^k is both engines' common ground
(inputs are < 2^16 so nothing approaches int64)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread16_sql(e: str) -> str:
    """Spread a 16-bit value's bits to the even positions of 32 bits:
    the classic mask ladder, shifts spelled as multiplies."""
    s = f"(({e}) & 65535)"
    s = f"(({s} | ({s} * 65536)) & 281470681808895)"   # 0x0000FFFF0000FFFF
    s = f"(({s} | ({s} * 256)) & 71777214294589695)"   # 0x00FF00FF00FF00FF
    s = f"(({s} | ({s} * 16)) & 1085102592571150095)"  # 0x0F0F0F0F0F0F0F0F
    s = f"(({s} | ({s} * 4)) & 3689348814741910323)"   # 0x3333333333333333
    s = f"(({s} | ({s} * 2)) & 6148914691236517205)"   # 0x5555555555555555
    return s


def morton_sql(x_expr: str, y_expr: str) -> str:
    """Morton interleave of two 16-bit values as shared SQL text
    (x bits land in odd positions, y in even)."""
    return f"({_spread16_sql(x_expr)} * 2 + {_spread16_sql(y_expr)})"


def morton_col(x, y):
    """Column form of morton_sql (same arithmetic, codegen)."""
    return F.expr(morton_sql(x if isinstance(x, str) else x._jc.toString(),
                             y if isinstance(y, str) else y._jc.toString()))


def zorder_write(
    df: DataFrame, path: str, x_col: str, y_col: str, n_files: int
) -> None:
    """Write ``df`` clustered by the Morton key of (x_col, y_col) using
    the manifest machinery (sources/manifest.write_dataset): each file
    owns a compact Morton range == a compact 2-D block, and the manifest
    records per-file key min/max for file skipping. Query via
    zorder_pruned_files / sources.manifest.read_pruned on the key range
    of the bbox (conservative: the bbox's full Morton span)."""
    from ..sources.manifest import write_dataset

    keyed = df.withColumn("_zkey", F.expr(morton_sql(x_col, y_col)))
    write_dataset(keyed, path, "_zkey", n_files)
