"""Driver-mimicking correctness harness: run every __spark_entry__ query on
Spark AND its oracle SQL on DuckDB over the same parquet tables; compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from osm_render_spark.session import get_spark  # noqa: E402
from osm_render_spark.sources.catalog import TABLES  # noqa: E402


def value_hash(pdf: pd.DataFrame) -> str:
    """Order-insensitive: sort columns by name, round-trip values through a
    canonical string form, sort rows, hash."""
    cols = sorted(pdf.columns)
    if len(pdf) == 0:
        return hashlib.sha256(("|".join(cols)).encode()).hexdigest()[:16]
    pdf = pdf[cols].copy()
    for c in cols:
        s = pdf[c]
        if s.dtype == object:
            pdf[c] = s.astype(str)
        elif str(s.dtype).startswith("float"):
            pdf[c] = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NaN")
        else:
            pdf[c] = s.astype(str)
    rows = sorted("\x1f".join(vals) for vals in pdf.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    spark = get_spark("oracle_check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        else:
            hs, hd = value_hash(sdf), value_hash(ddf)
            if hs != hd:
                problems.append(f"value-hash {hs} vs {hd}")
                merged = sdf.merge(ddf, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
