"""Sequence packing — the training-data step that concatenates documents
into fixed-budget training sequences (token/char budget per sequence).

Scale shape (10^12 docs): greedy packing is inherently sequential, so
the parallel unit is a deterministic hash BUCKET — docs shard into
``n_buckets`` groups (one shuffle), each group packs independently
inside an applyInPandas kernel, and sequence ids are (bucket, seq_idx)
pairs so no cross-bucket coordination exists. Bucket count is the
parallelism/packing-quality dial: more buckets = more parallelism and
slightly worse packing (greedy never sees docs in other buckets) —
exactly the tradeoff production packers make. Within a bucket the
order is (doc_id) ascending, so output is reproducible under any
partitioning, and a single document larger than the budget gets its
own sequence (never silently dropped or truncated).

The greedy rule (shared with the DuckDB oracle's recursive CTE): keep a
running size; if running + size > budget, close the sequence and start
a new one at this doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    size_col: str = "size",
    bucket_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, size[, bucket]) → (id, bucket, seq_idx, pos_in_seq,
    seq_fill): greedy fixed-budget packing per bucket. ``size`` is
    whatever unit the budget is in (tokens, characters, bytes).
    If ``bucket_col`` is None, docs shard by pmod(xxhash64(id),
    n_buckets); pass an explicit column to control co-packing (e.g.
    same-language buckets) or to share bucketing with an oracle."""
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if bucket_col is None:
        work = df.select(
            F.col(id_col).alias("_id"),
            F.col(size_col).cast("long").alias("_size"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("_bucket"),
        )
    else:
        work = df.select(
            F.col(id_col).alias("_id"),
            F.col(size_col).cast("long").alias("_size"),
            F.col(bucket_col).cast("long").alias("_bucket"),
        )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        seq_idx, pos, fill = [], [], []
        cur_seq, cur_pos, cur_fill = 0, 0, 0
        for s in pdf["_size"]:
            s = int(s)
            if cur_pos > 0 and cur_fill + s > budget:
                cur_seq += 1
                cur_pos, cur_fill = 0, 0
            seq_idx.append(cur_seq)
            pos.append(cur_pos)
            cur_fill += s
            fill.append(cur_fill)
            cur_pos += 1
        return pd.DataFrame(
            {
                "_id": pdf["_id"],
                "_bucket": pdf["_bucket"],
                "seq_idx": seq_idx,
                "pos_in_seq": pos,
                "seq_fill": fill,
            }
        )

    out = work.groupBy("_bucket").applyInPandas(
        pack,
        schema="_id long, _bucket long, seq_idx long, pos_in_seq long, seq_fill long",
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_bucket").alias("bucket"),
        "seq_idx",
        "pos_in_seq",
        "seq_fill",
    )
