"""Streaming exact deduplication — custom stateful operator
(applyInPandasWithState), the streaming form of operators.dedup.

A continuously-appended corpus (the 10^12-image/caption ingest) must emit
each distinct document once. State is partitioned by a content-hash shard
(``pmod(xxhash64(text), n_shards)``) so the seen-set scales horizontally;
each shard's state holds the sha256 hashes seen so far.

State size note: at real scale the in-state seen-set becomes a bloom
filter + periodic compaction to a side table; the operator contract
(shard → state → first-occurrences stream) is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """docs (streaming): (doc_id long, text string) → first occurrence of
    each distinct text, exactly once across micro-batches."""
    sharded = docs.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("text")), F.lit(n_shards))
    )

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id", kind="mergesort")
            out_rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.sha256(text.encode()).hexdigest()
                if h not in seen:
                    seen.add(h)
                    out_rows.append((int(doc_id), text))
            if out_rows:
                yield pd.DataFrame(out_rows, columns=["doc_id", "text"])
        state.update((list(seen),))

    return sharded.groupBy("shard").applyInPandasWithState(
        dedup_fn,
        outputStructType="doc_id long, text string",
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
