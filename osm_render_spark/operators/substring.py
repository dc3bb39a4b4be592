"""Exact substring deduplication — find long duplicated SPANS across
documents, not just whole-doc near-dups (the public "Deduplicating
Training Data Makes Language Models Better" operator family, Lee et
al. 2022, re-expressed Spark-first).

The published implementation builds a giant suffix array; that is a
single-machine shape. The distributed shape used here: every position
contributes its k-char gram's KEY (a 64-bit hash by default), one
aggregation finds keys seen in ≥ 2 distinct documents, a co-partitioned
semi-join marks the covered positions, and a per-document
gaps-and-islands window merges adjacent covered positions into maximal
spans (run of r covered positions = a duplicated span of r + k - 1
chars). A span every k-gram of which occurs elsewhere is exactly a
substring duplicated elsewhere piecewise — the same guarantee the
suffix-array formulation gives for spans ≥ k.

100 TB shape:
- the shuffle carries (key, doc_id, pos) = ~24 bytes/position with
  key="hash" (xxhash64 computed in the scan stage, so the k-byte gram
  strings never leave the mappers) — k-independent shuffle bytes;
- no all-pairs surface anywhere: duplicated keys are found by ONE
  hash aggregation, never by joining positions to positions;
- the islands aggregation needs no fourth shuffle: the window's
  hash-partitioning on doc_id already satisfies the groupBy
  (doc_id, island) clustering (pinned by a plan test);
- worst-case skew is a single gigantic document: the window partition
  is bounded by document length, the same bound any per-doc operator
  in the pipeline has.

key="exact" uses the gram string itself as the key — byte-exact
semantics with zero collision probability, the mode the DuckDB oracle
query runs in (DuckDB has no xxhash64 twin); hash==exact equality is
pinned by tests on planted and real corpora.

Reference precedent: the engine's dedup family (SURVEY.md LLM-ops
table); this operator extends it from whole-document to sub-document
granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duplicated_spans(
    docs: DataFrame,
    k: int = 12,
    min_len: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash",
) -> DataFrame:
    """(doc_id, span_start, span_len, n_grams) — maximal spans whose
    every k-gram also occurs in some OTHER document. span_start is
    1-based (SQL substring convention); span_len ≥ k by construction;
    n_grams = number of covered positions merged into the span.
    ``min_len`` drops short spans (the published recipe dedups spans of
    ~50 tokens). ``key``: "hash" (scale default) or "exact" (oracle
    mode, gram strings as keys)."""
    if key not in ("hash", "exact"):
        raise ValueError(f"key must be 'hash' or 'exact', got {key!r}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    n = F.length(F.col("_t")) - F.lit(k - 1)
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an
    # empty array — docs shorter than k must produce zero positions
    pos = base.select(
        "doc_id",
        "_t",
        F.explode(
            F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("_p"),
    )
    gram = F.expr(f"substring(_t, _p, {k})")
    keyed = pos.select(
        "doc_id",
        F.col("_p").cast("long").alias("p"),
        (F.xxhash64(gram) if key == "hash" else gram).alias("_gkey"),
    )
    dup = (
        keyed.groupBy("_gkey")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("_gkey")
    )
    cov = keyed.join(dup, "_gkey", "left_semi").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = cov.withColumn("_isl", F.col("p") - F.row_number().over(w))
    spans = (
        isl.groupBy("doc_id", "_isl")
        .agg(
            F.min("p").alias("span_start"),
            (F.max("p") - F.min("p") + F.lit(k)).alias("span_len"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .drop("_isl")
    )
    if min_len is not None:
        spans = spans.where(F.col("span_len") >= min_len)
    return spans


def scrub_duplicated_spans(
    docs: DataFrame,
    k: int = 12,
    min_len: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash",
    keep_in_min_doc: bool = True,
) -> DataFrame:
    """The REMOVAL half of the published recipe: cut every duplicated
    span out of the corpus, returning (doc_id, text, n_spans_removed,
    n_chars_removed). With ``keep_in_min_doc`` (default) one copy of
    each duplicated region survives: a span is KEPT in the document
    with the smallest id among documents whose spans share that span's
    first k-gram — deterministic, computed with one small aggregation
    over the span table (never a doc×doc comparison).

    Per-document spans are maximal islands, hence disjoint — the cut
    kernel is a single linear pass per document. The spans-per-doc
    collect_list is bounded by doc_len / min_len (an applyInPandas-safe
    group size by construction).
    """
    spans = duplicated_spans(docs, k, min_len, id_col, text_col, key)
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    gram = F.expr(f"substring(_t, span_start, {k})")
    spans2 = (
        spans.join(base, "doc_id")
        .withColumn("_g", F.xxhash64(gram) if key == "hash" else gram)
        .drop("_t")
    )
    if keep_in_min_doc:
        keep = spans2.groupBy("_g").agg(F.min("doc_id").alias("_keep"))
        removals = spans2.join(keep, "_g").where(F.col("doc_id") != F.col("_keep"))
    else:
        removals = spans2
    rem = removals.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("_spans")
    )
    joined = base.join(rem, "doc_id", "left")
    id_t = docs.schema[id_col].dataType.simpleString()

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, texts, n_sp, n_ch = [], [], [], []
            for did, t, sp in zip(pdf["doc_id"], pdf["_t"], pdf["_spans"]):
                ids.append(did)
                if sp is None or len(sp) == 0:
                    texts.append(t)
                    n_sp.append(0)
                    n_ch.append(0)
                    continue
                ivs = sorted(
                    (int(s["span_start"]), int(s["span_len"])) for s in sp
                )
                out = []
                pos = 1  # 1-based, SQL substring convention
                removed = 0
                for s0, ln in ivs:
                    out.append(t[pos - 1 : s0 - 1])
                    removed += ln
                    pos = s0 + ln
                out.append(t[pos - 1 :])
                texts.append("".join(out))
                n_sp.append(len(ivs))
                n_ch.append(removed)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "n_spans_removed": n_sp,
                    "n_chars_removed": n_ch,
                }
            )

    return joined.mapInPandas(
        kernel,
        schema=(
            f"doc_id {id_t}, text string, n_spans_removed long, "
            f"n_chars_removed long"
        ),
    )
