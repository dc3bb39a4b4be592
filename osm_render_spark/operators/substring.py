"""Exact substring deduplication — find long duplicated SPANS across
documents, not just whole-doc near-dups (the public "Deduplicating
Training Data Makes Language Models Better" operator family, Lee et
al. 2022, re-expressed Spark-first).

The published implementation builds a giant suffix array; that is a
single-machine shape. The distributed shape used here: every position
contributes its k-char gram's KEY (a 64-bit hash by default, computed
by a vectorized Arrow kernel BEFORE any explode), one window over the
key marks positions whose gram occurs in ≥ 2 distinct documents
(min(doc) != max(doc) over the key partition), and a per-document
gaps-and-islands window merges adjacent covered positions into maximal
spans (run of r covered positions = a duplicated span of r + k - 1
chars). A span every k-gram of which occurs elsewhere is exactly a
substring duplicated elsewhere piecewise — the same guarantee the
suffix-array formulation gives for spans ≥ k.

100 TB shape:
- the shuffle carries (key, doc_id, pos) = ~24 bytes/position with
  key="hash" (keys computed in the scan-stage Arrow kernel, so the
  k-byte gram strings never leave the mappers) — k-independent bytes;
- the DOCUMENT TEXT never rides on position rows: grams are keyed
  inside the document's row (kernel / transform-then-explode), so a
  giant document costs O(n·k), not the O(n^2) per-position text copy
  a post-explode substring() incurs (the r5 shape did exactly that —
  a 10 MB doc took 200+ s for 10^7 positions; now linear);
- no all-pairs surface anywhere: cross-doc keys come from ONE window
  with constant-size min/max state per key — a boilerplate gram shared
  by half the corpus is a hot CELL, never a hot LIST;
- TWO exchanges total (gram-key window, per-doc window; the islands
  groupBy reuses the per-doc window's partitioning) — pinned by a
  plan test, including on an adversarially skewed corpus;
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


def _gram_hash_gen(k: int, out_rows: int = 1 << 20):
    """Vectorized k-gram keying kernel: ONE polynomial-rolling-hash +
    splitmix-finalizer pass over each Arrow batch's entire text, the
    docs separated by k-1 out-of-range sentinel codepoints so no
    cross-doc gram can form. Per-doc overhead is two C calls
    (encode + frombuffer) — dodging both the per-position O(n^2) text
    copy a post-explode substring() would do on a giant document
    (VERDICT r5 #4's skew case: 10 MB doc → 10^7 copies of a 10 MB
    string) and the tiny-array numpy dispatch trap on short docs
    (CLAUDE.md). Positions are 1-based chars (utf-32 codepoints), the
    same unit as SQL substring. Output is yielded in ≤``out_rows``
    chunks so one giant document cannot blow up a single Arrow batch."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        a = np.uint64(0x9E3779B97F4A7C15)
        m1 = np.uint64(0xBF58476D1CE4E5B9)
        m2 = np.uint64(0x94D049BB133111EB)
        sep = np.full(k - 1, 0x110000, dtype=np.uint32)  # > any codepoint
        for pdf in batches:
            codes, ids, lens = [], [], []
            for did, t in zip(pdf["doc_id"], pdf["_t"]):
                if t is None or len(t) < k:
                    continue
                codes.append(np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32))
                codes.append(sep)
                ids.append(did)
                lens.append(len(codes[-2]))
            if not ids:
                continue
            c = np.concatenate(codes)[: -(k - 1)].astype(np.uint64)
            n_all = len(c) - k + 1
            h = np.zeros(n_all, dtype=np.uint64)
            for j in range(k):
                h = h * a + c[j : j + n_all]
            h ^= h >> np.uint64(30)
            h *= m1
            h ^= h >> np.uint64(27)
            h *= m2
            h ^= h >> np.uint64(31)
            lens = np.asarray(lens, dtype=np.int64)
            counts = lens - k + 1
            offs = np.concatenate(([0], np.cumsum(lens[:-1] + k - 1)))
            hh = np.concatenate(
                [h[o : o + n] for o, n in zip(offs, counts)]
            ).view(np.int64)
            pos_all = np.arange(1, int(counts.max()) + 1, dtype=np.int64)
            pp = np.concatenate([pos_all[:n] for n in counts])
            doc_rep = np.repeat(np.asarray(ids), counts)
            for s in range(0, len(hh), out_rows):
                e = min(s + out_rows, len(hh))
                yield pd.DataFrame(
                    {"doc_id": doc_rep[s:e], "p": pp[s:e], "_gkey": hh[s:e]}
                )

    return gen


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
    ~50 tokens). ``key``: "hash" (scale default, Arrow kernel) or
    "exact" (oracle mode, gram strings as keys).

    The text column NEVER rides along position rows: hash mode keys
    grams inside an Arrow kernel; exact mode builds the (p, gram)
    struct array inside the document's row and explodes that — either
    way a giant document costs O(n·k), not the O(n^2) a post-explode
    substring() would (one full-text copy per position row)."""
    if key not in ("hash", "exact"):
        raise ValueError(f"key must be 'hash' or 'exact', got {key!r}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    if key == "hash":
        id_t = docs.schema[id_col].dataType.simpleString()
        keyed = base.mapInPandas(
            _gram_hash_gen(k), schema=f"doc_id {id_t}, p long, _gkey long"
        )
    else:
        arr = F.when(
            F.length("_t") >= k,
            F.expr(
                f"transform(sequence(1, length(_t) - {k - 1}), "
                f"p -> struct(CAST(p AS BIGINT) AS p, "
                f"substring(_t, p, {k}) AS g))"
            ),
        ).otherwise(F.expr("CAST(array() AS array<struct<p: bigint, g: string>>)"))
        keyed = base.select("doc_id", F.explode(arr).alias("_e")).select(
            "doc_id", F.col("_e.p").alias("p"), F.col("_e.g").alias("_gkey")
        )
    # cross-doc keys via ONE window over the gram key (min != max doc ⇔
    # ≥2 distinct docs) — replaces the r5 agg + semi-join pair, so the
    # whole operator is TWO exchanges (gram-key window, per-doc window)
    # and the keying kernel runs once, not once per plan branch
    wk = Window.partitionBy("_gkey")
    cov = (
        keyed.withColumn(
            "_xd", F.min("doc_id").over(wk) != F.max("doc_id").over(wk)
        )
        .where(F.col("_xd"))
        .select("doc_id", "p")
    )
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
    id_t = docs.schema[id_col].dataType.simpleString()
    return _apply_span_cuts(base, removals, id_t)


def _apply_span_cuts(base: DataFrame, removals: DataFrame, id_t: str) -> DataFrame:
    """Cut (span_start, span_len) intervals out of each document's text:
    base(doc_id, _t) × removals(doc_id, span_start, span_len, ...) →
    (doc_id, text, n_spans_removed, n_chars_removed). Spans are assumed
    disjoint per doc (maximal islands guarantee) so the cut is one
    linear pass; the spans-per-doc collect_list is bounded by
    doc_len / min_len. Shared by scrub_duplicated_spans and
    decontaminate so the cut arithmetic can never diverge."""
    rem = removals.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("_spans")
    )
    joined = base.join(rem, "doc_id", "left")

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


# ---------------------------------------------------------------------------
# decontamination: corpus spans that overlap a BENCHMARK set
# ---------------------------------------------------------------------------


def contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 12,
    min_len: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    key: str = "hash",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, span_start, span_len, n_grams) — maximal spans in the
    CORPUS whose every k-gram also occurs somewhere in the BENCHMARK
    set (train/test decontamination: the published eval-overlap recipe,
    same gram granularity as duplicated_spans but against a second
    table instead of cross-document).

    Distributed shape: corpus positions are keyed by the same Arrow
    rolling-hash kernel as duplicated_spans (text never rides position
    rows); the benchmark reduces to its DISTINCT gram-key set — at
    training scale the benchmark is dimension-sized (MBs of eval suites
    vs TBs of corpus), so with ``broadcast_benchmark`` the containment
    test is a broadcast LEFT SEMI join and the corpus side never
    shuffles for it; the only wide exchange left is the per-doc islands
    window. Set ``broadcast_benchmark=False`` for benchmark sets too
    big to broadcast (falls back to a shuffled semi-join, which AQE may
    still convert back to broadcast if the stats allow).

    ``key="exact"`` uses gram strings (the oracle mode — zero collision
    probability); hash==exact is pinned by tests.
    """
    if key not in ("hash", "exact"):
        raise ValueError(f"key must be 'hash' or 'exact', got {key!r}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    base = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    bench = benchmark.select(F.col(bench_text_col).alias("_t"))
    if key == "hash":
        id_t = corpus.schema[id_col].dataType.simpleString()
        keyed = base.mapInPandas(
            _gram_hash_gen(k), schema=f"doc_id {id_t}, p long, _gkey long"
        )
        bkeyed = bench.select(F.lit(0).alias("doc_id"), "_t").mapInPandas(
            _gram_hash_gen(k), schema="doc_id int, p long, _gkey long"
        )
    else:
        arr = F.when(
            F.length("_t") >= k,
            F.expr(
                f"transform(sequence(1, length(_t) - {k - 1}), "
                f"p -> struct(CAST(p AS BIGINT) AS p, "
                f"substring(_t, p, {k}) AS g))"
            ),
        ).otherwise(F.expr("CAST(array() AS array<struct<p: bigint, g: string>>)"))
        keyed = base.select("doc_id", F.explode(arr).alias("_e")).select(
            "doc_id", F.col("_e.p").alias("p"), F.col("_e.g").alias("_gkey")
        )
        bkeyed = bench.select(F.lit(0).alias("doc_id"), "_t").select(
            F.explode(arr).alias("_e")
        ).select(F.col("_e.g").alias("_gkey"))
    bgrams = bkeyed.select("_gkey").distinct()
    if broadcast_benchmark:
        bgrams = F.broadcast(bgrams)
    cov = keyed.join(bgrams, "_gkey", "left_semi").select("doc_id", "p")
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


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 12,
    min_len: int | None = None,
    mode: str = "drop",
    max_overlap_pct: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    key: str = "hash",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Remove benchmark contamination from the corpus.

    mode="drop": a document is DROPPED when its contaminated characters
    exceed ``max_overlap_pct`` percent of its length (integer math:
    100·chars > pct·len — engine-exact, no float fraction). Survivors
    return with (doc_id, text, n_spans, n_chars_contaminated).

    mode="scrub": contaminated spans are CUT from every document (the
    benchmark is authoritative — no keep-one-copy rule), via the same
    cut kernel as scrub_duplicated_spans. Returns
    (doc_id, text, n_spans_removed, n_chars_removed).

    n_chars_contaminated (drop mode) is EXACT — the size of the union
    of contaminated char ranges. Two position-islands separated by a
    gap < k have overlapping char ranges ([min_p, max_p + k - 1]), so
    summing span_len would double-count up to k-1 chars per adjacent
    pair (and can exceed the document length on gram-dense text); the
    ranges are interval-merged first (one extra per-doc window over the
    span table — doc_len/min_len rows, never positions).
    """
    if mode not in ("drop", "scrub"):
        raise ValueError(f"mode must be 'drop' or 'scrub', got {mode!r}")
    spans = contaminated_spans(
        corpus, benchmark, k, min_len, id_col, text_col, bench_text_col,
        key, broadcast_benchmark,
    )
    base = corpus.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    id_t = corpus.schema[id_col].dataType.simpleString()
    if mode == "scrub":
        return _apply_span_cuts(base, spans, id_t)
    # exact covered-char union: classic interval merge — a span starts a
    # new merged group iff it begins past every earlier span's end
    w = Window.partitionBy("doc_id").orderBy("span_start")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    iv = spans.withColumn(
        "_end", F.col("span_start") + F.col("span_len")
    ).withColumn(
        "_new",
        F.when(
            F.col("span_start") > F.coalesce(
                F.max("_end").over(wprev), F.lit(-1)
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("_grp", F.sum("_new").over(w))
    merged = iv.groupBy("doc_id", "_grp").agg(
        (F.max("_end") - F.min("span_start")).alias("_cov")
    )
    stats = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("_cov").alias("n_chars_contaminated"),
    )
    joined = base.join(stats, "doc_id", "left").select(
        "doc_id",
        F.col("_t").alias("text"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_chars_contaminated", F.lit(0)).alias(
            "n_chars_contaminated"
        ),
    )
    return joined.where(
        F.lit(100) * F.col("n_chars_contaminated")
        <= F.lit(max_overlap_pct) * F.length("text")
    )
