"""Deduplication operators for the training-data pipeline (task brief:
exact, MinHash+LSH, SimHash, n-gram Jaccard).

DataFrame-API forms for library use; the SQL-text forms used by the
oracle-checked queries live in operators.text (one arithmetic definition,
two dialects — the DataFrame ops here are built on the SAME Spark SQL
texts via F.expr, so they share the definition).

Scale notes (10^12 docs): exact dedup is one hash-agg shuffle on a
fixed-width key (sha256 of text — never shuffle raw text). MinHash
signatures are a narrow map (HOF transforms, JVM codegen). LSH banding
shuffles once per band on (band, h...) — candidate pairs only surface
within buckets, so the quadratic blowup is bounded by bucket size; a
bucket-size cap (drop degenerate buckets) keeps the worst case linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import MINHASH_A, SPARK, shingles_sql, word_keys_sql


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct text with the
    canonical (min) id and the duplicate count. The groupBy key is
    sha2(text) so the shuffle carries 32 bytes, not documents."""
    keyed = df.withColumn("_k", F.sha2(F.col(text_col), 256))
    return (
        keyed.groupBy("_k")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("_k")
        .select("canonical_id", "n_copies")
    )


def _word_keys_batch(text: str) -> "np.ndarray":
    """Vectorized word keys for one ASCII document — byte-level numpy,
    EXACTLY the SQL definition in operators.text.word_keys_sql:
    key = ascii(w[0])*65536 + ascii(w[1])*256 + (len(w) % 256).
    (Non-ASCII first/second chars would need codepoints, not bytes — the
    SQL path remains the general definition; this kernel asserts ASCII.)
    """
    import numpy as np

    raw = text.encode("ascii")  # raises on non-ASCII by design
    b = np.frombuffer(raw, dtype=np.uint8)
    if len(b) == 0:
        # SQL split('', ' ') yields [''] — one empty word with key 0
        return np.zeros(1, dtype=np.int64)
    is_sep = b == 32  # ' '
    # word boundaries of a sep-split INCLUDING empty words (SQL split
    # semantics: 'a  b' -> ['a', '', 'b'])
    sep_idx = np.flatnonzero(is_sep)
    starts = np.concatenate([[0], sep_idx + 1])
    ends = np.concatenate([sep_idx, [len(b)]])
    lengths = ends - starts
    first = np.where(lengths > 0, b[np.minimum(starts, len(b) - 1)], 0).astype(np.int64)
    second_pos = np.minimum(starts + 1, len(b) - 1)
    second = np.where(lengths > 1, b[second_pos], 0).astype(np.int64)
    return first * 65536 + second * 256 + (lengths.astype(np.int64) % 256)


def minhash_signatures_kernel(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Vectorized Arrow-kernel form of minhash_signatures — identical
    integer arithmetic (tests assert bitwise equality with the SQL/HOF
    form), byte-level numpy instead of interpreted HOF lambdas. This is
    the 10^12-document scale path."""
    import numpy as np
    import pandas as pd

    from .text import MINHASH_B, P

    a = list(MINHASH_A)
    bb = list(MINHASH_B)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                k = _word_keys_batch(text)
                if len(k) >= 3:
                    sh = (k[:-2] * 2654435761 + k[1:-1] * 40503 + k[2:]) % P
                    mh = [int(((aj * sh + bj) % P).min()) for aj, bj in zip(a, bb)]
                else:
                    mh = [-1, -1, -1, -1]
                rows.append((doc_id, *mh))
            yield pd.DataFrame(rows, columns=[id_col, "mh0", "mh1", "mh2", "mh3"])

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, mh0 long, mh1 long, mh2 long, mh3 long"
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, mh0..mh3) minhash signature per document (word-trigram
    shingles). Shingles explode once, the 4 hash mins aggregate in one
    hash-agg — pure HOF + codegen arithmetic, no UDF, O(total shingles)."""
    from .text import MINHASH_B, P

    keys = word_keys_sql(SPARK, text_col)
    sh = shingles_sql(SPARK, f"({keys})")
    exploded = df.select(
        F.col(id_col), F.explode_outer(F.expr(sh)).alias("s")
    )
    aggs = [
        F.coalesce(
            F.min(F.expr(f"({MINHASH_A[j]} * s + {MINHASH_B[j]}) % {P}")), F.lit(-1)
        )
        .cast("long")
        .alias(f"mh{j}")
        for j in range(len(MINHASH_A))
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_buckets(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the 4-hash signature into 2 bands of 2; emit non-trivial
    buckets (n>1) — the candidate groups for near-dup verification."""
    bands = []
    for band, (h1, h2) in enumerate((("mh0", "mh1"), ("mh2", "mh3"))):
        bands.append(
            signatures.select(
                F.lit(band).alias("band"),
                F.col(h1).alias("h1"),
                F.col(h2).alias("h2"),
                F.col(id_col),
            )
        )
    allb = bands[0].unionAll(bands[1])
    return (
        allb.groupBy("band", "h1", "h2")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
        .where(F.col("n_docs") > 1)
    )
