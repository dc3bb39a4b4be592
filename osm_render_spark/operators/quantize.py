"""Embedding quantization (training-data pipeline, storage axis).

A 10^12-row float32 embedding table is ~4·dim TB; symmetric int8
quantization cuts storage and shuffle bytes 4× with a bounded error.
Per-vector symmetric scheme (the standard IVF/PQ-free baseline):

    scale = max_i |x_i| / 127          (0-vector → scale 0, all-zero codes)
    q_i   = floor(x_i / scale + 0.5)   (F6 rounding; |q_i| ≤ 127)
    x̂_i  = q_i · scale                (max abs error ≤ scale / 2)

Everything is Column arithmetic (codegen, no UDF) built from ONE SQL
text valid in Spark and DuckDB, so the driver oracle checks the codes
exactly (same shared-definition pattern as functions/projection.py).

Approximate-cosine note: cos(q(a), q(b)) deviates from cos(a, b) by
O(1/127) for unit-norm-ish vectors — pinned by a pytest bound; rank
changes only where true cosines are closer than the quantization noise,
which is exactly the regime where ANN is already approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SPARK_SCALE = (
    "(array_max(transform({emb}, x -> ABS(CAST(x AS DOUBLE)))) / 127.0)"
)
DUCK_SCALE = (
    "(list_max(list_transform({emb}, x -> ABS(CAST(x AS DOUBLE)))) / 127.0)"
)
# q_i given x (double) and s (double): guard the all-zero vector
Q_SQL = "CASE WHEN {s} = 0.0 THEN 0 ELSE CAST(FLOOR({x} / {s} + 0.5) AS BIGINT) END"


def quantize_int8(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, codes array<tinyint>, scale double): per-vector symmetric
    int8 quantization, pure Column HOFs. The scale lands in its own
    column FIRST so the transform lambda reads a scalar — inlining the
    array_max inside the lambda would re-evaluate it per element (the
    O(n²) element_at-over-transform trap, CLAUDE.md)."""
    q = Q_SQL.format(x="CAST(x AS DOUBLE)", s="scale")
    return (
        embeddings.withColumn("scale", F.expr(SPARK_SCALE.format(emb="embedding")))
        .select(
            F.col(id_col),
            F.expr(f"transform(embedding, x -> CAST(({q}) AS TINYINT))").alias(
                "codes"
            ),
            "scale",
        )
    )


def quantize_int8_flat(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Exploded oracle-comparable form: (id, i, q) one row per dimension
    (1-based i). Single narrow pass."""
    q = Q_SQL.format(x="CAST(x AS DOUBLE)", s="scale")
    return (
        embeddings.withColumn("scale", F.expr(SPARK_SCALE.format(emb="embedding")))
        .select(
            F.col(id_col),
            F.posexplode(F.expr(f"transform(embedding, x -> {q})")).alias("i0", "q"),
        )
        .select(id_col, (F.col("i0") + 1).alias("i"), "q")
    )


def dequantize(quantized: DataFrame) -> DataFrame:
    """(id, codes, scale) → (id, embedding array<double>): x̂ = q·scale."""
    return quantized.select(
        *[c for c in quantized.columns if c not in ("codes", "scale")],
        F.expr(
            "transform(codes, q -> CAST(q AS DOUBLE) * scale)"
        ).alias("embedding"),
    )
