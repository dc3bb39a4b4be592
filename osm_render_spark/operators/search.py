"""Inverted index + impact-ordered keyword retrieval over the corpus.

The training-data pipeline's lookup side: decontamination audits,
targeted corpus slicing, and eval-set retrieval all need "which
documents contain these terms, ranked" WITHOUT an external search
service.  Built as three declarative stages:

  1. `term_freqs` — tokenize (lower + non-alpha split, one shared regex
     both engines honor) and count: map-side explode + partial agg, ONE
     corpus-token shuffle on (doc_id, term).  This is the inverted
     index in relational form: term → (doc_id, tf) postings.
  2. `doc_freqs` — vocabulary-sized groupBy(term) over the tf table.
  3. `impact_search` — score a literal query: the per-term weights form
     a TINY broadcast table (|query| rows), postings are pruned by a
     BroadcastHashJoin on term (the corpus tf table is filtered at scan
     by the semi-join — no corpus shuffle), scores partial-agg per
     doc_id, and the global top-k is a TakeOrderedAndProject (no full
     sort).

Scoring is **quantized-impact** (the Anh & Moffat integer-impact
family): weight(term) = bitlength(N // df) — a log2-quantized idf —
and score(doc) = Σ tf · weight.  Deliberately integer end-to-end: rank
order is engine-exact (no ln()/double summation whose libm/order
differences could flip near-ties between Spark and the DuckDB oracle),
and at 100 TB integer impact scores shuffle as 8 bytes with exact
partial aggregation.  bitlength is computed as length(bin(x)) — both
dialects print minimal binary strings for positive BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z]+"


def term_freqs(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) — the inverted index in relational form."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text)), TOKEN_RE)).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def doc_freqs(tf: DataFrame) -> DataFrame:
    """(term, df) — vocabulary-sized."""
    return tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))


def impact_weight_sql(n_docs: str, df: str) -> str:
    """Quantized-impact idf: bitlength(N // df) as shared SQL text."""
    return (
        f"CAST(length(bin(CAST(FLOOR(CAST({n_docs} AS DOUBLE) / ({df})) AS BIGINT)))"
        " AS BIGINT)"
    )


def impact_search(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k (doc_id, score) for an AND-less bag-of-terms query under
    quantized-impact scoring; deterministic (score DESC, doc_id) order."""
    tf = term_freqs(docs, text=text, id_col=id_col)
    n_docs = docs.count()  # scalar job; at scale a cached table statistic
    terms = [t.lower() for t in query_terms]
    qdf = (
        doc_freqs(tf.filter(F.col("term").isin(terms)))
        .withColumn("w", F.expr(impact_weight_sql(str(n_docs), "df")))
        .select("term", "w")
    )
    scored = (
        tf.join(F.broadcast(qdf), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w")).cast("long").alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)
