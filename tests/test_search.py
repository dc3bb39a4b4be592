"""Inverted index + quantized-impact retrieval (operators/search.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_render_spark.operators.search import (
    doc_freqs,
    impact_search,
    term_freqs,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_freqs_hand_worked(spark):
    df = _docs(
        spark,
        [
            (1, "Spark spark SPARK! join"),
            (2, "join join; 42 vector"),
            (3, ""),
        ],
    )
    tf = {(r["doc_id"], r["term"]): r["tf"] for r in term_freqs(df).collect()}
    assert tf == {
        (1, "spark"): 3,
        (1, "join"): 1,
        (2, "join"): 2,
        (2, "vector"): 1,
    }


def test_doc_freqs(spark):
    df = _docs(spark, [(1, "a b a"), (2, "b c"), (3, "b")])
    out = {r["term"]: r["df"] for r in doc_freqs(term_freqs(df)).collect()}
    assert out == {"a": 1, "b": 3, "c": 1}


def test_impact_weight_closed_form(spark):
    # N=8 docs; df=1 -> w=bitlen(8)=4, df=3 -> bitlen(2)=2, df=8 -> bitlen(1)=1
    rows = [(i, "common" + (" rare" if i == 0 else "") + (" mid" if i < 3 else ""))
            for i in range(8)]
    df = _docs(spark, rows)
    top = impact_search(df, ("rare", "mid", "common"), k=8).collect()
    scores = {r["doc_id"]: r["score"] for r in top}
    # doc 0: rare(4) + mid(2) + common(1); docs 1,2: mid+common; rest: common
    assert scores[0] == 7 and scores[1] == 3 and scores[2] == 3
    assert all(scores[i] == 1 for i in range(3, 8))
    # deterministic order: score desc then doc_id
    assert [r["doc_id"] for r in top] == [0, 1, 2, 3, 4, 5, 6, 7]


def test_search_plan_broadcast_and_topk(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = impact_search(docs, ("spark", "vector"), k=5)
    plan = _plan(df)
    # query-weight join must broadcast (no corpus shuffle on term) and
    # the global top-k must be a TakeOrdered, not a total sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert df.count() == 5
