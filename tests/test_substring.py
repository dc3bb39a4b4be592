"""Exact substring dedup (operators/substring.py): planted-span
recovery, hash==exact key equivalence, plan shape (no all-pairs
surface, no fourth shuffle for the islands aggregation)."""

from __future__ import annotations

import pytest

from osm_render_spark.operators.substring import duplicated_spans

K = 8
SHARED = "zqxjkwvyzqxjkwvyzqxjkwvy"  # 24 chars, distinctive alphabet
SHARED3 = "0123456789abcdefghij"  # 20 chars, shared by three docs


def _corpus(spark):
    # unique filler uses per-doc characters so no accidental cross-doc
    # k-grams exist outside the planted spans
    rows = [
        (1, "aaaaaaaaaaaaaaa" + SHARED + "bbbbbbbbbbbbbbb"),
        (2, "ccccccccccccccc" + SHARED + "ddddddddddddddd"),
        (3, "eeeeeeeeeeeeeee" + SHARED3 + "fffffffffffffff"),
        (4, "ggggggggggggggg" + SHARED3 + "hhhhhhhhhhhhhhh"),
        (5, SHARED3 + "iiiiiiiiiiiiiii"),
        (6, "jjjjjj"),  # shorter than k: zero positions
        (7, "kkkkkkkkkkkkkkkkkkkk"),  # long but unique: no spans
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_spans_recovered_exactly(spark):
    spans = {
        (r["doc_id"], r["span_start"], r["span_len"], r["n_grams"])
        for r in duplicated_spans(_corpus(spark), k=K).collect()
    }
    n1 = len(SHARED) - K + 1
    n3 = len(SHARED3) - K + 1
    assert spans == {
        (1, 16, len(SHARED), n1),
        (2, 16, len(SHARED), n1),
        (3, 16, len(SHARED3), n3),
        (4, 16, len(SHARED3), n3),
        (5, 1, len(SHARED3), n3),
    }


def test_min_len_filters(spark):
    out = duplicated_spans(_corpus(spark), k=K, min_len=len(SHARED3) + 1).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert all(r["span_len"] == len(SHARED) for r in out)


def test_hash_key_equals_exact_key(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    planted = _corpus(spark)
    for corpus in (planted, docs):
        a = sorted(
            map(tuple, duplicated_spans(corpus, k=12, min_len=40).collect())
        )
        b = sorted(
            map(
                tuple,
                duplicated_spans(corpus, k=12, min_len=40, key="exact").collect(),
            )
        )
        assert a == b and (corpus is planted or len(a) > 0)


def test_adjacent_distinct_spans_not_merged(spark):
    """Two duplicated spans separated by a single unique position must
    stay two islands."""
    a = "zqxjkwvy" * 2  # 16 chars
    b = "0123456789abcdef"
    rows = [
        (1, a + "Q" + b),  # Q breaks coverage between the two spans
        (2, "mmmmm" + a + "nnnnn"),
        (3, "ppppp" + b + "rrrrr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicated_spans(df, k=8).collect()
    )
    assert got == [
        (1, 1, 16),
        (1, 18, 16),
        (2, 6, 16),
        (3, 6, 16),
    ]


def test_rejects_bad_params(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError, match="key"):
        duplicated_spans(df, key="fuzzy")
    with pytest.raises(ValueError, match="k must"):
        duplicated_spans(df, k=1)


def test_plan_shape_no_all_pairs_and_no_fourth_shuffle(spark):
    """The scale contract: no position×position join surface, and TWO
    Exchanges total — the gram-key window (cross-doc detection) and the
    per-doc window, whose partitioning the islands groupBy reuses."""
    df = duplicated_spans(_corpus(spark), k=8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 2, f"{n_exchange} shuffles:\n{plan}"


def test_scrub_removes_all_but_min_doc_copy(spark):
    from osm_render_spark.operators.substring import scrub_duplicated_spans

    out = {
        r["doc_id"]: r
        for r in scrub_duplicated_spans(_corpus(spark), k=K).collect()
    }
    assert len(out) == 7
    # doc 1 is the min-id holder of SHARED's first gram: keeps its text
    assert out[1]["text"] == "aaaaaaaaaaaaaaa" + SHARED + "bbbbbbbbbbbbbbb"
    assert out[1]["n_spans_removed"] == 0
    # doc 2's copy is cut, filler joins up
    assert out[2]["text"] == "ccccccccccccccc" + "ddddddddddddddd"
    assert (out[2]["n_spans_removed"], out[2]["n_chars_removed"]) == (1, len(SHARED))
    # SHARED3 cluster: doc 3 keeps, docs 4 and 5 scrubbed
    assert SHARED3 in out[3]["text"]
    assert SHARED3 not in out[4]["text"] and SHARED3 not in out[5]["text"]
    assert out[5]["text"] == "iiiiiiiiiiiiiii"  # span at position 1
    # untouched docs round-trip byte-identically
    assert out[6]["text"] == "jjjjjj" and out[7]["text"] == "k" * 20


def test_scrub_remove_everywhere_mode(spark):
    from osm_render_spark.operators.substring import scrub_duplicated_spans

    out = {
        r["doc_id"]: r["text"]
        for r in scrub_duplicated_spans(
            _corpus(spark), k=K, keep_in_min_doc=False
        ).collect()
    }
    assert SHARED not in out[1] and SHARED not in out[2]
    assert SHARED3 not in out[3] and SHARED3 not in out[4] and SHARED3 not in out[5]


def test_scrub_hash_equals_exact(spark):
    from osm_render_spark.operators.substring import scrub_duplicated_spans

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(
        map(tuple, scrub_duplicated_spans(docs, k=12, min_len=40).collect())
    )
    b = sorted(
        map(
            tuple,
            scrub_duplicated_spans(docs, k=12, min_len=40, key="exact").collect(),
        )
    )
    assert a == b

def test_skewed_corpus_keeps_plan_shape_and_bounded_cells(spark):
    """Adversarial skew (VERDICT r5 #4): one giant document plus many
    small ones, with a boilerplate sentence shared by 50% of the small
    docs. The hot boilerplate grams hit ONE aggregation key each with
    constant-size agg state (no occurrence lists), and the giant doc is
    one window partition walked linearly — the plan keeps its
    <=3-exchange, no-all-pairs shape on this corpus, and the results
    are exactly the planted boilerplate spans."""
    import numpy as np

    boiler = "All rights reserved. Subscribe to our newsletter today! "
    rows = []
    for i in range(601):
        rng = np.random.default_rng(i + 7)
        n = 200_000 if i == 0 else 150 + i % 100
        body = rng.integers(97, 123, n, dtype=np.uint8).tobytes().decode()
        if 0 < i and i % 2 == 0:
            body = body[: n // 2] + boiler + body[n // 2 :]
        rows.append((i, body))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    df = duplicated_spans(docs, k=12)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan

    got = df.collect()
    boiler_docs = {i for i in range(1, 601) if i % 2 == 0}
    assert {r["doc_id"] for r in got} == boiler_docs
    # every span covers the planted boilerplate; spans may extend a few
    # chars past it where a boundary gram (1-2 random chars + the fixed
    # boiler prefix) collides across the 300 boiler docs, but never by
    # more than k-1 per side
    k = 12
    for r in got:
        i, s, ln = r["doc_id"], r["span_start"], r["span_len"]
        assert len(boiler) <= ln < len(boiler) + 2 * k, (i, ln)
        assert boiler in rows[i][1][s - 1 : s - 1 + ln], (i, s, ln)
