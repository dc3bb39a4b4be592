"""Decontamination (corpus × benchmark gram overlap): planted spans,
hash==exact, drop/scrub modes, broadcast plan shape."""

from __future__ import annotations

import pytest

from osm_render_spark.operators.substring import (
    contaminated_spans,
    decontaminate,
)

K = 8


@pytest.fixture()
def corpus(spark):
    # doc 1 embeds the benchmark sentence verbatim; doc 2 embeds two
    # disjoint fragments; doc 3 is clean; doc 4 is shorter than k
    bench_sent = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"AAAA {bench_sent} BBBB"),
        (2, f"x{bench_sent[:15]}yyyyyyyyyyyyyy{bench_sent[-15:]}z"),
        (3, "completely original text with no overlap at all whatsoever"),
        (4, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), bench_sent


@pytest.fixture()
def bench_docs(spark):
    rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "an unrelated benchmark prompt about something else"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_spans_found(spark, corpus, bench_docs):
    docs, bench_sent = corpus
    spans = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in contaminated_spans(docs, bench_docs, k=K).collect()
    }
    # doc 1: the full sentence starting after "AAAA " (1-based pos 6)
    assert (1, 6, len(bench_sent)) in spans
    # doc 2: two disjoint 15-char fragments (pos 2 and pos 2+15+14)
    assert (2, 2, 15) in spans
    assert (2, 31, 15) in spans
    assert not any(d in (3, 4) for d, _, _ in spans)
    assert len(spans) == 3


def test_hash_equals_exact(spark, corpus, bench_docs):
    docs, _ = corpus

    def rows(key):
        return sorted(
            (r["doc_id"], r["span_start"], r["span_len"], r["n_grams"])
            for r in contaminated_spans(
                docs, bench_docs, k=K, key=key
            ).collect()
        )

    assert rows("hash") == rows("exact")


def test_drop_mode(spark, corpus, bench_docs):
    docs, _ = corpus
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            docs, bench_docs, k=K, mode="drop", max_overlap_pct=50
        ).collect()
    }
    # doc 1 is ~83% contaminated → dropped at 50%; doc 2 is ~64% → dropped
    assert 1 not in out
    assert 2 not in out
    assert out[3]["n_chars_contaminated"] == 0 and out[3]["n_spans"] == 0
    assert 4 in out
    # permissive threshold keeps everything
    kept = decontaminate(
        docs, bench_docs, k=K, mode="drop", max_overlap_pct=100
    ).count()
    assert kept == 4


def test_scrub_mode_cuts_exact_bytes(spark, corpus, bench_docs):
    docs, bench_sent = corpus
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench_docs, k=K, mode="scrub").collect()
    }
    assert out[1]["text"] == "AAAA  BBBB"
    assert out[1]["n_spans_removed"] == 1
    assert out[1]["n_chars_removed"] == len(bench_sent)
    assert out[2]["text"] == "xyyyyyyyyyyyyyyz"
    assert out[2]["n_spans_removed"] == 2
    assert out[3]["text"].startswith("completely original")
    assert out[3]["n_spans_removed"] == 0
    assert out[4]["text"] == "tiny"


def test_benchmark_side_is_broadcast(spark, corpus, bench_docs):
    docs, _ = corpus
    plan = contaminated_spans(docs, bench_docs, k=K)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # and the fallback shape still produces a semi-join
    plan2 = contaminated_spans(
        docs, bench_docs, k=K, broadcast_benchmark=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan2


def test_min_len_filter(spark, corpus, bench_docs):
    docs, bench_sent = corpus
    spans = contaminated_spans(docs, bench_docs, k=K, min_len=20).collect()
    assert {(r["doc_id"], r["span_len"]) for r in spans} == {
        (1, len(bench_sent))
    }
