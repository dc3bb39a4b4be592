"""Distributed BPE trainer vs the sequential reference, segmentation
semantics, and determinism under ties."""

from __future__ import annotations

import pytest

from osm_render_spark.operators.bpe import (
    END,
    _merge_once,
    apply_bpe,
    bpe_reference_segment,
    bpe_reference_train,
    train_bpe,
    word_frequencies,
)


def test_merge_once_left_to_right():
    assert _merge_once(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_once(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    # a merged symbol does not re-trigger on the following raw symbol
    assert _merge_once(["aa", "a", "a"], "aa", "a") == ["aaa", "a"]


def test_reference_train_textbook():
    # the classic example: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_reference_train(wf, 4)
    # most frequent first pair: ('e','s') freq 9, then ('es','t') 9,
    # then ('est','</w>') 9, then ('l','o') 7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")
    assert bpe_reference_segment("lowest", merges) == ["lo", "w", "est" + END]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "low low low low low lower lower"),
        (1, "newest newest newest newest newest newest"),
        (2, "widest widest widest"),
        (3, "low newest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_frequencies(corpus):
    wf = {r["w"]: r["freq"] for r in word_frequencies(corpus).collect()}
    assert wf == {"low": 6, "lower": 2, "newest": 7, "widest": 4}


def test_distributed_train_matches_reference(corpus):
    wf = {r["w"]: r["freq"] for r in word_frequencies(corpus).collect()}
    for n in (1, 5, 12):
        assert train_bpe(corpus, n) == bpe_reference_train(wf, n)


def test_train_exhausts_gracefully(spark):
    # single 2-char word: only 2 mergeable pairs exist, then singleton
    # symbols -> further rounds still have 1 pair until fully merged
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    merges = train_bpe(df, 10)
    assert merges == bpe_reference_train({"ab": 1}, 10)
    assert len(merges) == 2  # ('a','b') then ('ab','</w>'), then dry


def test_tie_break_is_lexicographic(spark):
    # 'xy' and 'pq' both appear twice -> pair counts tie at 2 for
    # ('x','y'), ('p','q'), plus the END pairs; smallest (a,b) wins
    df = spark.createDataFrame(
        [(0, "xy xy pq pq")], "doc_id long, text string"
    )
    merges = train_bpe(df, 1)
    ref = bpe_reference_train({"xy": 2, "pq": 2}, 1)
    assert merges == ref
    assert merges[0] == ("p", "q")


def test_apply_bpe_checksum_matches_reference(corpus):
    merges = train_bpe(corpus, 6)
    got = {r["doc_id"]: r.asDict() for r in apply_bpe(corpus, merges).collect()}
    for doc_id, text in [(r["doc_id"], r["text"]) for r in corpus.collect()]:
        toks = []
        for w in text.split(" "):
            if w:
                toks.extend(bpe_reference_segment(w, merges))
        cs = 0
        for t in toks:
            cs = (cs * 31 + sum(t.encode()) % 1000003) % 1000000007
        assert got[doc_id]["n_tokens"] == len(toks)
        assert got[doc_id]["token_checksum"] == cs


def test_apply_bpe_unseen_words(corpus, spark):
    merges = train_bpe(corpus, 6)
    unseen = spark.createDataFrame(
        [(9, "slowest zap")], "doc_id long, text string"
    )
    row = apply_bpe(unseen, merges).collect()[0]
    toks = bpe_reference_segment("slowest", merges) + bpe_reference_segment(
        "zap", merges
    )
    assert row["n_tokens"] == len(toks)
