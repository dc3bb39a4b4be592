"""Distributed BPE (byte-pair-encoding) tokenizer training + segmentation.

Classic Sennrich-style BPE re-expressed for Spark: the corpus collapses
to a distributed WORD-FREQUENCY table after one aggregation (the only
pass that ever touches raw text), then each merge round is

    explode adjacent symbol pairs  ->  groupBy(pair) sum(freq)  ->  top-1

with the winning pair folded back into the symbol sequences by a
higher-order-function pass (no Python in the loop; the HOF lambda is
interpreted but runs over the vocabulary table, not the corpus —
CLAUDE.md's dense-math exception doesn't apply to string folds).

Determinism: the winner is max count, tie-broken by (first symbol,
second symbol) ascending — total order, no hash iteration order
anywhere. Merges apply as ONE left-to-right pass per round ("aaa" with
merge (a,a) -> [aa, a]), and segmentation applies the learned merges in
rank order with the same scan — bpe_reference_* below is the
independent sequential implementation the tests and the oracle compare
against.

Scale shape (100 TB): raw text is touched exactly once (word count —
the same shuffle shape as a word-count job, AQE-skew-safe). Every merge
round costs one vocabulary-sized shuffle + a driver-side top-1 row
(dimension-sized collect, documented contract). Lineage is truncated
with localCheckpoint each round so the plan doesn't grow with
n_merges. Segmentation broadcasts the merge list (n_merges rows) and
memoizes word->tokens per Arrow batch, so zipfian corpora tokenize at
dictionary speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


# ---------------------------------------------------------------------------
# reference implementation (sequential; used by tests and the oracle)
# ---------------------------------------------------------------------------


def _merge_once(syms: list[str], a: str, b: str) -> list[str]:
    """One left-to-right merge pass: each (a, b) adjacency -> a+b."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def bpe_reference_train(
    word_freq: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Sequential BPE training over a word-frequency dict — the ground
    truth the distributed trainer must reproduce exactly."""
    vocab = {w: list(w) + [END] for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, freq in word_freq.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        # max count; ties -> lexicographically SMALLEST (a, b)
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append(best_pair)
        for w in vocab:
            vocab[w] = _merge_once(vocab[w], *best_pair)
    return merges


def bpe_reference_segment(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Apply learned merges in rank order, one pass each."""
    syms = list(word) + [END]
    for a, b in merges:
        syms = _merge_once(syms, a, b)
    return syms


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-wide pass: (word, freq), empty tokens dropped."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ", -1)).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Distributed BPE training; returns the learned merge list (the
    only driver-side state — n_merges tuples plus one top-1 row per
    round)."""
    wf = word_frequencies(docs, text_col)
    syms = wf.select(
        "freq",
        F.expr(
            f"concat(transform(sequence(1, length(w)),"
            f" i -> substring(w, i, 1)), array('{END}'))"
        ).alias("syms"),
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts = (
            syms.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, greatest(size(syms) - 1, 0)),"
                        " (x, i) -> struct(x AS a, element_at(syms, i + 2) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pair_counts.orderBy(
            F.desc("cnt"), F.col("p.a"), F.col("p.b")
        ).first()
        if best is None:
            break
        a, b = best["p"]["a"], best["p"]["b"]
        merges.append((a, b))
        la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
        folded = F.aggregate(
            "syms",
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lab)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        nxt = syms.select("freq", folded.alias("syms")).localCheckpoint()
        syms.unpersist()
        syms = nxt
    syms.unpersist()
    return merges


# ---------------------------------------------------------------------------
# distributed segmenter
# ---------------------------------------------------------------------------


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize each document with a learned merge list: per doc emit
    (doc_id, n_tokens, token_checksum) where the checksum is the
    order-sensitive polynomial hash of the token stream (31-rolling over
    token byte sums, mod 1_000_000_007) — engine-independent ints."""
    import pandas as pd

    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(list(merges))

    def kernel(batches):
        merge_list = bc.value
        memo: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = bpe_reference_segment(word, merge_list)
            return got

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                text = getattr(row, text_col)
                toks: list[str] = []
                for w in text.split(" "):
                    if w:
                        toks.extend(seg(w))
                cs = 0
                for t in toks:
                    cs = (cs * 31 + sum(t.encode()) % 1000003) % 1000000007
                rows.append((getattr(row, id_col), len(toks), cs))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_tokens", "token_checksum"]
            )

    id_t = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_t}, n_tokens long, token_checksum long"
    )
