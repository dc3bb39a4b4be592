"""Text-analysis operators for the training-data pipeline: token keys,
shingles, minhash, simhash, fingerprinting, language-ID, quality scoring.

One ARITHMETIC definition, two SQL dialects: every hash/score here is
defined once as integer arithmetic and rendered into both Spark SQL and
DuckDB SQL by the tiny dialect layer below, so the DuckDB oracle checks
the exact engine semantics (same rationale as functions/projection.py).

Hashing scheme (SQL-expressible by construction — no engine-specific
hash() builtins, which differ across engines):
  word_key(w)  = (ascii(w[0]) % 256)*65536 + (ascii(w[1]) % 256)*256
                 + (len(w) % 256)
  shingle(i)   = (k[i]*2654435761 + k[i+1]*40503 + k[i+2]) % 1000003
  minhash_j    = min_i (A_j * shingle(i) + B_j) % 1000003
  simhash bit b: sign of Σ_words (2*bit_b(word_key) - 1)
  fingerprint  = Σ_i ((k[i] + i*31) * 2654435761 % 1000003) % 1000003
                 (positional yet commutative — exact under any agg order)
The ``% 256`` clamp on the code points is load-bearing: ascii() returns
full Unicode code points (≤ 1114111), so without it k*2654435761 would
overflow BIGINT and RAISE under Spark ANSI mode for non-ASCII text. With
the clamp every k ≤ 16,777,215, so k*2654435761 ≤ 4.46e16 — all
intermediates fit int64 for any input. ASCII text hashes identically
with or without the clamp (code points < 256), so golden values are
unchanged.
"""

from __future__ import annotations

P = 1000003
MINHASH_A = (37, 101, 193, 271)
MINHASH_B = (7, 11, 13, 17)

STOPWORDS = {
    "en": ("the", "a", "of", "to", "and"),
    "dataish": ("table", "row", "column", "key", "value"),
    "queryish": ("query", "scan", "join", "sort", "filter"),
}


class Dialect:
    """Function-name shims between Spark SQL and DuckDB SQL."""

    def __init__(self, name: str):
        self.name = name

    def split(self, s: str, sep: str = "' '") -> str:
        return (
            f"split({s}, {sep})" if self.name == "spark" else f"string_split({s}, {sep})"
        )

    def transform(self, arr: str, lam: str) -> str:
        fn = "transform" if self.name == "spark" else "list_transform"
        return f"{fn}({arr}, {lam})"

    def amin(self, arr: str) -> str:
        fn = "array_min" if self.name == "spark" else "list_min"
        return f"{fn}({arr})"

    def asum(self, arr: str) -> str:
        if self.name == "spark":
            return f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        return f"list_sum({arr})"

    def size(self, arr: str) -> str:
        return f"size({arr})" if self.name == "spark" else f"len({arr})"

    def at(self, arr: str, i: str) -> str:
        """1-based element access."""
        return f"element_at({arr}, {i})" if self.name == "spark" else f"{arr}[{i}]"

    def seq1(self, n: str) -> str:
        """list [1..n] (empty when n < 1)."""
        if self.name == "spark":
            return f"CASE WHEN {n} >= 1 THEN sequence(1, {n}) ELSE array() END"
        return f"range(1, {n} + 1)"


def word_keys_sql(d: Dialect, text: str) -> str:
    words = d.split(text)
    # CAST AS BIGINT + % 256 are load-bearing: Spark runs ANSI mode where
    # int*int overflow raises instead of promoting, and ascii() returns
    # full Unicode code points (≤ 1114111) — unclamped, a non-ASCII
    # document would overflow the shingle product at scale. Clamping to a
    # byte keeps every intermediate within int64 for ANY input while
    # hashing ASCII text identically (module docstring).
    lam = (
        "w -> (CAST(ascii(substr(w, 1, 1)) AS BIGINT) % 256) * 65536 "
        "+ (CAST(ascii(substr(w, 2, 1)) AS BIGINT) % 256) * 256 "
        "+ (length(w) % 256)"
    )
    return d.transform(words, lam)


def shingles_sql(d: Dialect, keys: str) -> str:
    """Word-trigram shingle keys (empty when < 3 words).

    Spark form uses slice + zip_with so the keys array is evaluated O(1)
    times per document (element_at over an inline transform re-evaluates
    the whole array per element — O(n²), measured 20×+ slower). DuckDB
    keeps the indexed form (the oracle only runs at tiny SF).
    """
    if d.name == "spark":
        n = f"(size({keys}) - 2)"
        a = f"slice({keys}, 1, {n})"
        b = f"slice({keys}, 2, {n})"
        c = f"slice({keys}, 3, {n})"
        inner = f"zip_with({a}, {b}, (x, y) -> x * 2654435761 + y * CAST(40503 AS BIGINT))"
        outer = f"zip_with({inner}, {c}, (xy, z) -> (xy + z) % {P})"
        return f"CASE WHEN size({keys}) >= 3 THEN {outer} ELSE array() END"
    n = f"({d.size(keys)} - 2)"
    k0 = d.at(keys, "i")
    k1 = d.at(keys, "i + 1")
    k2 = d.at(keys, "i + 2")
    lam = f"i -> ({k0} * 2654435761 + {k1} * CAST(40503 AS BIGINT) + {k2}) % {P}"
    return d.transform(d.seq1(n), lam)


def minhash_sql(d: Dialect, shingles: str, j: int) -> str:
    a, b = MINHASH_A[j], MINHASH_B[j]
    hashed = d.transform(shingles, f"s -> ({a} * s + {b}) % {P}")
    return f"COALESCE({d.amin(hashed)}, -1)"


def fingerprint_sql(d: Dialect, keys: str) -> str:
    if d.name == "spark":
        # zip_with form: keys evaluated O(1) times (see shingles_sql note)
        terms = (
            f"zip_with({keys}, sequence(1, size({keys})), "
            f"(k, i) -> ((k + i * 31) * 2654435761) % {P})"
        )
        return f"COALESCE({d.asum(terms)}, 0) % {P}"
    n = d.size(keys)
    term = f"i -> (({d.at(keys, 'i')} + i * 31) * 2654435761) % {P}"
    return f"COALESCE({d.asum(d.transform(d.seq1(n), term))}, 0) % {P}"


def simhash_bit_terms(b: int) -> str:
    """±1 contribution of one word key to simhash bit b; `k` is the key
    column of an exploded words row. Integer division by 2^b (exact in
    double for k ≤ 8e6)."""
    return f"((CAST(FLOOR(k / {1 << b}.0) AS BIGINT) % 2) * 2 - 1)"


def stopword_score_sql(d: Dialect, words: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    flagged = d.transform(words, f"w -> CASE WHEN w IN ({lst}) THEN 1 ELSE 0 END")
    return f"COALESCE({d.asum(flagged)}, 0)"


def langid_sql(d: Dialect, words: str) -> str:
    """Deterministic argmax over stopword scores, ties broken by language
    name ascending."""
    scores = {lang: stopword_score_sql(d, words, lang) for lang in sorted(STOPWORDS)}
    # argmax via nested CASE comparing in name order (>= keeps the earlier
    # name on ties — deterministic both engines)
    l1, l2, l3 = sorted(STOPWORDS)
    s1, s2, s3 = scores[l1], scores[l2], scores[l3]
    return (
        f"CASE WHEN {s1} >= {s2} AND {s1} >= {s3} THEN '{l1}' "
        f"WHEN {s2} >= {s3} THEN '{l2}' ELSE '{l3}' END"
    )


SPARK = Dialect("spark")
DUCK = Dialect("duck")
