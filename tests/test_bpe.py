"""Equivalence gate for the iterative BPE trainer (operators/bpe.
bpe_train) against a ~30-line driver-side reference implementation of
Sennrich et al. 2016 Algorithm 1 — overlapping pair counts, greedy
left-to-right merge application, (count desc, pair asc) tie-break.
Corpus-scale DuckDB parity for the final merge table lives in the
oracle gate (queries.bpe_train_merges)."""

from __future__ import annotations

import re
from collections import Counter

from scheduler_spark.operators.bpe import bpe_train


def _ref_bpe(texts: list[str], k: int) -> list[tuple[str, str, str, int]]:
    vocab: Counter = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            if len(w) >= 2:
                vocab[tuple(w)] += 1
    merges = []
    for _ in range(k):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        top = max(counts.values())
        a, b = min(
            (p for p, c in counts.items() if c == top),
            key=lambda p: f"{p[0]} {p[1]}",
        )
        merges.append((a, b, a + b, top))
        nxt: Counter = Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += f
        vocab = nxt
    return merges


def _spark_merges(spark, texts, k):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = bpe_train(df, k=k).orderBy("merge_rank").collect()
    return [(r["lhs"], r["rhs"], r["merged"], r["pair_count"]) for r in rows]


def test_bpe_matches_reference_on_mixed_corpus(spark):
    texts = [
        "banana bandana ban ana",
        "the theme then there anthem",
        "low lower lowest newer newest",
    ]
    assert _spark_merges(spark, texts, 6) == _ref_bpe(texts, 6)


def test_bpe_greedy_run_semantics(spark):
    # runs of identical symbols are where naive string-replace merging
    # diverges from greedy BPE: 'aaaa' must become [aa, aa] after the
    # (a, a) merge, not [aa, a, a] — pins the double-space encoding
    texts = ["aaaa aaa aa baaab"]
    got = _spark_merges(spark, texts, 3)
    ref = _ref_bpe(texts, 3)
    assert got == ref
    assert got[0][:3] == ("a", "a", "aa")


def test_bpe_tiebreak_is_lexicographic(spark):
    # 'xy' and 'yz' both appear exactly twice; the (count desc, pair
    # asc) tie-break must pick 'x y' first in both implementations
    texts = ["xy xy yz yz"]
    assert _spark_merges(spark, texts, 2) == _ref_bpe(texts, 2)


def _ref_encode_counts(texts, k):
    merges = [(a, b) for a, b, _, _ in _ref_bpe(texts, k)]
    out = {}
    for d, t in enumerate(texts):
        words = re.findall(r"[a-z0-9]+", t.lower())
        n_sub = 0
        for w in words:
            syms = list(w)
            for a, b in merges:
                nxt, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        nxt.append(a + b)
                        i += 2
                    else:
                        nxt.append(syms[i])
                        i += 1
                syms = nxt
            n_sub += len(syms)
        out[d] = (len(words), n_sub)
    return out


def test_bpe_encode_counts_match_reference(spark):
    from scheduler_spark.operators.bpe import bpe_encode_counts

    texts = [
        "banana bandana ban ana a",
        "the theme then there anthem",
        "aaaa aaa baaab",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in bpe_encode_counts(df, k=4).collect()
    }
    assert got == _ref_encode_counts(texts, 4)
    assert got[3] == (0, 0)  # empty doc stays total


def test_bpe_stops_early_when_pairs_exhausted(spark):
    # two two-char word types -> after both merge into single symbols
    # there are no adjacent pairs left; the trainer must emit fewer
    # than k rows, not loop or raise
    texts = ["ab ab cd"]
    got = _spark_merges(spark, texts, 10)
    assert got == _ref_bpe(texts, 10)
    assert len(got) == 2
