"""Hand-computed gates for the round-4 tokenizer/data-selection adds:
bpe_pair_merges, boilerplate_dup_grams (Lee et al. 2022 duplicated-span
flags), and dsir_importance_weights (Xie et al. 2023).  DuckDB parity
for all three lives in the oracle gate (tools/oracle_check.py)."""

from __future__ import annotations

import math

import pytest

from scheduler_spark import queries as Q


def _docs_dir(spark, tmp_path, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    rows = [
        (i, t, lang, f"src{i}", len(t))
        for i, (t, lang) in enumerate(zip(texts, langs))
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bpe_pair_merges_exact(spark, tmp_path):
    # words: abc → {ab, bc}, ab → {ab}, bc → {bc}; single-char word "x"
    # contributes nothing
    sf = _docs_dir(spark, tmp_path, ["abc ab", "bc x"])
    out = [(r["pair"], r["pair_count"]) for r in Q.bpe_pair_merges(spark, sf).collect()]
    assert out == [("ab", 2), ("bc", 2)]


def test_boilerplate_dup_grams_exact(spark, tmp_path):
    base = "a1 a2 a3 a4 a5 a6 a7 a8"  # exactly one 8-gram
    sf = _docs_dir(
        spark,
        tmp_path,
        [
            base,                        # 1 gram, duplicated by doc 1 → drop
            base + " b9 b10 b11 b12",   # 5 grams, 1 dup → exactly 20%, keep
            "c1 c2 c3 c4 c5 c6 c7 c8",  # 1 unique gram → keep
            "short doc",                 # < 8 tokens → no row
        ],
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_dup"], r["keep"])
        for r in Q.boilerplate_dup_grams(spark, sf).collect()
    }
    assert out == {0: (1, 1, False), 1: (5, 1, True), 2: (1, 0, True)}


def _bucket(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * 31 + ord(ch)) % 1000003
    return h % 64


def test_dsir_importance_weights_exact(spark, tmp_path):
    texts = ["aa bb", "aa cc", "bb"]
    langs = ["en", "de", "en"]
    sf = _docs_dir(spark, tmp_path, texts, langs)
    toks = [t.split() for t in texts]
    tgt, raw = {}, {}
    for words, lang in zip(toks, langs):
        for w in words:
            b = _bucket(w)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    T, R = sum(tgt.values()), sum(raw.values())

    def w(b):
        return math.log((tgt.get(b, 0) + 1.0) / (T + 64.0)) - math.log(
            (raw[b] + 1.0) / (R + 64.0)
        )

    expected = {
        i: round(sum(w(_bucket(x)) for x in words), 6)
        for i, words in enumerate(toks)
    }
    out = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logratio"])
        for r in Q.dsir_importance_weights(spark, sf).collect()
    }
    assert set(out) == {0, 1, 2}
    for i, words in enumerate(toks):
        assert out[i][0] == len(words)
        assert out[i][1] == pytest.approx(expected[i], abs=1.5e-6)


def test_dsir_target_heavy_doc_scores_above_offtarget(spark, tmp_path):
    # a doc made of target-only tokens must outscore one made of tokens
    # that appear only off-target (the selection property DSIR exists for)
    texts = ["tok1 tok2 tok1 tok2", "zz9 qq7 zz9 qq7", "tok1 tok2"]
    langs = ["en", "de", "en"]
    sf = _docs_dir(spark, tmp_path, texts, langs)
    out = {
        r["doc_id"]: r["dsir_logratio"]
        for r in Q.dsir_importance_weights(spark, sf).collect()
    }
    assert out[0] > out[1]
