"""Boundary gates for ExactSubstr span removal (operators/dedup.
exact_substr_dedup): spans at doc start/end, overlapping spans merging,
sub-min_len duplicates surviving, and zero-token totality.  Corpus-scale
DuckDB parity lives in the oracle gate (queries.exact_substr_removal)."""

from __future__ import annotations

from scheduler_spark.operators.dedup import exact_substr_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _run(spark, rows, min_len=3):
    out = exact_substr_dedup(_docs(spark, rows), min_len=min_len).collect()
    return {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"]) for r in out}


def test_span_at_doc_start(spark):
    got = _run(spark, [("d1", "a b c x y"), ("d2", "a b c q r")])
    assert got["d1"] == ("x y", 5, 3)
    assert got["d2"] == ("q r", 5, 3)


def test_span_at_doc_end(spark):
    got = _run(spark, [("d1", "p q a b c"), ("d2", "m n a b c")])
    assert got["d1"] == ("p q", 5, 3)
    assert got["d2"] == ("m n", 5, 3)


def test_overlapping_spans_merge(spark):
    # d1's grams "a b c" (shared with d2) and "b c d" (shared with d3)
    # overlap on positions 2-3; the window merges them into one excised
    # run 1-4, leaving only the tail token
    got = _run(
        spark,
        [("d1", "a b c d x"), ("d2", "a b c z"), ("d3", "w b c d")],
    )
    assert got["d1"] == ("x", 5, 4)
    assert got["d2"] == ("z", 4, 3)
    assert got["d3"] == ("w", 4, 3)


def test_whole_doc_removed_when_fully_duplicated(spark):
    got = _run(spark, [("d1", "a b c"), ("d2", "a b c")])
    assert got["d1"] == ("", 3, 3)
    assert got["d2"] == ("", 3, 3)


def test_unique_doc_untouched_and_case_normalized(spark):
    # matching is over the lowercased token stream, so "A B C" and
    # "a b c" are the same span; the unique doc keeps all tokens
    got = _run(spark, [("d1", "A B C tail"), ("d2", "a b c other"), ("u", "q w e r t")])
    assert got["d1"] == ("tail", 4, 3)
    assert got["u"] == ("q w e r t", 5, 0)


def test_sub_minlen_duplicates_survive(spark):
    # identical 2-token docs are BELOW min_len=3: no gram exists, so
    # nothing is excised — span-level dedup only fires at >= min_len
    got = _run(spark, [("d1", "a b"), ("d2", "a b")])
    assert got["d1"] == ("a b", 2, 0)
    assert got["d2"] == ("a b", 2, 0)


def test_zero_token_doc_is_total(spark):
    got = _run(spark, [("d1", "!!! ???"), ("d2", "a b c keep me here")])
    assert got["d1"] == ("", 0, 0)
    assert got["d2"][2] == 0
