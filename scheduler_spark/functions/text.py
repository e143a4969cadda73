"""Text-analysis column expressions (language-ID, quality, tokens).

Used by the documents-table operators; DuckDB-oracle twins live in
scheduler_spark/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
}


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.regexp_extract_all(text, F.lit(r"\S+"), 0)


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization: letter runs, digit runs, single marks."""
    return F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)


def word_tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z]+"), 0)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = word_tokens(text)
    stop = F.filter(toks, lambda t: t.isin(STOPWORDS[lang]))
    return F.size(stop) / F.greatest(F.size(toks), F.lit(1))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (argmax = predicted lang)."""
    toks = word_tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t, ws=ws: t.isin(ws)))
        for lang, ws in STOPWORDS.items()
    }


def quality_metrics(toks: Column, sorted_toks: Column | None = None) -> dict[str, Column]:
    """Gopher/C4-style per-document quality metrics as pure array-lambda
    column expressions (no shuffle): token count, type-token ratio,
    most-common-token fraction, mean word length, duplicate-2-gram
    fraction.  Ratios rounded to 6 dp (the DuckDB oracle twin in
    queries.quality_gopher_rules computes the identical formulas).

    `toks` must be a MATERIALIZED tokens column (`word_tokens` aliased
    in a prior select), not the tokenization expression itself: the
    metrics reference it ~8×, and inlining the regex per reference
    multiplied the whole pass ~6× (12 s → 2 s at sf0.1 — projections
    don't CSE expensive subexpressions, but CollapseProject keeps a
    multiply-referenced non-cheap column in its own projection)."""
    n_tok = F.size(toks)
    denom = F.greatest(n_tok, F.lit(1))
    if sorted_toks is None:
        # most-common-token count, O(n_distinct × n) per doc — callers
        # on a hot path should pass `sorted_toks` (a MATERIALIZED
        # array_sort(toks) column) for the O(n) run-length form below
        top_c = F.coalesce(
            F.array_max(
                F.transform(
                    F.array_distinct(toks),
                    lambda t: F.size(F.filter(toks, lambda x: x == t)),
                )
            ),
            F.lit(0),
        )
    else:
        # r06: the most-common-token count equals the longest run in
        # the SORTED token array — one O(n) fold instead of the
        # O(n_distinct × n) per-token filter scan (guide §1.2 step 2;
        # measured 7.9 s → 2.x s at sf1.0 for quality_gopher_rules).
        # `sorted_toks` must be a materialized column, not the
        # array_sort expression itself: the fold references it twice
        # per element and projections don't CSE (see docstring).
        top_c = (
            F.when(
                n_tok >= 2,
                F.aggregate(
                    F.sequence(F.lit(2), n_tok),
                    F.struct(
                        F.lit(1).alias("run"), F.lit(1).alias("best")
                    ),
                    lambda acc, i: F.struct(
                        F.when(
                            F.get(sorted_toks, i - 1) == F.get(sorted_toks, i - 2),
                            acc["run"] + 1,
                        )
                        .otherwise(F.lit(1))
                        .alias("run"),
                        F.greatest(
                            acc["best"],
                            F.when(
                                F.get(sorted_toks, i - 1) == F.get(sorted_toks, i - 2),
                                acc["run"] + 1,
                            ).otherwise(F.lit(1)),
                        ).alias("best"),
                    ),
                    lambda acc: acc["best"],
                ),
            )
            .when(n_tok == 1, F.lit(1))
            .otherwise(F.lit(0))
        )
    char_sum = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    grams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat(F.get(toks, i - 1), F.lit("_"), F.get(toks, i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return {
        "n_tok": n_tok.cast("long"),
        "distinct_ratio": F.round(F.size(F.array_distinct(toks)) / denom, 6),
        "top_tok_frac": F.round(top_c / denom, 6),
        "mean_word_len": F.round(char_sum / denom, 6),
        "dup_2gram_frac": F.round(
            (F.size(grams) - F.size(F.array_distinct(grams)))
            / F.greatest(F.size(grams), F.lit(1)),
            6,
        ),
    }


def quality_keep(
    n_tok: Column,
    top_tok_frac: Column,
    distinct_ratio: Column,
    mean_word_len: Column,
    min_tokens: int = 50,
    max_top_tok_frac: float = 0.2,
    min_distinct_ratio: float = 0.03,
    word_len_range: tuple[float, float] = (2.0, 10.0),
) -> Column:
    """The keep predicate over the (rounded) quality metric columns."""
    return (
        (n_tok >= min_tokens)
        & (top_tok_frac <= max_top_tok_frac)
        & (distinct_ratio >= min_distinct_ratio)
        & mean_word_len.between(*word_len_range)
    )


def normalized_fingerprint(text: Column) -> Column:
    """sha256 of lowercase, punctuation-collapsed text — the document
    fingerprint used for exact near-normalization dedup."""
    return F.sha2(F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")), 256)
