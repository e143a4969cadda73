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


def normalized_fingerprint(text: Column) -> Column:
    """sha256 of lowercase, punctuation-collapsed text — the document
    fingerprint used for exact near-normalization dedup."""
    return F.sha2(F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")), 256)
