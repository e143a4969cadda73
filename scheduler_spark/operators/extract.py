"""Batched mention extraction — the `nabu harvest` analog.

The reference shells out per source to ``nabu harvest`` which fetches
each feature URL and stores one JSON-LD doc keyed by content hash
(/root/reference/userCode/lib/containers.py:61-100, docs/hdt.md:12-16).
Here the "harvest" is mention detection over the `content` column:
imports, defined identifiers, and URIs, per language.

Execution model (input_hint: vectorized pandas/Arrow UDFs, no per-row
Python):

- ``content_sha`` is computed JVM-side with ``F.sha2`` *before* the UDF
  and carried through unchanged — the per-row invariant.
- ``extract_mentions`` runs ``mapInPandas``; inside each Arrow batch all
  regex work is vectorized pandas ``.str`` ops:
    * values come from ``Series.str.extractall`` (C regex engine),
    * exact char spans come from a split trick — ``str.split`` with a
      capturing group keeps the matched text in the pieces, so
      ``explode`` + groupby-cumsum of piece lengths yields each match's
      start offset with zero Python-level row loops.
  The span covers the full matched statement (e.g. ``import foo.bar``);
  ``value`` is the normalized captured token.
- ``extract_mentions_relational`` is the pure-JVM fallback (``F.regexp_
  extract_all``): same values, no spans; it exists so the DuckDB oracle
  can verify extraction end-to-end in SQL.

Scale notes: extraction is embarrassingly parallel (narrow map), so the
only scale risks are (a) Python worker batch sizing — governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; and (b) skewed repo
partitions downstream — handled by salting in pipeline.py, not here.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import MENTIONS, enforce

# Per-lang patterns.  Each entry: (value_rx, span_rx)
#   value_rx — ONE capturing group = the normalized mention value
#   span_rx  — same matches, ONE outer capturing group = full match text
#              (inner groups non-capturing) for the split/offset pass.
IMPORT_PATTERNS: dict[str, tuple[str, str]] = {
    "python": (
        r"(?m)^[ \t]*(?:import|from)[ \t]+([\w\.]+)",
        r"(?m)((?:^|(?<=\n))[ \t]*(?:import|from)[ \t]+[\w\.]+)",
    ),
    "go": (
        r"(?m)^[ \t]*import[ \t]+\"([^\"]+)\"",
        r"(?m)((?:^|(?<=\n))[ \t]*import[ \t]+\"[^\"]+\")",
    ),
    "java": (
        r"(?m)^[ \t]*import[ \t]+([\w\.]+)[ \t]*;",
        r"(?m)((?:^|(?<=\n))[ \t]*import[ \t]+[\w\.]+[ \t]*;)",
    ),
}

IDENT_PATTERNS: dict[str, tuple[str, str]] = {
    "python": (r"(?m)^[ \t]*def[ \t]+(\w+)", r"(?m)((?:^|(?<=\n))[ \t]*def[ \t]+\w+)"),
    "go": (r"(?m)^func[ \t]+(\w+)", r"(?m)((?:^|(?<=\n))func[ \t]+\w+)"),
    "java": (
        r"(?m)\b(?:int|void|long|double|String)[ \t]+(\w+)[ \t]*\(",
        r"(?m)(\b(?:int|void|long|double|String)[ \t]+\w+[ \t]*\()",
    ),
}

URI_PATTERN: tuple[str, str] = (
    r"(https?://[^\s\"'<>\)\];]+)",
    r"(https?://[^\s\"'<>\)\];]+)",
)


def _match_spans(content: pd.Series, span_rx: str) -> pd.DataFrame:
    """Vectorized (row, match_no) -> (start, end) via the split trick.

    ``str.split`` with a capturing group interleaves non-match and match
    pieces: [pre, m0, mid, m1, ..., post].  Cumulative piece lengths give
    exact char offsets; odd positions are matches.
    """
    pieces = content.str.split(span_rx, regex=True)
    ex = pieces.explode()
    lens = ex.str.len().fillna(0).astype("int64")
    grp = ex.groupby(level=0)
    pos_in_row = grp.cumcount()
    starts = lens.groupby(level=0).cumsum() - lens
    is_match = (pos_in_row % 2) == 1
    out = pd.DataFrame(
        {
            "start": starts[is_match].astype("int32"),
            "end": (starts[is_match] + lens[is_match]).astype("int32"),
        }
    )
    out["match"] = out.groupby(level=0).cumcount()
    out.index.name = "row"
    return out.reset_index()


def _extract_kind(
    pdf: pd.DataFrame, kind: str, value_rx: str, span_rx: str
) -> pd.DataFrame:
    """All mentions of one kind in one language-homogeneous batch."""
    content = pdf["content"]
    vals = content.str.extractall(value_rx)  # MultiIndex (row, match), col 0
    if vals.empty:
        return pd.DataFrame(
            columns=["row", "match", "value", "start", "end"]
        )
    vals = vals.rename(columns={0: "value"}).reset_index()
    vals = vals.rename(columns={"level_0": "row"})
    spans = _match_spans(content, span_rx)
    merged = vals.merge(spans, on=["row", "match"], how="left")
    merged["start"] = merged["start"].fillna(-1).astype("int32")
    merged["end"] = merged["end"].fillna(-1).astype("int32")
    merged["kind"] = kind
    return merged[["row", "match", "value", "start", "end", "kind"]]


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    frames = []
    for lang, sub in pdf.groupby("lang", sort=False):
        kinds = [
            ("import", *IMPORT_PATTERNS.get(lang, IMPORT_PATTERNS["python"])),
            ("identifier", *IDENT_PATTERNS.get(lang, IDENT_PATTERNS["python"])),
            ("uri", *URI_PATTERN),
        ]
        for kind, value_rx, span_rx in kinds:
            m = _extract_kind(sub.reset_index(drop=True), kind, value_rx, span_rx)
            if m.empty:
                continue
            keys = sub.reset_index(drop=True)[
                ["content_sha", "repo", "path", "commit"]
            ]
            joined = m.merge(
                keys, left_on="row", right_index=True, how="left"
            )
            frames.append(joined)
    if not frames:
        return pd.DataFrame(
            columns=["content_sha", "repo", "path", "commit", "kind", "value", "start", "end"]
        )
    out = pd.concat(frames, ignore_index=True)
    return out[["content_sha", "repo", "path", "commit", "kind", "value", "start", "end"]]


_FLAT_SCHEMA = (
    "content_sha string, repo string, path string, commit string, "
    "kind string, value string, start int, end int"
)


def with_content_sha(files: DataFrame) -> DataFrame:
    """JVM-side sha256 of content — the end-to-end per-row invariant
    (≈ hash-keyed summoned docs, /root/reference/docs/hdt.md:14)."""
    return files.withColumn("content_sha", F.sha2(F.col("content"), 256))


def extract_mentions_grouped(files: DataFrame, salt: int = 8) -> DataFrame:
    """Grouped-map variant: applyInPandas over (repo, salt) groups.

    Same extraction as `extract_mentions`, but each invocation sees one
    salted repo slice — the §2.9 `applyInPandas` surface for per-repo
    work that needs the whole group in hand (e.g. repo-level stats
    alongside extraction).  Salting bounds group size so a mega-repo
    never materializes as one pandas frame (north_rule skew handling).
    """
    if "content_sha" not in files.columns:
        files = with_content_sha(files)
    src = files.select(
        "content_sha", "repo", "path", "commit", "lang", "content"
    ).withColumn("_salt", F.pmod(F.xxhash64("path"), F.lit(salt)))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _extract_batch(pdf.drop(columns=["_salt"]))

    flat = src.groupBy("repo", "_salt").applyInPandas(run, schema=_FLAT_SCHEMA)
    out = flat.select(
        "content_sha", "repo", "path", "commit", "kind", "value",
        F.struct(F.col("start").alias("start"), F.col("end").alias("end")).alias("span"),
    )
    return enforce(out, MENTIONS)


def extract_mentions(files: DataFrame) -> DataFrame:
    """files(+content_sha) → MENTIONS via Arrow-batched pandas UDF."""
    if "content_sha" not in files.columns:
        files = with_content_sha(files)
    src = files.select("content_sha", "repo", "path", "commit", "lang", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    flat = src.mapInPandas(run, schema=_FLAT_SCHEMA)
    out = flat.select(
        "content_sha",
        "repo",
        "path",
        "commit",
        "kind",
        "value",
        F.struct(
            F.col("start").alias("start"), F.col("end").alias("end")
        ).alias("span"),
    )
    return enforce(out, MENTIONS)


# Pure-JVM variant: regexp_extract_all per kind, exploded.  No spans
# (start=end=-1) but byte-identical values — SQL-oracle checkable and
# whole-stage-codegen friendly for pipelines that don't need offsets.
_JVM_IMPORT_RX = {
    "python": r"(?m)^[ \t]*(?:import|from)[ \t]+([\w\.]+)",
    "go": r"(?m)^[ \t]*import[ \t]+\"([^\"]+)\"",
    "java": r"(?m)^[ \t]*import[ \t]+([\w\.]+)[ \t]*;",
}
_JVM_IDENT_RX = {
    "python": r"(?m)^[ \t]*def[ \t]+(\w+)",
    "go": r"(?m)^func[ \t]+(\w+)",
    "java": r"(?m)(?:int|void|long|double|String)[ \t]+(\w+)[ \t]*\(",
}
_JVM_URI_RX = r"(https?://[^\s\"'<>\)\];]+)"


def _rx_by_lang(rx_map: dict[str, str]):
    # unknown langs fall back to the python patterns — the SAME fallback
    # as the pandas path's IMPORT_PATTERNS.get(lang, ...["python"]), so
    # the two extraction paths stay byte-identical for any lang.
    return (
        F.when(F.col("lang") == "go", F.regexp_extract_all("content", F.lit(rx_map["go"]), 1))
        .when(F.col("lang") == "java", F.regexp_extract_all("content", F.lit(rx_map["java"]), 1))
        .otherwise(F.regexp_extract_all("content", F.lit(rx_map["python"]), 1))
    )


def extract_mentions_relational(files: DataFrame) -> DataFrame:
    """Same mention stream, pure Catalyst (no Python workers, no spans)."""
    if "content_sha" not in files.columns:
        files = with_content_sha(files)
    base = files.select(
        "content_sha", "repo", "path", "commit", "lang", "content"
    ).withColumn(
        "kinds",
        F.array(
            F.struct(F.lit("import").alias("kind"), _rx_by_lang(_JVM_IMPORT_RX).alias("values")),
            F.struct(F.lit("identifier").alias("kind"), _rx_by_lang(_JVM_IDENT_RX).alias("values")),
            F.struct(
                F.lit("uri").alias("kind"),
                F.regexp_extract_all("content", F.lit(_JVM_URI_RX), 1).alias("values"),
            ),
        ),
    )
    exploded = (
        base.select(
            "content_sha", "repo", "path", "commit", F.explode("kinds").alias("k")
        )
        .select(
            "content_sha", "repo", "path", "commit",
            F.col("k.kind").alias("kind"),
            F.explode(F.col("k.values")).alias("value"),
        )
        .withColumn(
            "span",
            F.struct(F.lit(-1).alias("start"), F.lit(-1).alias("end")),
        )
    )
    return enforce(exploded, MENTIONS)
