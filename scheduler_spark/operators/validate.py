"""Batch shape validation — the SHACL-sidecar analog.

The reference optionally validates every harvested doc against SHACL
shapes via a gRPC sidecar, warning or failing the pipeline
(`exit_on_shacl_failure`, /root/reference/userCode/lib/containers.py:
44-48,81-87; validator service Docker-compose.yaml:7-17).

Spark recast: an Arrow-batched `mapInPandas` validator emitting
`is_valid` + `reason` per row — the external service becomes a
vectorized rule set evaluated in-engine.  Rules here are structural
(the shapes a code-corpus row must satisfy); production would load the
rule set from config exactly like `SHACL_FILENAMES`.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "is_valid boolean, reason string"
)

KNOWN_LANGS = {"python", "go", "java"}


def _validate_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    reason = pd.Series([None] * len(pdf), dtype=object)
    ok = pd.Series([True] * len(pdf))

    # na=False: a NULL commit must be flagged malformed, not pass as
    # well-formed (FILES declares commit non-null).
    bad_commit = ~pdf["commit"].str.fullmatch(r"[0-9a-f]{40}", na=False)
    reason[bad_commit] = "malformed_commit"
    ok &= ~bad_commit

    empty = pdf["content"].isna() | (pdf["content"].str.len() == 0)
    reason[empty & ok] = "empty_content"
    ok &= ~empty

    unknown_lang = ~pdf["lang"].isin(list(KNOWN_LANGS))
    reason[unknown_lang & ok] = "unknown_lang"
    ok &= ~unknown_lang

    bad_path = pdf["path"].str.contains(r"\.\.|^/", regex=True, na=True)
    reason[bad_path & ok] = "suspicious_path"
    ok &= ~bad_path

    return pd.DataFrame(
        {
            "repo": pdf["repo"],
            "path": pdf["path"],
            "commit": pdf["commit"],
            "lang": pdf["lang"],
            "is_valid": ok,
            "reason": reason,
        }
    )


def validate_files(files: DataFrame) -> DataFrame:
    """files → (keys, is_valid, reason); all rules vectorized pandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _validate_batch(pdf)

    return files.select("repo", "path", "commit", "lang", "content").mapInPandas(
        run, schema=_SCHEMA
    )
