"""Hashing column expressions: content identity + partition fingerprints."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_sha256(content: Column) -> Column:
    """The end-to-end per-row invariant (BASELINE.json input_hint)."""
    return F.sha2(content, 256)


def partition_fingerprint_expr() -> list[Column]:
    """Aggregates producing an order-independent partition fingerprint:
    commutative hash-sum + row count (see plans/checkpoint.py)."""
    return [
        F.sum(F.xxhash64("content_sha").cast("decimal(38,0)")).alias("hsum"),
        F.count(F.lit(1)).alias("rows"),
    ]
