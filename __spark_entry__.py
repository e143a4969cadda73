"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke; rows > 0).
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-runnable ANSI-SQL twin per query (omitted for
                 the genuinely non-SQL-expressible entries → rows-only).

Implementations live in scheduler_spark/queries.py; local gate replica:
tools/oracle_check.py.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from scheduler_spark import queries as _q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hash-keyed mention harvest over `documents` + per-source
    release rollup — the reference's harvest→release contract in one
    plan (crawl ≈ scan, summon ≈ mention explode keyed by sha256,
    release ≈ per-source dedup rollup)."""
    d = spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
    mentions = d.select(
        "doc_id",
        "source",
        F.sha2("text", 256).alias("content_sha"),
        F.explode(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias("value"),
    )
    return (
        mentions.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("content_sha").alias("n_docs"),
            F.countDistinct("value").alias("n_distinct_values"),
        )
        .orderBy("source")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    return _q.all_oracles()
