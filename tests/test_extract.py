"""Mention extraction: pandas-UDF path vs pure-JVM path, span exactness,
and the content-sha invariant (≈ hash-keyed summoned docs,
/root/reference/docs/hdt.md:12-16)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from scheduler_spark.operators.extract import (
    extract_mentions,
    extract_mentions_relational,
    with_content_sha,
)
from scheduler_spark.synth import synth_files

N_FILES = 300


def test_extraction_counts_per_kind(spark):
    files = synth_files(spark, n_files=N_FILES)
    m = extract_mentions(files)
    counts = {r["kind"]: r["count"] for r in m.groupBy("kind").count().collect()}
    # synth plants exactly 2 imports, 1 identifier, 1 uri per file
    assert counts["import"] == 2 * N_FILES
    assert counts["identifier"] == N_FILES
    assert counts["uri"] == N_FILES


def test_pandas_and_jvm_paths_agree(spark):
    files = synth_files(spark, n_files=N_FILES)
    a = {
        tuple(r)
        for r in extract_mentions(files).select("content_sha", "kind", "value").collect()
    }
    b = {
        tuple(r)
        for r in extract_mentions_relational(files)
        .select("content_sha", "kind", "value")
        .collect()
    }
    assert a == b


def test_spans_are_exact(spark):
    files = synth_files(spark, n_files=100)
    m = extract_mentions(files)
    rows = m.join(files, ["repo", "path", "commit"]).select(
        "content", "span", "value", "kind"
    ).collect()
    assert rows
    for row in rows:
        s, e = row.span.start, row.span.end
        assert s >= 0 and e > s
        assert row.value in row.content[s:e], (row.kind, row.value, row.content[s:e])


def test_content_sha_invariant(spark):
    """content_sha equals python hashlib sha256 — the per-row invariant."""
    files = synth_files(spark, n_files=50)
    rows = with_content_sha(files).select("content", "content_sha").collect()
    for row in rows:
        assert row.content_sha == hashlib.sha256(row.content.encode()).hexdigest()
    # carried unchanged into mentions
    m = extract_mentions(files)
    joined = (
        m.join(files, ["repo", "path", "commit"])
        .withColumn("recomputed", F.sha2("content", 256))
        .filter(F.col("recomputed") != F.col("content_sha"))
    )
    assert joined.count() == 0


def test_multiline_and_indented_imports(spark):
    data = [
        (
            "r", "a.py", "c" * 40, "python",
            "import one.two\n    import indented\nfrom pkg import thing\nx = 1\n",
        ),
        ("r", "b.go", "c" * 40, "go", 'package p\nimport "a/b"\nimport "c"\n'),
        ("r", "c.java", "c" * 40, "java", "import com.x.Y;\nimport com.z.W ;\n"),
    ]
    files = spark.createDataFrame(data, "repo string, path string, commit string, lang string, content string")
    m = extract_mentions(files).filter(F.col("kind") == "import")
    got = sorted(r["value"] for r in m.collect())
    assert got == sorted(["one.two", "indented", "pkg", "a/b", "c", "com.x.Y", "com.z.W"])
