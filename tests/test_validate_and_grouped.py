"""Batch validation (SHACL-sidecar analog) + applyInPandas grouped
extraction equivalence + IVF ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.extract import (
    extract_mentions,
    extract_mentions_grouped,
    with_content_sha,
)
from scheduler_spark.operators.similarity import brute_force_topk, ivf_ann_topk
from scheduler_spark.operators.validate import validate_files
from scheduler_spark.synth import synth_files


def test_validate_flags_each_rule(spark):
    rows = [
        ("r", "ok.py", "a" * 40, "python", "import os\n"),
        ("r", "bad_commit.py", "ZZZ", "python", "import os\n"),
        ("r", "empty.py", "b" * 40, "python", ""),
        ("r", "weird.rb", "c" * 40, "ruby", "puts 1\n"),
        ("r", "../escape.py", "d" * 40, "python", "import os\n"),
    ]
    files = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    got = {r.path: (r.is_valid, r.reason) for r in validate_files(files).collect()}
    assert got["ok.py"] == (True, None)
    assert got["bad_commit.py"] == (False, "malformed_commit")
    assert got["empty.py"] == (False, "empty_content")
    assert got["weird.rb"] == (False, "unknown_lang")
    assert got["../escape.py"] == (False, "suspicious_path")


def test_synth_corpus_fully_valid(spark):
    files = synth_files(spark, 200)
    v = validate_files(files)
    assert v.filter(~F.col("is_valid")).count() == 0


def test_grouped_extraction_equals_map_extraction(spark):
    files = with_content_sha(synth_files(spark, 300))
    a = {
        tuple(r)
        for r in extract_mentions(files).select("content_sha", "kind", "value").collect()
    }
    b = {
        tuple(r)
        for r in extract_mentions_grouped(files)
        .select("content_sha", "kind", "value")
        .collect()
    }
    assert a == b


def test_ivf_ann_finds_planted_neighbors(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.randn(80, 16).astype("float32")
    corpus = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(80)], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [
            (200 + i, (base[i] + 0.01 * rng.randn(16).astype("float32")).tolist())
            for i in range(5)
        ],
        "vec_id long, embedding array<float>",
    )
    exact = {r.qid: r.cid for r in brute_force_topk(queries, corpus, k=1, vec_col="embedding").collect()}
    assert exact == {200 + i: i for i in range(5)}
    approx = {
        r.qid: r.cid
        for r in ivf_ann_topk(
            queries, corpus, k=1, vec_col="embedding", n_lists=4, n_probes=2
        ).collect()
    }
    # a near-identical vector quantizes to the same (or probed) cell
    assert approx == exact
