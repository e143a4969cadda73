"""Dedup + similarity operator correctness against brute-force truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.dedup import (
    exact_duplicates,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from scheduler_spark.operators.similarity import brute_force_topk, lsh_ann_topk


def test_exact_duplicates_normalized(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello world"),  # same after normalization
            (3, "something else"),
        ],
        "doc_id long, text string",
    )
    groups = exact_duplicates(df, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0].n_copies == 2 and groups[0].keeper_doc_id == 1


def test_simhash_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot"),
            (2, "alpha bravo charlie delta echo foxtrot"),
            (3, "zq xv wk pj ml nh bg"),
        ],
        "doc_id long, text string",
    )
    rows = df.select("doc_id", simhash64(F.col("text")).alias("s")).collect()
    sims = {r.doc_id: r.s for r in rows}
    assert sims[1] == sims[2]
    assert sims[1] != sims[3]
    pairs = simhash_pairs(df, max_hamming=0).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_ngram_jaccard_pairs_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "a"),
            (2, "the quick brown fox jumps over the lazy cat", "a"),
            (3, "completely different text with nothing shared", "a"),
            (4, "the quick brown fox jumps over the lazy dog", "b"),  # other block
        ],
        "doc_id long, text string, source string",
    )
    pairs = ngram_jaccard_pairs(df, block_col="source", threshold=0.6).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]


def test_lsh_ann_finds_planted_near_duplicates(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(50, 16).astype("float32")
    corpus_rows = [(i, base[i].tolist()) for i in range(50)]
    # queries = tiny perturbations of corpus vectors 0..4: the true
    # nearest neighbor is known (cos ≈ 0.999) — LSH's actual contract
    # is finding near-parallel vectors, not ranking unrelated ones
    query_rows = [
        (100 + i, (base[i] + 0.01 * rng.randn(16).astype("float32")).tolist())
        for i in range(5)
    ]
    df = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(query_rows, "vec_id long, embedding array<float>")
    exact = brute_force_topk(q, df, k=1, vec_col="embedding")
    approx = lsh_ann_topk(q, df, k=1, vec_col="embedding", dim=16, n_planes=2)
    exact_top1 = {r.qid: r.cid for r in exact.collect()}
    approx_top1 = {r.qid: r.cid for r in approx.collect()}
    assert exact_top1 == {100 + i: i for i in range(5)}
    # near-parallel vectors agree on hyperplane signs → same bucket
    for i in range(5):
        assert approx_top1.get(100 + i) == i


def test_brute_force_topk_is_exact(spark):
    # hand-checkable: orthonormal-ish vectors
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = brute_force_topk(df.filter(F.col("vec_id") == 0), df, k=2).collect()
    assert [(r.cid, r.rank) for r in got] == [(1, 1), (2, 2)] or [
        (r.cid, r.rank) for r in got
    ] == [(1, 1), (3, 2)]
    assert got[0].cid == 1
