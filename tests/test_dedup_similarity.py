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


def test_simhash_table_equals_expression_path(spark):
    """The shuffle-friendly agg path must produce bit-identical hashes
    to the column-expression fold (including the zero-token doc)."""
    from scheduler_spark.operators.dedup import simhash_table

    rows = [
        (1, "alpha bravo charlie delta"),
        (2, "the quick brown fox 123 jumps"),
        (3, ""),
        (4, "!!! ???"),  # tokens empty after normalization
        (5, "alpha bravo charlie delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r.doc_id: r.s for r in df.select("doc_id", simhash64(F.col("text")).alias("s")).collect()}
    table = {r.doc_id: r.sim for r in simhash_table(df).collect()}
    assert table == expr
    assert table[3] == 0 and table[4] == 0


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


def test_minhash_lsh_doc_pairs_match_exact_twin(spark):
    """LSH-blocked pairs == exact all-pairs jaccard on a corpus where
    recall is guaranteed (near-dups at J≥0.7, 16 single-row bands)."""
    from scheduler_spark.operators.dedup import minhash_lsh_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today", "a"),
        (2, "the quick brown fox jumps over the lazy dog todaz", "a"),  # near-dup of 1
        (3, "completely unrelated text about spark partitions!!", "a"),
        (4, "the quick brown fox jumps over the lazy dog today", "b"),  # other block
        (5, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nn", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    lsh = {
        (p.doc_a, p.doc_b)
        for p in minhash_lsh_pairs(df, block_col="source", threshold=0.7).collect()
    }
    exact = {
        (p.doc_a, p.doc_b)
        for p in ngram_jaccard_pairs(df, block_col="source", threshold=0.7).collect()
    }
    assert lsh == exact == {(1, 2)}  # cross-block (1,4) is never a candidate


def test_embedding_lsh_pairs_match_exact_cosine(spark):
    from scheduler_spark.operators.similarity import embedding_lsh_pairs

    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(40, 16).astype("float64")
    base[1] = base[0] + 0.05 * rng.randn(16)  # planted near-dup pair (0,1)
    base[7] = base[6] + 0.05 * rng.randn(16)  # planted near-dup pair (6,7)
    df = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(40)], "vec_id long, embedding array<double>"
    )
    Vn = base / np.linalg.norm(base, axis=1, keepdims=True)
    S = Vn @ Vn.T
    exact = {
        (i, j)
        for i in range(40) for j in range(i + 1, 40)
        if S[i, j] >= 0.8
    }
    got = {
        (p.vec_a, p.vec_b)
        for p in embedding_lsh_pairs(df, dim=16, threshold=0.8).collect()
    }
    assert {(0, 1), (6, 7)} <= exact
    assert got == exact


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
