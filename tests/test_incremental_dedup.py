"""Incremental near-dup: build the corpus index once, persist it, dedup
an incoming batch against it without touching corpus text — recall
measured against the exact batch×corpus Jaccard ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.dedup import (
    build_minhash_index,
    hashed_shingles,
    match_against_index,
)

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.7


def _exact_truth(spark, batch, corpus):
    """Exact Jaccard ≥ THRESHOLD between every (batch, corpus) doc pair
    over the same hashed 3-gram shingles the operator verifies with."""
    a = batch.select(
        F.col("doc_id").alias("new_doc"), hashed_shingles(F.col("text")).alias("sa")
    )
    b = corpus.select(
        F.col("doc_id").alias("corpus_doc"), hashed_shingles(F.col("text")).alias("sb")
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return (
        a.crossJoin(b)
        .filter(inter / union >= THRESHOLD)
        .select("new_doc", "corpus_doc")
    )


def test_incremental_match_through_persisted_index(spark, tmp_path):
    corpus = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # batch: near-dup mutations of 5 corpus docs (truncate a tail — high
    # Jaccard survivors) + 3 novel digit-only docs sharing no shingles
    mutated = (
        corpus.filter(F.col("doc_id") < 5)
        .select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.substr("text", F.lit(1), F.length("text") - 8).alias("text"),
        )
    )
    novel = spark.createDataFrame(
        [(20_000 + i, f"{i}0123456789" * 30) for i in range(3)],
        "doc_id long, text string",
    )
    batch = mutated.union(novel)

    buckets, sets = build_minhash_index(corpus)
    buckets.write.parquet(str(tmp_path / "idx_buckets.parquet"))
    sets.write.parquet(str(tmp_path / "idx_sets.parquet"))
    got = match_against_index(
        batch,
        spark.read.parquet(str(tmp_path / "idx_buckets.parquet")),
        spark.read.parquet(str(tmp_path / "idx_sets.parquet")),
        threshold=THRESHOLD,
    )
    got_pairs = {(r["new_doc"], r["corpus_doc"]) for r in got.collect()}

    truth_pairs = {
        (r["new_doc"], r["corpus_doc"])
        for r in _exact_truth(spark, batch, corpus).collect()
    }
    # each mutated doc is a true near-dup of its origin
    for i in range(5):
        assert (10_000 + i, i) in truth_pairs
    # precision exact by construction, recall 1.0 on this fixture
    assert got_pairs == truth_pairs
    # novel docs never match
    assert not any(nd >= 20_000 for nd, _ in got_pairs)


def test_incremental_match_plan_is_equi_join(spark, tmp_path):
    corpus = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    buckets, sets = build_minhash_index(corpus)
    plan = (
        match_against_index(corpus.limit(10), buckets, sets)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_self_recrawl_flags_unchanged_docs(spark):
    corpus = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    buckets, sets = build_minhash_index(corpus)
    rematch = match_against_index(corpus, buckets, sets)
    # every re-crawled doc matches its own prior version at jac = 1.0
    self_hits = rematch.filter(
        (F.col("new_doc") == F.col("corpus_doc")) & (F.col("jac") == 1.0)
    ).count()
    assert self_hits == corpus.count()
