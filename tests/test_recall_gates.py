"""Recall of the approximate scale paths pinned at BENCH scale (sf0.1),
not just toy sizes — the gap the round-1 verdict called out.  The
driver's oracle gate asserts the same contracts at sf0.01; these tests
re-measure at 10× so drift at scale fails loudly.

All inputs are the fixed testdata parquets and all algorithms are
seed-deterministic, so the measured recalls are exact constants for a
given implementation — thresholds are pinned just under the measured
values (minhash 1.0, embedding-LSH 1.0, IVF@10 0.88 on near-isotropic
vectors with 6/8 probes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark import queries as q

SF01 = "/root/testdata/sf0.1"


def _recall(truth, cand, keys) -> tuple[int, float]:
    n_true = truth.count()
    n_hit = truth.join(cand, keys, "left_semi").count()
    return n_true, (n_hit / n_true if n_true else 1.0)


def test_minhash_lsh_recall_at_bench_scale(spark):
    truth = q.dedup_ngram_jaccard(spark, SF01).select("doc_a", "doc_b").cache()
    cand = q.dedup_minhash_lsh(spark, SF01).select("doc_a", "doc_b")
    n_true, recall = _recall(truth, cand, ["doc_a", "doc_b"])
    truth.unpersist()
    assert n_true > 0
    assert recall >= 0.99, (n_true, recall)


def test_embedding_lsh_recall_at_bench_scale(spark):
    truth = q.dedup_embedding_cosine(spark, SF01).select("vec_a", "vec_b").cache()
    cand = q.dedup_embedding_lsh(spark, SF01).select("vec_a", "vec_b")
    n_true, recall = _recall(truth, cand, ["vec_a", "vec_b"])
    truth.unpersist()
    assert n_true >= 100  # the sf0.1 truth set is non-trivial (144 pairs)
    assert recall >= 0.99, (n_true, recall)


def test_ivf_topk_recall_at_bench_scale(spark):
    from scheduler_spark.operators.similarity import ivf_ann_topk

    truth = q.ann_cosine_topk(spark, SF01).select("qid", "cid").cache()
    v = spark.read.parquet(f"{SF01}/embeddings.parquet")
    approx = ivf_ann_topk(
        v.filter(F.col("vec_id") < 5), v, k=10, n_lists=8, n_probes=6
    ).select("qid", "cid")
    n_true, recall = _recall(truth, approx, ["qid", "cid"])
    truth.unpersist()
    assert n_true == 50
    # top-10 of near-isotropic vectors is the adversarial case for IVF
    # (neighbors at cos≈0.3 spread across cells); 0.85 pins the measured
    # 0.88 with headroom for benign re-tuning, and the near-dup contract
    # is separately pinned at 0.99 above.
    assert recall >= 0.85, (n_true, recall)


def test_ivfpq_topk_recall_at_bench_scale(spark):
    """IVF-PQ at 10× the oracle-gate corpus.  On near-isotropic
    vectors ADC rank is only weakly correlated with true rank, so the
    shortlist must track the per-cell candidate count: ~25% of the
    probed corpus (500 of ~1500 candidates) measures 0.80 here against
    the plain-IVF ceiling of 0.88 at the same 6/8 probes — the
    remaining 0.08 is the price of ranking by 8-byte codes instead of
    512-byte vectors.  Deterministic; pinned just under the measured
    value."""
    from scheduler_spark.operators.similarity import ivfpq_ann_topk

    truth = q.ann_cosine_topk(spark, SF01).select("qid", "cid").cache()
    v = spark.read.parquet(f"{SF01}/embeddings.parquet")
    approx = ivfpq_ann_topk(
        v.filter(F.col("vec_id") < 5), v, k=10, n_lists=8, n_probes=6, shortlist=500
    ).select("qid", "cid")
    n_true, recall = _recall(truth, approx, ["qid", "cid"])
    truth.unpersist()
    assert n_true == 50
    assert recall >= 0.75, (n_true, recall)


def test_simhash_recall_at_bench_scale(spark):
    """SimHash banding must hold FULL recall at hamming<=3 (pigeonhole
    over 4x16-bit bands) on the sf0.1 documents table — the driver gate
    measures the same contract on the deterministic golden corpus.

    max_bucket=1024 keeps every bucket (measured max 830 at sf0.1) so
    the pin isolates the pigeonhole guarantee; with the default 256 cap
    this corpus — deliberately near-dup-saturated — sheds its hottest
    buckets and recall drops to ~0.27, which is the cap doing its job
    observably, not a banding bug."""
    from scheduler_spark.operators.dedup import simhash_pairs, simhash_table

    docs = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .select("doc_id", "text")
    )
    sims = simhash_table(docs).cache()
    a = sims.select(F.col("doc_id").alias("doc_a"), F.col("sim").alias("sa"))
    b = sims.select(F.col("doc_id").alias("doc_b"), F.col("sim").alias("sb"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .select("doc_a", "doc_b")
        .cache()
    )
    cand = simhash_pairs(docs, max_hamming=3, max_bucket=1024).select("doc_a", "doc_b")
    n_true, recall = _recall(truth, cand, ["doc_a", "doc_b"])
    sims.unpersist()
    truth.unpersist()
    assert n_true > 0
    assert recall == 1.0, (n_true, recall)


def test_bucket_cap_shed_is_measurable_at_bench_scale(spark):
    """The default simhash cap sheds hot buckets on the near-dup-
    saturated sf0.1 corpus (the documented recall drop above);
    bucket_cap_stats turns that shed into numbers a pipeline can alert
    on, and lifting the cap past the hottest bucket sheds nothing."""
    from scheduler_spark.operators.dedup import (
        bucket_cap_stats,
        simhash_banded,
        simhash_table,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet").select("doc_id", "text")
    banded = simhash_banded(simhash_table(docs)).cache()
    row = bucket_cap_stats(banded, ["band", "chunk"], max_bucket=256).first()
    assert row.n_capped_buckets > 0 and row.n_rows_shed > 0
    assert row.max_bucket_n > 256
    row2 = bucket_cap_stats(
        banded, ["band", "chunk"], max_bucket=int(row.max_bucket_n)
    ).first()
    banded.unpersist()
    assert row2.n_rows_shed == 0 and row2.n_capped_buckets == 0


def test_knn_graph_recall_at_bench_scale(spark):
    """Corpus-wide kNN-graph directed-edge recall at sf0.1 — every
    vector is a query, so boundary cells matter far more than in the
    bounded-query IVF gate.  Measured 0.921 with 6/8 probes (matches
    0.9216 at sf0.01 — the blocking quality is scale-stable)."""
    from scheduler_spark.operators.similarity import brute_force_topk, knn_graph

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    truth = brute_force_topk(emb, emb, k=5).select("qid", "cid").cache()
    cand = knn_graph(emb, k=5, n_lists=8, n_probes=6).select(
        F.col("src").alias("qid"), F.col("dst").alias("cid")
    )
    n_true, recall = _recall(truth, cand, ["qid", "cid"])
    truth.unpersist()
    assert n_true > 0
    assert recall >= 0.91, (n_true, recall)


def test_mutual_knn_edges_are_symmetric_subset(spark):
    """mutual=True must keep exactly the edges whose reverse is also a
    top-k edge: result ⊆ directed graph, and closed under reversal."""
    from scheduler_spark.operators.similarity import knn_graph

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    directed = knn_graph(emb, k=5, n_lists=8, n_probes=6).select("src", "dst").cache()
    mutual = knn_graph(emb, k=5, mutual=True, n_lists=8, n_probes=6).select(
        "src", "dst"
    ).cache()
    assert mutual.join(directed, ["src", "dst"], "left_anti").count() == 0
    rev = mutual.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert mutual.join(rev, ["src", "dst"], "left_anti").count() == 0
    # and it IS the mutual subset: directed ∩ reverse(directed)
    drev = directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    expect = directed.join(drev, ["src", "dst"], "left_semi")
    assert expect.exceptAll(mutual).count() == 0
    assert mutual.exceptAll(expect).count() == 0
    directed.unpersist()
    mutual.unpersist()
