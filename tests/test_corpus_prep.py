"""End-to-end training-corpus preparation: quality filter → exact dedup
→ near-dup keepers → split → packing, committed through the catalog
with auditable stage counters."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.catalog import Catalog
from scheduler_spark.operators.corpus import CORPUS_TABLE, prepare_training_corpus

SF = "/root/testdata/sf0.001"


def _fixture_docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    exact_dup = base.filter(F.col("doc_id") == 1).select(
        (F.col("doc_id") + 5_000).alias("doc_id"), "source", "text"
    )
    near_dup = base.filter(F.col("doc_id") == 2).select(
        (F.col("doc_id") + 6_000).alias("doc_id"),
        "source",
        F.substr("text", F.lit(1), F.length("text") - 8).alias("text"),
    )
    junk = spark.createDataFrame(
        [(7_000, "srcX", "aa bb")],  # fails the min-token quality rule
        "doc_id long, source string, text string",
    )
    return base.unionByName(exact_dup).unionByName(near_dup).unionByName(junk)


def test_prepare_training_corpus_counters_and_table(spark, tmp_path):
    docs = _fixture_docs(spark)
    cat = Catalog(str(tmp_path / "cat"), spark)
    res = prepare_training_corpus(docs, cat, run_id="c1")

    assert res.n_input == docs.count()
    assert res.n_quality_rejected >= 1  # the junk doc at minimum
    assert res.n_exact_dups >= 1  # the planted copy of doc 1
    assert res.n_near_dups >= 1  # the planted truncation of doc 2
    # counter arithmetic is exact
    assert res.n_input == (
        res.n_quality_rejected
        + res.n_exact_dups
        + res.n_near_dups
        + res.n_train
        + res.n_val
    )

    out = cat.read(CORPUS_TABLE)
    assert out.count() == res.n_train + res.n_val
    # planted duplicates lost to their lower-id keepers
    survivors = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 5_001 not in survivors and 6_002 not in survivors
    assert 1 in survivors and 2 in survivors
    # split is the pinned multiplicative-hash carve
    for r in out.collect():
        expected = "train" if (r["doc_id"] * 2654435761) % 100 < 90 else "val"
        assert r["split"] == expected
    # counters ride the snapshot for lineage consumers
    props = cat.snapshots(CORPUS_TABLE)[-1]["properties"]
    assert props["n_train"] == res.n_train and props["n_input"] == res.n_input


def test_pack_ids_are_contiguous_per_split_source(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"), spark)
    prepare_training_corpus(_fixture_docs(spark), cat, run_id="c1", pack_tokens=128)
    out = cat.read(CORPUS_TABLE).orderBy("split", "source", "doc_id").collect()
    by_group: dict[tuple, list] = {}
    for r in out:
        by_group.setdefault((r["split"], r["source"]), []).append(r)
    for rows in by_group.values():
        tok_before = 0
        for r in rows:
            assert r["pack_id"] == tok_before // 128
            tok_before += r["n_tok"]


def test_near_dup_keeper_is_numeric_min_across_digit_boundary(spark):
    """Doc ids 9 and 10 in one component: the keeper must be 9 (numeric
    min), not 10 (the lexicographic min of the unpadded strings)."""
    from scheduler_spark.operators.corpus import _keepers_after_near_dup

    pairs = spark.createDataFrame(
        [(9, 10, 0.9), (999, 1000, 0.9)], "doc_a long, doc_b long, jac double"
    )
    keepers = {
        r["doc_id"]: r["keeper_doc_id"] for r in _keepers_after_near_dup(pairs).collect()
    }
    assert keepers == {9: 9, 10: 9, 999: 999, 1000: 999}
