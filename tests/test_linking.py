"""Entity linking: broadcast alias join + MinHash-LSH candidate pairs
(≈ mainstem enrichment, /root/reference/userCode/defs_test.py:75-80)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.extract import extract_mentions
from scheduler_spark.operators.linking import link_by_alias, lsh_candidate_pairs
from scheduler_spark.synth import alias_df, synth_files


def test_alias_link_covers_all_imports_and_uris(spark):
    files = synth_files(spark, n_files=200)
    mentions = extract_mentions(files)
    linked = link_by_alias(mentions, alias_df(spark))
    n_linkable = mentions.filter(F.col("kind").isin("import", "uri")).count()
    assert linked.count() == n_linkable  # every planted mention resolves
    assert linked.filter(~F.col("entity_id").startswith("ent:")).count() == 0


def test_alias_join_is_broadcast(spark):
    files = synth_files(spark, n_files=50)
    mentions = extract_mentions(files)
    linked = link_by_alias(mentions, alias_df(spark))
    plan = linked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_lsh_links_spelling_variants_not_strangers(spark):
    values = spark.createDataFrame(
        [("alpha_worker",), ("alphaWorker",), ("bravo_worker",), ("bravoWorker",)],
        "value string",
    )
    edges = lsh_candidate_pairs(values)
    pairs = {(r.src_entity, r.dst_entity) for r in edges.collect()}
    assert ("alphaWorker", "alpha_worker") in pairs
    assert ("bravoWorker", "bravo_worker") in pairs
    for a, b in pairs:
        assert a.lower().replace("_", "") == b.lower().replace("_", "")


def test_lsh_scores_are_exact_jaccard(spark):
    values = spark.createDataFrame([("alpha_worker",), ("alphaWorker",)], "value string")
    edges = lsh_candidate_pairs(values).collect()
    assert len(edges) == 1

    def sh(s):
        s = s.lower()
        return {s[i : i + 3] for i in range(len(s) - 2)}

    a, b = sh("alpha_worker"), sh("alphaWorker")
    expected = len(a & b) / len(a | b)
    assert abs(edges[0].score - expected) < 1e-9


def test_lsh_bucket_cap_bounds_pair_blowup(spark):
    # 200 identical-profile values would make one 200-element bucket →
    # ~20k pairs; cap keeps the self-join bounded.
    values = spark.createDataFrame([(f"samesame{i}",) for i in range(200)], "value string")
    edges = lsh_candidate_pairs(values, max_bucket=16)
    assert edges.count() <= 16 * 16 * 4
