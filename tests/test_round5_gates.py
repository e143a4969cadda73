"""Property gates for the round-5 second-batch queries (the oracle
twins pin cross-engine equality; these pin the *semantics* — bounds,
determinism, conservation — on the sf0.001 tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

import scheduler_spark.queries as Q

SF = "/root/testdata/sf0.001"


def test_int8_quant_codes_and_error_bounded(spark):
    rows = Q.embedding_int8_quant(spark, SF).collect()
    assert rows
    for r in rows:
        # 64 codes each in [-127, 127] -> sum of squares <= 64 * 127^2
        assert r["sum_q2"] <= 64 * 127 * 127
        assert abs(r["sum_q"]) <= 64 * 127
        # round-half-up quantization error is <= s/254 per element, so
        # mse <= max_d (s_d / 254)^2; embeddings are unit-ish scale
        assert 0.0 <= r["recon_mse"] < 1.0


def test_gnn_sampling_fanout_bounds_and_determinism(spark):
    out = Q.gnn_neighbor_sampling(spark, SF)
    rows = out.collect()
    h1 = {}
    h2 = {}
    for r in rows:
        if r["hop"] == 1:
            assert r["parent"] == r["seed"]
            h1[r["seed"]] = h1.get(r["seed"], 0) + 1
        else:
            # hop-2 never backtracks to the seed
            assert r["node"] != r["seed"]
            key = (r["seed"], r["parent"])
            h2[key] = h2.get(key, 0) + 1
    assert h1 and max(h1.values()) <= 3
    assert h2 and max(h2.values()) <= 2
    again = sorted(map(tuple, Q.gnn_neighbor_sampling(spark, SF).collect()))
    assert again == sorted(map(tuple, rows))


def test_shard_assignment_conserves_and_bounds(spark):
    rows = Q.shard_assignment(spark, SF).collect()
    total_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total_docs
    assert all(0 <= r["shard"] < 16 for r in rows)
    # balance ratios average to ~1 by construction (sum n_docs / (N/16))
    assert abs(sum(r["balance"] for r in rows) - 16.0) < 0.01 * 16


def test_bm25_shape_and_positivity(spark):
    rows = Q.bm25_topk(spark, SF).collect()
    terms = {r["token"] for r in rows}
    assert len(terms) == 5
    for r in rows:
        assert 1 <= r["rank"] <= 10
        assert r["bm25"] > 0  # Lucene idf ln(1 + ...) is always positive


def test_weighted_sample_is_deterministic_topk(spark):
    a = [tuple(r) for r in Q.weighted_sample_aes(spark, SF).collect()]
    b = [tuple(r) for r in Q.weighted_sample_aes(spark, SF).collect()]
    assert a == b
    assert len(a) == 200
    # keys are ln(u)/w with u in (0,1): strictly negative, sorted desc
    keys = [r[3] for r in a]
    assert all(k < 0 for k in keys)
    assert keys == sorted(keys, reverse=True)


def test_event_transition_rows_sum_to_one(spark):
    rows = Q.event_transition_matrix(spark, SF).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r["p"])
    for prev, ps in by_prev.items():
        assert abs(sum(ps) - 1.0) < 1e-4, prev


def test_effective_diameter_within_radius(spark):
    r = Q.graph_effective_diameter(spark, SF).collect()[0]
    assert r["n_pairs"] > 0
    assert 1 <= r["eff_diameter"] <= 4
