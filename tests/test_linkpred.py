from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.linkpred import predict_links


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_entity string, dst_entity string")


def test_jaccard_scores_and_observed_exclusion(spark):
    """Square a-b-c-d-a: the two diagonals (a,c) and (b,d) are the only
    non-adjacent pairs; each shares both its neighbors ⇒ jaccard
    2/(2+2-2) = 1.0.  Observed edges must never appear."""
    got = predict_links(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]), k=10
    ).collect()
    pairs = {(r["entity_a"], r["entity_b"]): r for r in got}
    assert set(pairs) == {("a", "c"), ("b", "d")}
    for r in got:
        assert r["common_neighbors"] == 2
        assert r["jaccard_score"] == 1.0


def test_hub_cap_drops_only_hub_centered_wedges(spark):
    """A degree-5 hub h plus an off-hub square: capping
    max_wedge_degree below 5 removes every pair whose ONLY shared
    neighbor is h, while predictions witnessed by low-degree centers
    survive."""
    hub = [("h", x) for x in ["p", "q", "r", "s", "t"]]
    square = [("p", "m"), ("m", "q")]  # p-m-q: m is a cheap center
    uncapped = predict_links(_edges(spark, hub + square), k=100)
    capped = predict_links(_edges(spark, hub + square), k=100, max_wedge_degree=4)
    up = {(r["entity_a"], r["entity_b"]) for r in uncapped.collect()}
    cp = {(r["entity_a"], r["entity_b"]) for r in capped.collect()}
    # hub-only pairs like (r, s) vanish under the cap
    assert ("r", "s") in up and ("r", "s") not in cp
    # (p, q) is witnessed by both h and m; it must survive via m
    assert ("p", "q") in up and ("p", "q") in cp
    assert cp < up


def test_wedge_join_is_equi_join(spark):
    plan = (
        predict_links(_edges(spark, [("a", "b"), ("b", "c")]), k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
