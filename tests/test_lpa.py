from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.lpa import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_entity string, dst_entity string")


def test_two_cliques_with_bridge_form_two_communities(spark):
    """Barbell graph: two 4-cliques joined by one bridge edge.  Inside a
    clique every node sees 3 votes for the clique minimum within two
    rounds; the single bridge vote can never outnumber them, so labels
    must NOT leak across the bridge."""
    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    pairs = [(x, y) for grp in (a, b) for x in grp for y in grp if x < y]
    pairs.append(("a0", "b0"))
    got = {
        r["entity_id"]: r["community"]
        for r in label_propagation(_edges(spark, pairs), iterations=4).collect()
    }
    assert all(got[n] == "a0" for n in a), got
    assert all(got[n] == "b0" for n in b), got


def test_self_loops_and_duplicate_edges_do_not_skew_votes(spark):
    """A duplicated edge must count as ONE neighbour vote (edges are
    de-duplicated after symmetrization) and self-loops must not vote at
    all — otherwise 'x' would keep its own label against its two real
    neighbours."""
    pairs = [("x", "x"), ("x", "m"), ("m", "x"), ("x", "m"), ("m", "n"), ("n", "m")]
    got = {
        r["entity_id"]: r["community"]
        for r in label_propagation(_edges(spark, pairs), iterations=3).collect()
    }
    assert set(got) == {"x", "m", "n"}
    assert set(got.values()) == {"m"}, got


def test_zero_iterations_returns_identity_labels(spark):
    got = label_propagation(
        _edges(spark, [("p", "q"), ("q", "r")]), iterations=0
    ).collect()
    assert {r["entity_id"]: r["community"] for r in got} == {
        "p": "p", "q": "q", "r": "r",
    }


def test_lpa_round_is_equi_join_no_cartesian(spark):
    """The final round is deliberately NOT checkpointed, so the
    returned plan must actually CONTAIN the round's join + window —
    guarding both against a cartesian vote count and against the test
    going vacuous on a truncated plan."""
    plan = (
        label_propagation(_edges(spark, [("p", "q"), ("q", "r")]), iterations=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" in plan, plan
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
