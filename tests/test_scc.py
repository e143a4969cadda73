"""Hand-computed gates for strongly connected components
(operators/scc.py).  DuckDB parity lives in the oracle gate —
kg_scc_components' closure⨝reversed-closure twin over the 15×8-cycle
chain (tools/oracle_check.py)."""

from __future__ import annotations

from scheduler_spark.operators.scc import strongly_connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_entity long, dst_entity long")


def _run(spark, pairs):
    return {
        r["entity_id"]: r["scc_id"]
        for r in strongly_connected_components(_edges(spark, pairs)).collect()
    }


def test_scc_two_cycles_one_way_bridge(spark):
    # 1↔2 and 3↔4 with a one-way bridge 2→3: undirected CC would merge
    # everything; SCC must keep the cycles apart
    out = _run(spark, [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3)])
    assert out == {1: 1, 2: 1, 3: 3, 4: 3}


def test_scc_dag_is_all_singletons(spark):
    out = _run(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert out == {1: 1, 2: 2, 3: 3, 4: 4}


def test_scc_long_cycle_collapses(spark):
    # 5-cycle plus a tail: the cycle is one SCC, the tail a singleton
    cyc = [(i, i + 1) for i in range(1, 5)] + [(5, 1), (3, 99)]
    out = _run(spark, cyc)
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 99: 99}


def test_scc_mutual_edge_via_two_paths(spark):
    # 1→2→3→1 and a chord 2→4→1: 4 is on a return path, so {1,2,3,4}
    # are ALL mutually reachable — one SCC
    out = _run(spark, [(1, 2), (2, 3), (3, 1), (2, 4), (4, 1)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}
