"""Bounded multi-source BFS shortest paths (operators/bfs.py)."""

from __future__ import annotations

from scheduler_spark.operators.bfs import bfs_shortest_paths


def _bfs(spark, pairs, seeds, **kw):
    edges = spark.createDataFrame(pairs, "u string, v string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        (r.src_node, r.dst_node): r.dist
        for r in bfs_shortest_paths(edges, s, **kw).collect()
    }


def test_chain_distances_and_hop_bound(spark):
    # a -- b -- c -- d -- e -- f: dist from a is the chain index,
    # truncated at max_hops
    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    got = _bfs(spark, chain, ["a"], max_hops=3)
    assert got == {("a", "b"): 1, ("a", "c"): 2, ("a", "d"): 3}


def test_shortest_not_first_listed_path(spark):
    # two routes a→d: length 3 via b,c and length 1 direct; BFS must
    # report 1 even though the long route also reaches d
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    got = _bfs(spark, edges, ["a"], max_hops=4)
    assert got[("a", "d")] == 1
    assert got == {("a", "b"): 1, ("a", "c"): 2, ("a", "d"): 1}


def test_multi_source_and_no_self_rows(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    got = _bfs(spark, edges, ["a", "x"], max_hops=4)
    # components don't bleed into each other; no (s, s) rows even
    # though the undirected cycle a→b→a exists
    assert got == {("a", "b"): 1, ("a", "c"): 2, ("x", "y"): 1}
    assert ("a", "a") not in got and ("x", "x") not in got


def test_directed_edges_not_symmetrized(spark):
    edges = [("a", "b"), ("c", "b")]
    got = _bfs(spark, edges, ["b"], max_hops=2, directed=True)
    assert got == {}  # b has no out-edges in the directed graph


def test_early_exit_before_hop_budget(spark):
    # frontier empties at hop 1; the loop must stop, not run 25 rounds
    got = _bfs(spark, [("a", "b")], ["a"], max_hops=25)
    assert got == {("a", "b"): 1}
