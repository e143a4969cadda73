"""node2vec biased walks (operators/walks.node2vec_walks) vs a
pure-Python reference simulator of the same hash-roll rule.  DuckDB
parity lives in the oracle gate (node2vec_biased_walks)."""

from __future__ import annotations

from collections import defaultdict

from scheduler_spark.operators.walks import node2vec_walks


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_entity long, dst_entity long")


def _reference_walks(pairs, length, wp, w1, wq):
    adj = defaultdict(list)
    eset = set()
    for u, v in set(pairs):
        if u != v:
            adj[u].append(v)
            eset.add((u, v))
    for u in adj:
        adj[u].sort()
    rows = []
    for start in sorted(adj):
        rows.append((start, 0, start))
        nbrs = adj[start]
        cur = nbrs[(start * 31 + start * 7 + 1) % len(nbrs)]
        prev = start
        rows.append((start, 1, cur))
        for s in range(2, length + 1):
            nbrs = adj.get(cur, [])
            if not nbrs:
                break
            wts = [
                wp if n == prev else (w1 if (prev, n) in eset else wq)
                for n in nbrs
            ]
            r = (start * 31 + cur * 7 + prev * 13 + s) % sum(wts)
            cum = 0
            for n, wt in zip(nbrs, wts):
                cum += wt
                if r < cum:
                    prev, cur = cur, n
                    break
            rows.append((start, s, cur))
    return sorted(rows)


def test_node2vec_matches_reference_simulator(spark):
    # deterministic pseudo-random digraph with triangles, sinks, and
    # reciprocal edges — all three weight classes fire
    pairs = [(i, (i * i + 3) % 23) for i in range(23)] + [
        (i, (i * 5 + 1) % 23) for i in range(0, 23, 2)
    ]
    got = sorted(
        (r["start_node"], r["step"], r["node"])
        for r in node2vec_walks(_edges(spark, pairs), length=4).collect()
    )
    assert got == _reference_walks(pairs, 4, 1, 4, 2)


def test_node2vec_hand_computed_rolls(spark):
    # every hop hand-run against the spec:
    #   walk 1: step1 uniform idx (1·31+1·7+1)%2=1 → 3; step2 from 3
    #     (prev 1): single nbr 1 is the RETURN (wp=1), tot=1, r=0 → 1
    #   walk 2: step1 idx (2·31+2·7+1)%2=1 → 3; step2 from 3 (prev 2):
    #     nbr 1 is distance-1 (edge 2→1 exists, w1=4), r=111%4=3 → 1
    #   walk 3: step1 → 1; step2 from 1 (prev 3): nbr 2 explore (wq=2),
    #     nbr 3 return (wp=1), cum=[2,3], r=141%3=0 → 2 (explore wins)
    pairs = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)]
    out = {
        (r["start_node"], r["step"]): r["node"]
        for r in node2vec_walks(_edges(spark, pairs), length=2).collect()
    }
    assert out == {
        (1, 0): 1, (1, 1): 3, (1, 2): 1,
        (2, 0): 2, (2, 1): 3, (2, 2): 1,
        (3, 0): 3, (3, 1): 1, (3, 2): 2,
    }
