"""Property-based gates (hypothesis) for the iterative graph
operators: random small graphs vs exact driver-side reference
implementations.  These complement the fixed oracle gates — a
hand-picked gate graph can miss a convergence edge case that a
randomized adversary finds (long chains, parallel edges, self-loops,
disconnected islands).

Each property runs a real distributed loop per example, so examples
are capped (Spark job ≈ 0.5 s); derandomized so CI is deterministic.
"""

from __future__ import annotations

import heapq

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scheduler_spark.operators.components import connected_components
from scheduler_spark.operators.kcore import kcore
from scheduler_spark.operators.sssp import weighted_sssp
from scheduler_spark.operators.triangles import local_clustering_coefficient

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

node = st.integers(min_value=0, max_value=14)
edge_lists = st.lists(st.tuples(node, node), min_size=1, max_size=30)
weighted_edge_lists = st.lists(
    st.tuples(node, node, st.integers(min_value=0, max_value=9)),
    min_size=1,
    max_size=30,
)


def _und_adj(pairs):
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        if u == v:
            adj.setdefault(u, set())
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_cc_distributed_loop_matches_union_find(spark, pairs):
    adj = _und_adj(pairs)
    parent = {n: n for n in adj}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, vs in adj.items():
        for v in vs:
            parent[find(u)] = find(v)
    expected = {}
    for n in adj:
        expected.setdefault(find(n), []).append(n)
    # The star loop computes min in the INPUT column type (long here →
    # numeric min); only the final ENTITIES enforce casts to string.
    want = {str(n): str(min(grp)) for grp in expected.values() for n in grp}

    df = spark.createDataFrame(pairs, "src_entity long, dst_entity long")
    # threshold=0 forces the distributed large-star/small-star loop
    got = {
        r["entity_id"]: r["canonical_id"]
        for r in connected_components(df, small_graph_threshold=0).collect()
    }
    assert got == want


@given(triples=weighted_edge_lists, n_seeds=st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_sssp_matches_dijkstra(spark, triples, n_seeds):
    nodes = sorted({u for u, _, _ in triples} | {v for _, v, _ in triples})
    seeds = nodes[:n_seeds]
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in triples:
        if u != v:
            adj.setdefault(u, []).append((v, w))
    dist = {s: 0 for s in seeds}
    heap = [(0, s) for s in seeds]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))

    e = spark.createDataFrame(triples, "u long, v long, w long")
    sd = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r["node"]: r["dist"] for r in weighted_sssp(e, sd, max_rounds=40).collect()}
    assert got == dist


@given(pairs=edge_lists, k=st.integers(min_value=2, max_value=4))
@settings(**SETTINGS)
def test_kcore_matches_reference_peel(spark, pairs, k):
    adj = {n: set(vs) for n, vs in _und_adj(pairs).items()}
    changed = True
    while changed:
        drop = [n for n, vs in adj.items() if len(vs) < k]
        changed = bool(drop)
        for n in drop:
            for v in adj.pop(n):
                adj[v].discard(n)
    want = {n: len(vs) for n, vs in adj.items()}

    df = spark.createDataFrame(pairs, "src_entity long, dst_entity long")
    got = {
        r["node_id"]: r["core_degree"] for r in kcore(df, k=k, max_rounds=60).collect()
    }
    assert got == want


@given(pairs=edge_lists)
@settings(**SETTINGS)
def test_clustering_matches_brute_force(spark, pairs):
    adj = _und_adj(pairs)
    want = {}
    for n, vs in adj.items():
        d = len(vs)
        tri = 0
        vl = sorted(vs)
        for i in range(len(vl)):
            for j in range(i + 1, len(vl)):
                if vl[j] in adj[vl[i]]:
                    tri += 1
        cc = 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0
        want[n] = (d, tri, round(cc, 9))

    df = spark.createDataFrame(pairs, "src_entity long, dst_entity long")
    got = {
        r["entity_id"]: (r["degree"], r["n_triangles"], round(r["clustering"], 9))
        for r in local_clustering_coefficient(df).collect()
    }
    assert got == want
