"""incremental_closure (operators/closure.py): TC(E) + Δ must equal a
from-scratch TC(E ∪ Δ) — the closure analog of the engine's
bytesum-skip incremental pulls."""

from __future__ import annotations

from scheduler_spark.operators.closure import incremental_closure, transitive_closure


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_entity long, dst_entity long")


def _pairs(df):
    return sorted((r["src_entity"], r["dst_entity"]) for r in df.collect())


def _check(spark, base, delta):
    c0 = transitive_closure(_edges(spark, base))
    inc = incremental_closure(c0, _edges(spark, base), _edges(spark, delta))
    full = transitive_closure(_edges(spark, base + delta))
    assert _pairs(inc) == _pairs(full)


def test_delta_bridges_two_chains(spark):
    # Δ = one bridge between two 3-chains: every cross pair must appear
    _check(spark, [(1, 2), (2, 3), (10, 11), (11, 12)], [(3, 10)])


def test_delta_creates_cycle(spark):
    # Δ closes a cycle: the closure gains all back-pairs, loop must
    # still terminate (anti-join fixpoint)
    _check(spark, [(1, 2), (2, 3), (3, 4)], [(4, 1)])


def test_delta_chains_with_delta(spark):
    # a new pair that needs TWO Δ edges with an old hop between them:
    # seed ∘ base rounds must chain through Δ, not just one Δ step
    _check(spark, [(2, 3)], [(1, 2), (3, 4)])


def test_unreachable_delta_is_cheap_and_correct(spark):
    _check(spark, [(1, 2), (2, 3)], [(50, 60)])


def test_random_graph_equivalence(spark):
    base = [(i, (i * i + 3) % 31) for i in range(31)]
    delta = [(i, (i * 7 + 5) % 31) for i in range(0, 31, 3)]
    _check(spark, base, delta)
