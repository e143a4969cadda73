"""Connected components: large-star/small-star DataFrame loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.canonicalize import canonicalize_values, pick_representative
from scheduler_spark.operators.components import connected_components


import pytest


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, "src_entity string, dst_entity string")
    return {
        r.entity_id: r.canonical_id
        for r in connected_components(edges, **kw).collect()
    }


# threshold=0 forces the distributed large-star/small-star loop;
# the default exercises the driver union-find fast path — both paths
# must produce identical labelings.
@pytest.mark.parametrize("kw", [{}, {"small_graph_threshold": 0}], ids=["driver", "distributed"])
def test_two_components(spark, kw):
    got = _cc(spark, [("b", "a"), ("c", "b"), ("y", "z")], **kw)
    assert got == {"a": "a", "b": "a", "c": "a", "y": "y", "z": "y"}


@pytest.mark.parametrize("kw", [{}, {"small_graph_threshold": 0}], ids=["driver", "distributed"])
def test_long_chain_converges(spark, kw):
    # a chain of 40 nodes exercises the O(log n) star contraction
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(40)]
    got = _cc(spark, chain, **kw)
    assert set(got.values()) == {"n00"}
    assert len(got) == 41


def test_driver_and_distributed_paths_agree(spark):
    import random

    rng = random.Random(3)
    pairs = [
        (f"v{rng.randrange(200):03d}", f"v{rng.randrange(200):03d}")
        for _ in range(300)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    fast = _cc(spark, pairs)
    dist = _cc(spark, pairs, small_graph_threshold=0)
    assert fast == dist


def test_result_partition_order_independent(spark):
    pairs = [("b", "a"), ("c", "b"), ("d", "c"), ("y", "z")]
    e1 = spark.createDataFrame(pairs, "src_entity string, dst_entity string").repartition(1)
    e8 = spark.createDataFrame(list(reversed(pairs)), "src_entity string, dst_entity string").repartition(8)
    r1 = {
        (r.entity_id, r.canonical_id)
        for r in connected_components(e1, small_graph_threshold=0).collect()
    }
    r8 = {
        (r.entity_id, r.canonical_id)
        for r in connected_components(e8, small_graph_threshold=0).collect()
    }
    assert r1 == r8


def test_distributed_path_at_scale_matches_union_find(spark):
    """150k distributed-generated edges through the star loop — the one
    iterative algorithm, exercised at 500× the toy sizes and compared
    against driver union-find on the identical edge set."""
    from pyspark.sql import functions as F

    edges = spark.range(150_000).select(
        F.concat(F.lit("n"), F.pmod(F.xxhash64("id", F.lit("u")), F.lit(30_000)).cast("string")).alias("src_entity"),
        F.concat(F.lit("n"), F.pmod(F.xxhash64("id", F.lit("v")), F.lit(30_000)).cast("string")).alias("dst_entity"),
    ).filter(F.col("src_entity") != F.col("dst_entity"))
    dist = {
        r.entity_id: r.canonical_id
        for r in connected_components(edges, small_graph_threshold=0).collect()
    }
    fast = {
        r.entity_id: r.canonical_id
        for r in connected_components(edges).collect()  # driver union-find
    }
    assert dist == fast
    assert len(dist) >= 29_000  # nearly every node appears


def test_byte_budget_forces_distributed_path(spark):
    """Long entity ids exceed the byte budget even at a tiny edge count:
    the distributed loop must kick in and agree with union-find."""
    long_ = "x" * 2000
    pairs = [(f"{long_}{i:02d}", f"{long_}{i + 1:02d}") for i in range(20)]
    edges = spark.createDataFrame(pairs, "src_entity string, dst_entity string")
    # 20 edges × ~4 KB ids ≈ 80 KB > the 10 KB budget → star loop
    dist = {
        r.entity_id: r.canonical_id
        for r in connected_components(edges, small_graph_max_bytes=10_000).collect()
    }
    fast = _cc(spark, pairs)  # default budget → driver union-find
    assert dist == fast
    assert set(dist.values()) == {f"{long_}00"}


def test_canonicalize_includes_singletons(spark):
    values = spark.createDataFrame([("a",), ("b",), ("solo",)], "value string")
    edges = spark.createDataFrame([("b", "a")], "src_entity string, dst_entity string")
    got = {r.entity_id: r.canonical_id for r in canonicalize_values(values, edges).collect()}
    assert got == {"a": "a", "b": "a", "solo": "solo"}


def test_pick_representative_by_frequency_then_lex(spark):
    mentions = spark.createDataFrame(
        [("x",), ("x",), ("y",), ("p",), ("q",)], "value string"
    )
    entities = spark.createDataFrame(
        [("x", "x"), ("y", "x"), ("p", "p"), ("q", "p")],
        "entity_id string, canonical_id string",
    )
    reps = {r.canonical_id: r.representative for r in pick_representative(mentions, entities).collect()}
    assert reps["x"] == "x"  # 2 mentions beats 1
    assert reps["p"] == "p"  # tie → lexicographic
