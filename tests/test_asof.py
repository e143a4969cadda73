"""As-of join: union+window operator vs hand-checkable truth and vs a
brute-force range-join reference implementation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scheduler_spark.operators.asof import asof_join


def _left(spark):
    return spark.createDataFrame(
        [(1, "u", 10), (2, "u", 25), (3, "u", 5), (4, "v", 100), (5, "w", 7)],
        "id long, k string, t long",
    )


def _right(spark):
    return spark.createDataFrame(
        [("u", 8, 0.5), ("u", 10, 1.5), ("u", 20, 2.5), ("v", 99, 9.0)],
        "k string, t long, payload double",
    )


def test_asof_backward_inclusive_semantics(spark):
    got = {
        r.id: r.payload
        for r in asof_join(_left(spark), _right(spark), on="k", ts="t", how="inner").collect()
    }
    # id 1: t=10 matches right t=10 (inclusive); id 2: t=25 → t=20;
    # id 3: t=5 has no prior view → dropped; id 4: 100 → 99; id 5: no key
    assert got == {1: 1.5, 2: 2.5, 4: 9.0}


def test_asof_left_keeps_unmatched(spark):
    got = {
        r.id: r.payload
        for r in asof_join(_left(spark), _right(spark), on="k", ts="t", how="left").collect()
    }
    assert got == {1: 1.5, 2: 2.5, 3: None, 4: 9.0, 5: None}


def test_asof_matches_bruteforce_on_random_data(spark):
    import random

    rng = random.Random(17)
    left = spark.createDataFrame(
        [(i, f"k{rng.randrange(5)}", rng.randrange(1000)) for i in range(300)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        # unique (k, t): one right row per (key, distinct t)
        [(f"k{j % 5}", 5 * j + (j % 5), float(j)) for j in range(200)],
        "k string, t long, payload double",
    )
    fast = {
        (r.id, r.payload)
        for r in asof_join(left, right, on="k", ts="t", how="inner").collect()
    }
    # brute force: range join + max-t per left row
    l, r = left.alias("l"), right.alias("r")
    joined = l.join(r, (F.col("l.k") == F.col("r.k")) & (F.col("l.t") >= F.col("r.t")))
    from pyspark.sql import Window

    w = Window.partitionBy("l.id").orderBy(F.desc("r.t"))
    slow = {
        (row.id, row.payload)
        for row in joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("l.id").alias("id"), F.col("r.payload").alias("payload"))
        .collect()
    }
    assert fast == slow and fast


def test_asof_plan_is_single_shuffle(spark):
    """The point of the union+window encoding: ONE exchange on the key,
    no range-join row explosion."""
    plan = (
        asof_join(_left(spark), _right(spark), on="k", ts="t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_null_payload_is_not_backfilled(spark):
    """ASOF row semantics: if the matched (latest prior) right row has a
    NULL payload column, the output carries that NULL — it must NOT be
    backfilled from an older right row (per-column last() would)."""
    left = spark.createDataFrame([(1, "u", 30)], "id long, k string, t long")
    right = spark.createDataFrame(
        [("u", 10, 7.0, "old"), ("u", 20, None, "new")],
        "k string, t long, payload double, tag string",
    )
    rows = asof_join(left, right, on="k", ts="t", how="inner").collect()
    assert len(rows) == 1
    # matched row is t=20 ("new"); its NULL payload passes through
    assert rows[0].tag == "new" and rows[0].payload is None


def test_asof_inner_keeps_all_null_payload_match(spark):
    """how='inner' drops only left rows with NO prior right row; a match
    whose payload happens to be entirely NULL still counts as a match."""
    left = spark.createDataFrame(
        [(1, "u", 30), (2, "u", 3)], "id long, k string, t long"
    )
    right = spark.createDataFrame(
        [("u", 10, None)], "k string, t long, payload double"
    )
    got = {
        r.id: r.payload
        for r in asof_join(left, right, on="k", ts="t", how="inner").collect()
    }
    # id 1 matched (payload NULL as-is); id 2 has no prior row → dropped
    assert got == {1: None}


def test_asof_rejects_colliding_columns(spark):
    with pytest.raises(ValueError):
        asof_join(
            _left(spark),
            _right(spark).withColumnRenamed("payload", "id"),
            on="k", ts="t",
        )
