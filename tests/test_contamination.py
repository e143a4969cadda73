"""Contamination audit: the gram-equi-join scale path must return
EXACTLY the pair-intersect contract (a pair shares ≥1 gram iff the
exploded join emits ≥1 row for it), plus crafted-edge coverage.
DuckDB parity for the shipped query lives in the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.corpus import char_grams, contamination_gram_hits
from scheduler_spark.queries import _contamination_base, _contamination_pairwise


def _rows(df):
    return {(r["eval_doc_id"], r["n_train_hits"]) for r in df.collect()}


def test_gram_join_equals_pairwise_at_sf001(spark):
    base = _contamination_base(spark, "/root/testdata/sf0.01").localCheckpoint()
    assert _rows(contamination_gram_hits(base)) == _rows(_contamination_pairwise(base))


def test_gram_join_crafted_exact(spark):
    shared = "S" * 20  # one exact 20-gram shared eval<->train
    rows = [
        # doc_id, source, is_eval, text
        (1, "a", True, "eval doc " + shared + " tail"),
        (2, "a", False, "train doc " + shared + " other"),
        (3, "a", False, "unrelated train text with no overlap at all"),
        (4, "b", True, "eval doc " + shared + " tail"),  # same gram, other source
        (5, "a", True, "short"),  # < 20 chars: single truncated gram, no match
    ]
    base = spark.createDataFrame(
        rows, "doc_id long, source string, is_eval boolean, text string"
    ).select("doc_id", "source", "is_eval", char_grams("text", 20).alias("s"))
    got = _rows(contamination_gram_hits(base))
    # doc 1 hits exactly doc 2; doc 4 is blocked by source; doc 5 no hits
    assert got == {(1, 1)}
    assert _rows(_contamination_pairwise(base)) == got


def test_gram_join_scale_path_runs_at_sf01(spark):
    """Smoke the scale shape at sf0.1 (the pairwise yardstick is too
    expensive there by design): deterministic, bounded output."""
    base = _contamination_base(spark, "/root/testdata/sf0.1")
    out = contamination_gram_hits(base)
    n = out.count()
    assert 0 < n <= 100
    # top row is stable across re-execution (deterministic ordering)
    assert out.first() == contamination_gram_hits(base).first()


def test_gram_join_plan_is_equi_join_on_gram(spark):
    base = _contamination_base(spark, "/root/testdata/sf0.01")
    df = contamination_gram_hits(base)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "gram" in plan  # join key is the exploded gram, not source alone
