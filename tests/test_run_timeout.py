"""Run timeout — the engine analog of the reference run monitor's
max_runtime_seconds (3 days, /root/reference/dagster.yaml:18-24):
a run past its wall-clock budget is cancelled CLEANLY (no table
writes) and the next run resumes idempotently from the committed
checkpoint."""

from __future__ import annotations

import pytest

from scheduler_spark.catalog import Catalog
from scheduler_spark.pipeline import (
    CHECKPOINT_TABLE,
    TRIPLES_TABLE,
    RunTimeoutError,
    run_pipeline,
)
from scheduler_spark.synth import alias_df, synth_files


def test_timed_out_run_writes_nothing_and_next_run_resumes(spark, tmp_path):
    catalog = Catalog(root=str(tmp_path), spark=spark)
    files = synth_files(spark, n_files=120)
    aliases = alias_df(spark)

    with pytest.raises(RunTimeoutError) as ei:
        run_pipeline(
            spark, files, aliases, catalog, run_id="t0", max_runtime_seconds=0.0
        )
    assert ei.value.stage == "metadata"
    # the cancelled run must leave NO committed state behind
    assert not catalog.exists(TRIPLES_TABLE)
    assert not catalog.exists(CHECKPOINT_TABLE)

    # an un-budgeted rerun processes the full corpus from scratch
    res = run_pipeline(spark, files, aliases, catalog, run_id="t1")
    assert not res.skipped and res.n_triples > 0


def test_timeout_before_materialize_leaves_previous_snapshot(spark, tmp_path):
    """Deadline checks sit BEFORE the write block: a run that times out
    at the materialize boundary must leave the triples table at the
    previous run's snapshot, and a rerun completes the work."""
    catalog = Catalog(root=str(tmp_path), spark=spark)
    aliases = alias_df(spark)
    run_pipeline(spark, synth_files(spark, n_files=80), aliases, catalog, run_id="a")
    snap_before = catalog.current_snapshot_id(TRIPLES_TABLE)
    rows_before = catalog.read(TRIPLES_TABLE).count()

    bigger = synth_files(spark, n_files=160)
    with pytest.raises(RunTimeoutError):
        # tiny non-zero budget: the metadata stage alone exceeds it, so
        # the raise happens at whichever boundary is hit first — always
        # before any write
        run_pipeline(
            spark, bigger, aliases, catalog, run_id="b", max_runtime_seconds=1e-6
        )
    assert catalog.current_snapshot_id(TRIPLES_TABLE) == snap_before
    assert catalog.read(TRIPLES_TABLE).count() == rows_before

    res = run_pipeline(spark, bigger, aliases, catalog, run_id="c")
    assert res.n_triples > 0
    assert catalog.current_snapshot_id(TRIPLES_TABLE) != snap_before


def test_generous_budget_does_not_interfere(spark, tmp_path):
    catalog = Catalog(root=str(tmp_path), spark=spark)
    res = run_pipeline(
        spark,
        synth_files(spark, n_files=80),
        alias_df(spark),
        catalog,
        run_id="ok",
        max_runtime_seconds=3600.0,
    )
    assert res.n_triples > 0 and not res.skipped


def test_cli_exit_code_4_on_timeout(spark, tmp_path):
    from scheduler_spark.__main__ import EXIT_RUN_TIMEOUT, main

    code = main(
        [
            "--input", "synth:60",
            "--catalog", str(tmp_path),
            "--run-id", "cli-t",
            "--max-runtime-seconds", "0",
        ],
        spark=spark,
    )
    assert code == EXIT_RUN_TIMEOUT


def test_timeout_after_metadata_never_half_prunes(spark, tmp_path, monkeypatch):
    """Regression: the vanished-source partition deletes are DEFERRED to
    the terminal write block, so a run that passes the metadata check
    but times out later must leave the vanished repo's partitions
    intact (no half-prune) — and the next unbudgeted run completes the
    prune."""
    import time as _time

    from scheduler_spark.pipeline import QUARANTINE_TABLE

    catalog = Catalog(root=str(tmp_path), spark=spark)
    aliases = alias_df(spark)
    files = synth_files(spark, n_files=120)
    run_pipeline(spark, files, aliases, catalog, run_id="base")
    parts = {
        r["src_partition"]
        for r in catalog.read(TRIPLES_TABLE).select("src_partition").distinct().collect()
    }
    victim = sorted(p for p in parts if p != "mega/monorepo")[0]

    # drop one repo (vanished) and dirty the rest so the run takes the
    # extraction path; clock: t0=0, metadata check at 5s (inside the
    # 10s budget), every later check far past it
    from pyspark.sql import functions as F

    changed = files.filter(F.col("repo") != victim).withColumn(
        "content", F.concat(F.col("content"), F.lit(" drift"))
    )
    ticks = iter([0.0, 5.0] + [1000.0] * 200)
    monkeypatch.setattr(_time, "monotonic", lambda: next(ticks))
    with pytest.raises(RunTimeoutError) as ei:
        run_pipeline(
            spark, changed, aliases, catalog, run_id="cut", max_runtime_seconds=10.0
        )
    monkeypatch.undo()
    assert ei.value.stage in {"plan", "link"}
    # the vanished repo's partitions must still be there — no half-prune
    left = {
        r["src_partition"]
        for r in catalog.read(TRIPLES_TABLE).select("src_partition").distinct().collect()
    }
    assert victim in left
    assert not catalog.exists(QUARANTINE_TABLE)

    res = run_pipeline(spark, changed, aliases, catalog, run_id="redo")
    assert res.n_pruned_partitions == 1
    after = {
        r["src_partition"]
        for r in catalog.read(TRIPLES_TABLE).select("src_partition").distinct().collect()
    }
    assert victim not in after
