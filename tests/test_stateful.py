"""applyInPandasWithState: per-source state survives query restarts."""

from __future__ import annotations

from pyspark.sql import types as T

from scheduler_spark.streaming.stateful import run_progress_tracker

DOCS = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, DOCS).write.mode("append").parquet(path)


def _latest(spark, out_dir):
    df = spark.read.parquet(out_dir)
    rows = {}
    for r in df.collect():
        if r.source not in rows or r.batches > rows[r.source].batches:
            rows[r.source] = r
    return rows


def test_state_accumulates_across_restarts(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "progress")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [("s1", "aaaa"), ("s1", "bb"), ("s2", "c")])
    run_progress_tracker(spark, src, DOCS, out, ckpt)
    got1 = _latest(spark, out)
    assert got1["s1"].total_docs == 2 and got1["s1"].total_bytes == 6
    assert got1["s2"].total_docs == 1

    # second drain with new data: a NEW query instance restores state
    # from the checkpoint and keeps counting
    _write_batch(spark, src, [("s1", "ddd")])
    run_progress_tracker(spark, src, DOCS, out, ckpt)
    got2 = _latest(spark, out)
    assert got2["s1"].total_docs == 3
    assert got2["s1"].total_bytes == 9
    assert got2["s1"].batches == 2
