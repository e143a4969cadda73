"""Chunked large-object ingest (sources/chunked.py) — the parallel
byte-range recast of the reference's streamed download
(/root/reference/userCode/assetGroups/config.py:52-82)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from scheduler_spark.sources.chunked import (
    chunk_progress,
    plan_chunk_ranges,
    read_chunk_ranges,
)


def _make_blob(tmp_path, n_bytes: int) -> str:
    p = tmp_path / "blob.bin"
    # deterministic non-repeating bytes so chunk mixups are detectable
    data = bytes((i * 31 + (i >> 8)) % 256 for i in range(n_bytes))
    p.write_bytes(data)
    return str(p)


def test_reassembled_chunks_are_byte_identical(spark, tmp_path):
    size = 3 * 1000 + 137  # deliberately not a multiple of the chunk size
    path = _make_blob(tmp_path, size)
    ranges = plan_chunk_ranges(spark, path, chunk_bytes=1000)
    assert ranges.count() == 4
    # final partial chunk planned with its true length
    assert ranges.agg(F.sum("length")).first()[0] == size

    chunks = read_chunk_ranges(ranges).orderBy("chunk_id").collect()
    blob = b"".join(bytes(r["data"]) for r in chunks)
    assert blob == open(path, "rb").read()
    for r in chunks:
        assert r["sha"] == hashlib.sha256(bytes(r["data"])).hexdigest()
        assert r["n_bytes"] == len(r["data"])


def test_progress_rollup_counts_all_bytes(spark, tmp_path):
    size = 10 * 512
    path = _make_blob(tmp_path, size)
    chunks = read_chunk_ranges(plan_chunk_ranges(spark, path, chunk_bytes=512))
    row = chunk_progress(chunks).first()
    assert row["n_chunks"] == 10
    assert row["bytes_transferred"] == size
    assert row["high_watermark"] == size


def test_resume_anti_join_reads_only_missing_ranges(spark, tmp_path):
    """The already-downloaded skip, recast: ranges already committed are
    anti-joined away, so a resumed transfer touches only the gap."""
    path = _make_blob(tmp_path, 8 * 256)
    ranges = plan_chunk_ranges(spark, path, chunk_bytes=256)
    done = ranges.filter(F.col("chunk_id") < 5).select("path", "chunk_id")
    todo = ranges.join(done, ["path", "chunk_id"], "left_anti")
    got = read_chunk_ranges(todo).select("chunk_id").collect()
    assert sorted(r["chunk_id"] for r in got) == [5, 6, 7]


def test_empty_object_plans_zero_ranges(spark, tmp_path):
    p = tmp_path / "empty.bin"
    p.write_bytes(b"")
    assert plan_chunk_ranges(spark, str(p)).count() == 0


def test_ranges_distribute_across_partitions(spark, tmp_path):
    """The point of the recast: the range table parallelizes, so the
    read stage has more than one task available to it."""
    path = _make_blob(tmp_path, 64 * 128)
    ranges = plan_chunk_ranges(spark, path, chunk_bytes=128)
    assert ranges.rdd.getNumPartitions() > 1
