"""Structured Streaming ingest: AvailableNow drain + exactly-once resume
(streaming twin of the fingerprint anti-join; §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.schema import FILES
from scheduler_spark.streaming.ingest import run_available_now, windowed_source_counts
from scheduler_spark.synth import synth_files


def test_available_now_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "files_src")
    out = str(tmp_path / "mentions_out")
    ckpt = str(tmp_path / "ckpt")

    synth_files(spark, n_files=50).write.mode("append").parquet(src)
    run_available_now(spark, src, FILES, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # drain again with no new data → nothing appended
    run_available_now(spark, src, FILES, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # new batch lands → only the delta is processed
    synth_files(spark, n_files=80).filter(
        F.xxhash64("path") % 2 == 0
    ).write.mode("append").parquet(src)
    run_available_now(spark, src, FILES, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate content arriving in-stream is emitted once; the dedup
    key is the end-to-end content_sha invariant."""
    from pyspark.sql import types as T

    from scheduler_spark.streaming.ingest import run_dedup_ingest

    schema = T.StructType(
        FILES.fields + [T.StructField("ingest_ts", T.TimestampType(), False)]
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base = synth_files(spark, n_files=30).withColumn(
        "ingest_ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    dupes = base.limit(10).withColumn(
        "ingest_ts", F.lit("2024-01-01 00:05:00").cast("timestamp")
    )
    base.unionByName(dupes).write.mode("append").parquet(src)

    run_dedup_ingest(spark, src, schema, out, ckpt)
    got = spark.read.parquet(out)
    # 40 input rows, 10 in-horizon duplicates dropped
    assert got.count() == 30
    assert got.select("content_sha").distinct().count() == 30


def test_windowed_counts_batch_semantics(spark):
    rows = [
        ("2024-01-01 00:10:00", "click"),
        ("2024-01-01 00:20:00", "click"),
        ("2024-01-01 01:10:00", "click"),
        ("2024-01-01 00:30:00", "view"),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (str(r.window_start), r.event_type): r.n
        for r in windowed_source_counts(df).collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == 2
    assert got[("2024-01-01 01:00:00", "click")] == 1
    assert got[("2024-01-01 00:00:00", "view")] == 1


def test_streamed_ingest_shares_catalog_snapshots(spark, tmp_path):
    """foreachBatch → catalog.append: each AvailableNow drain commits
    one snapshot, and read_incremental over the streamed table returns
    exactly the second drain's rows — streamed and batch writes share
    the same versioned-store semantics."""
    from pyspark.sql import types as T

    from scheduler_spark.catalog import Catalog
    from scheduler_spark.streaming.ingest import run_dedup_ingest_to_catalog

    schema = T.StructType(
        FILES.fields + [T.StructField("ingest_ts", T.TimestampType(), False)]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    catalog = Catalog(root=str(tmp_path / "cat"), spark=spark)

    synth_files(spark, n_files=20).withColumn(
        "ingest_ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    ).write.mode("append").parquet(src)
    run_dedup_ingest_to_catalog(spark, src, schema, catalog, "ingested", ckpt)
    snaps1 = catalog.snapshots("ingested")
    assert len(snaps1) == 1 and snaps1[0]["operation"] == "append"
    n1 = catalog.read("ingested").count()
    assert n1 == 20

    # second drain: new files only → one more snapshot, delta-readable
    synth_files(spark, n_files=40).filter(F.xxhash64("path") % 3 == 0).withColumn(
        "ingest_ts", F.lit("2024-01-02 00:00:00").cast("timestamp")
    ).write.mode("append").parquet(src)
    run_dedup_ingest_to_catalog(spark, src, schema, catalog, "ingested", ckpt)
    snaps2 = catalog.snapshots("ingested")
    assert len(snaps2) == 2
    inc = catalog.read_incremental("ingested", snaps1[-1]["snapshot_id"])
    assert inc.count() == catalog.read("ingested").count() - n1
    assert inc.filter(F.col("ingest_ts") == "2024-01-01 00:00:00").count() == 0


def test_stream_stream_interval_join(spark, tmp_path):
    """Clicks join the view they follow within 30 min; a click outside
    the delay window and a keyless click produce no rows — driven as a
    real two-stream query (AvailableNow drain)."""
    from pyspark.sql import types as T

    from scheduler_spark.streaming.ingest import run_interval_join

    views_schema = T.StructType(
        [
            T.StructField("ad", T.StringType(), False),
            T.StructField("lts", T.TimestampType(), False),
        ]
    )
    clicks_schema = T.StructType(
        [
            T.StructField("ad", T.StringType(), False),
            T.StructField("rts", T.TimestampType(), False),
        ]
    )
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 00:00:00")],
        "ad string, lts string",
    ).withColumn("lts", F.col("lts").cast("timestamp")).write.parquet(vdir)
    spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00"),  # in-window -> match
            ("b", "2024-01-01 01:10:00"),  # past max_delay -> dropped
            ("c", "2024-01-01 00:05:00"),  # no view -> dropped
        ],
        "ad string, rts string",
    ).withColumn("rts", F.col("rts").cast("timestamp")).write.parquet(cdir)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_interval_join(
        spark, vdir, views_schema, cdir, clicks_schema, out, ckpt, key="ad"
    )
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0]["ad"] == "a"


def test_session_window_batch_semantics(spark):
    from scheduler_spark.streaming.ingest import session_window_counts

    rows = [
        # user 1: two bursts separated by > 30 min
        ("2024-01-01 00:00:00", 1),
        ("2024-01-01 00:10:00", 1),
        ("2024-01-01 01:00:00", 1),
        # user 2: one event
        ("2024-01-01 00:05:00", 2),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in session_window_counts(df).collect()
    }
    # session end = last event + gap
    assert got[(1, "2024-01-01 00:00:00")] == ("2024-01-01 00:40:00", 2)
    assert got[(1, "2024-01-01 01:00:00")] == ("2024-01-01 01:30:00", 1)
    assert got[(2, "2024-01-01 00:05:00")] == ("2024-01-01 00:35:00", 1)


def test_session_window_streaming_drain(spark, tmp_path):
    """AvailableNow drive: watermark-closed sessions land in the sink;
    the session split/merge decisions match the batch twin."""
    from pyspark.sql import types as T

    from scheduler_spark.streaming.ingest import run_session_counts, session_window_counts

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.LongType(), False),
        ]
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = [
        ("2024-01-01 00:00:00", 1),
        ("2024-01-01 00:10:00", 1),
        ("2024-01-01 01:00:00", 1),
        ("2024-01-01 00:05:00", 2),
        # a late-horizon event pushes the watermark far enough that all
        # the sessions above are provably closed and emitted
        ("2024-01-02 00:00:00", 99),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df.write.mode("append").parquet(src)
    run_session_counts(spark, src, schema, out, ckpt)
    got = spark.read.parquet(out)
    batch = session_window_counts(df.filter(F.col("user_id") != 99))
    emitted = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in got.collect()
    }
    expected = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in batch.collect()
    }
    assert emitted == expected


def test_restart_from_checkpoint_recovers_exactly_once(spark, tmp_path):
    """Kill the streaming query mid-drain and restart from the same
    checkpointLocation: the production drain must resume from committed
    offsets, not reprocess committed batches, and the restored
    dropDuplicatesWithinWatermark state must still drop a duplicate
    whose first copy was committed BEFORE the crash.

    Shape: three source files drained one-per-batch
    (maxFilesPerTrigger=1); the sink raises on batch 1 before touching
    the catalog (crash after batch 0's offsets committed).  Restart uses
    the real run_dedup_ingest_to_catalog entry point."""
    import os
    import time

    import pytest
    from pyspark.sql import types as T

    from scheduler_spark.catalog import Catalog
    from scheduler_spark.streaming.ingest import (
        dedup_stream,
        run_dedup_ingest_to_catalog,
        stream_files,
    )

    schema = T.StructType(
        FILES.fields + [T.StructField("ingest_ts", T.TimestampType(), False)]
    )
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    catalog = Catalog(root=str(tmp_path / "cat"), spark=spark)

    def rows(tag, n, ts, dup_content=None):
        out = [
            (f"org/{tag}", f"src/{tag}{i}.py", f"c{tag}{i}", "python",
             f"content-{tag}-{i}", ts)
            for i in range(n)
        ]
        if dup_content is not None:
            out.append(
                (f"org/{tag}", f"src/{tag}dup.py", f"c{tag}d", "python",
                 dup_content, ts)
            )
        return out

    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    batches = [
        rows("a", 5, t0, dup_content="shared-payload"),
        rows("b", 5, t0 + datetime.timedelta(minutes=1)),
        # same payload again, within the 1 h watermark horizon — must be
        # dropped by state RESTORED from the checkpoint after restart
        rows("c", 5, t0 + datetime.timedelta(minutes=2),
             dup_content="shared-payload"),
    ]
    pinned: set[str] = set()
    for i, batch in enumerate(batches):
        # the file source does not recurse: append part files directly
        # into src, one data file per batch; pin mtimes to fix the order
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stamp = time.time() + i * 10
        for name in os.listdir(src):
            if name.endswith(".parquet") and name not in pinned:
                os.utime(os.path.join(src, name), (stamp, stamp))
                pinned.add(name)

    # -- crash run: same stream shape as production, sink dies on batch 1
    stream = dedup_stream(
        stream_files(spark, str(src), schema, max_files_per_trigger=1)
    )

    def crashing_sink(batch_df, batch_id: int) -> None:
        if batch_id >= 1:
            raise RuntimeError("injected crash before append")
        if not batch_df.isEmpty():
            catalog.append(batch_df, "ingested",
                           properties={"stream_batch_id": batch_id})

    q = (
        stream.writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()

    committed = catalog.read("ingested")
    assert committed.count() == 6  # batch 0 only: 5 + its dup row
    snaps_before = len(catalog.snapshots("ingested"))
    assert snaps_before == 1

    # -- restart with the PRODUCTION entry point and the same checkpoint
    run_dedup_ingest_to_catalog(
        spark, str(src), schema, catalog, "ingested", ckpt
    )

    final = catalog.read("ingested")
    # exactly-once: batch 0 not reprocessed, batches 1-2 each once
    assert final.count() == 16  # 6 + 5 + 5 (second shared-payload dropped)
    shas = final.select("content_sha").collect()
    assert len({r["content_sha"] for r in shas}) == len(shas)
    # the post-crash duplicate was dropped by RESTORED dedup state
    assert final.filter(F.col("path") == "src/cdup.py").count() == 0
    assert final.filter(F.col("path") == "src/adup.py").count() == 1
    # one snapshot per committed non-empty batch
    assert len(catalog.snapshots("ingested")) >= snaps_before + 1
    # a second drain with no new input appends nothing
    run_dedup_ingest_to_catalog(
        spark, str(src), schema, catalog, "ingested", ckpt
    )
    assert catalog.read("ingested").count() == 16
