"""Skew handling: the mega-repo (≥50% of rows) must not serialize into
one task (FIXTURES.md F6; north_rule: salted repartition + AQE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.operators.extract import extract_mentions, with_content_sha
from scheduler_spark.synth import MEGA_REPO, synth_files


def test_corpus_is_actually_skewed(spark):
    files = synth_files(spark, n_files=2000)
    per_repo = files.groupBy("repo").count()
    mega = per_repo.filter(F.col("repo") == MEGA_REPO).first()["count"]
    total = files.count()
    assert mega / total > 0.4  # the skew fixture is real


def test_salting_bounds_partition_sizes(spark):
    files = with_content_sha(synth_files(spark, n_files=2000))
    salt = 8
    n_parts = 16

    def max_partition(df):
        return max(
            r["count"]
            for r in df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect()
        )

    unsalted_max = max_partition(files.repartition(n_parts, F.col("repo")))
    salted = files.repartition(
        n_parts, F.col("repo"), F.pmod(F.xxhash64("path"), F.lit(salt))
    )
    salted_max = max_partition(salted)
    mega_rows = files.filter(F.col("repo") == MEGA_REPO).count()

    # unsalted, the mega repo pins all its rows into one task
    assert unsalted_max >= mega_rows
    # salting splits it: no single (repo, salt) group exceeds ~mega/salt,
    # so the worst task shrinks materially (residual imbalance is plain
    # hash-bin variance, which AQE smooths at real partition counts)
    assert salted_max <= unsalted_max / 2, (salted_max, unsalted_max)
    key_sizes = (
        salted.groupBy("repo", F.pmod(F.xxhash64("path"), F.lit(salt)).alias("s"))
        .count().agg(F.max("count")).first()[0]
    )
    assert key_sizes <= 1.5 * mega_rows / salt, key_sizes


def test_per_source_concurrency_caps_fanout(spark):
    """A source declaring max_request_concurrency=1 (admission control,
    /root/reference/userCode/assetGroups/testdata/sitemap.xml:12) must
    occupy exactly one task-group key; undeclared sources keep the full
    salt fan-out."""
    from scheduler_spark.pipeline import salted_by_source
    from scheduler_spark.sources.sitemap import sources_df, source_widths

    xml = """<?xml version='1.0' encoding='utf-8'?>
    <sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
                  xmlns:geoconnex="https://geoconnex.us">
      <sitemap><geoconnex:sitemap_id>mega/monorepo</geoconnex:sitemap_id>
        <geoconnex:max_request_concurrency>1</geoconnex:max_request_concurrency>
      </sitemap>
    </sitemapindex>"""
    widths = source_widths(sources_df(spark, xml))
    assert widths.collect()[0].asDict() == {"repo": MEGA_REPO, "max_concurrency": 1}

    files = with_content_sha(synth_files(spark, n_files=2000))
    salted = salted_by_source(files, salt=8, n_parts=32, source_widths=widths)
    pids = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("repo")
        .agg(F.countDistinct("pid").alias("n_pids"))
    )
    by_repo = {r.repo: r.n_pids for r in pids.collect()}
    # capped source: all rows through ONE task-group key / partition
    assert by_repo[MEGA_REPO] == 1
    # everyone else keeps the default multi-way fan-out (mega aside,
    # org/repoN each has ~25 rows over 8 salts → usually >1 pid)
    assert max(v for k, v in by_repo.items() if k != MEGA_REPO) > 1
    # schema untouched (the width column does not leak downstream)
    assert "max_concurrency" not in salted.columns


def test_extraction_correct_under_salting(spark):
    files = with_content_sha(synth_files(spark, n_files=500))
    plain = {
        tuple(r)
        for r in extract_mentions(files).select("content_sha", "kind", "value").collect()
    }
    salted = files.repartition(16, F.col("repo"), F.pmod(F.xxhash64("path"), F.lit(8)))
    got = {
        tuple(r)
        for r in extract_mentions(salted).select("content_sha", "kind", "value").collect()
    }
    assert got == plain


def test_aqe_skew_join_splits_mega_partition(spark):
    """AQE skew-join splitting observed in an EXECUTED plan, not just
    salting: a mega-key (90% of rows — the mega-repo imbalance the
    reference's per-source concurrency knobs exist for,
    /root/reference/dagster.yaml:8-16) large-large SMJ must show
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead in the final
    adaptive plan.  Thresholds are lowered so local-scale data crosses
    the same code path production sizes would; broadcast is disabled so
    the join is a genuine shuffle join; the consumer is a GLOBAL agg —
    a downstream groupBy on the join key would forbid the split (it
    would break required co-partitioning), which is itself part of the
    semantics this test documents."""
    tuned = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(300000).select(
            F.when(F.col("id") % 10 < 9, F.lit("mega-repo"))
            .otherwise(
                F.concat(F.lit("repo-"), (F.col("id") % 100).cast("string"))
            )
            .alias("repo"),
            F.lpad(F.lit("x"), 64, "x").alias("pad"),
        )
        right = spark.range(101).select(
            F.when(F.col("id") == 0, F.lit("mega-repo"))
            .otherwise(F.concat(F.lit("repo-"), (F.col("id") - 1).cast("string")))
            .alias("repo"),
            F.lpad(F.lit("m"), 256, "m").alias("meta"),
        )
        df = left.join(right, "repo").agg(F.sum(F.length("pad")).alias("s"))
        [row] = df.collect()
        assert row["s"] == 300000 * 64  # every left row matched exactly once
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
