"""JDBC sink verified against an in-JVM embedded Derby database.

The reference loads GeoParquet into PostGIS in 100k-row chunks, asserts
the landed row count, and creates post-load indexes on (id) and
(geoconnex_sitemap) (/root/reference/userCode/assetGroups/
export_test.py:12-20, export.py:356-391).  No PostGIS exists in this
sandbox, but Spark ships Apache Derby's embedded JDBC driver, so the
engine's `write_jdbc` path — the actual Spark JDBC writer, batching,
mode semantics, and the post-load index DDL — is exercised against a
real SQL database here, closing the gap that earlier rounds declared
unavoidable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scheduler_spark.catalog import Catalog
from scheduler_spark.operators.export import (
    create_post_load_indexes,
    write_jdbc,
)
from scheduler_spark.pipeline import TRIPLES_TABLE, run_pipeline
from scheduler_spark.synth import alias_df, synth_files

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _read(spark, url: str, table: str):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .load()
    )


def test_jdbc_round_trip_counts_and_values(spark, tmp_path):
    url = _url(tmp_path, "rt")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    write_jdbc(df, url, "t_rt", mode="overwrite", driver=DERBY_DRIVER)
    back = _read(spark, url, "t_rt")
    assert back.count() == 500
    # value-exact round trip, not just count (reference asserts count;
    # we go stronger because we can)
    missing = df.join(back, ["k", "v"], "left_anti").count()
    assert missing == 0


def test_jdbc_overwrite_replaces_append_accumulates(spark, tmp_path):
    url = _url(tmp_path, "modes")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    write_jdbc(df, url, "t_m", mode="overwrite", driver=DERBY_DRIVER)
    write_jdbc(df, url, "t_m", mode="overwrite", driver=DERBY_DRIVER)
    assert _read(spark, url, "t_m").count() == 100
    write_jdbc(df, url, "t_m", mode="append", driver=DERBY_DRIVER)
    assert _read(spark, url, "t_m").count() == 200


def test_jdbc_small_batchsize_lands_every_row(spark, tmp_path):
    # batchsize far below the row count forces many executeBatch round
    # trips — the reference's chunksize=100_000 contract at miniature
    # scale (export.py:370)
    url = _url(tmp_path, "batches")
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    write_jdbc(df, url, "t_b", mode="overwrite", batchsize=7, driver=DERBY_DRIVER)
    assert _read(spark, url, "t_b").count() == 1000


def test_post_load_indexes_exist_in_catalog(spark, tmp_path):
    url = _url(tmp_path, "idx")
    df = spark.range(0, 50).select(
        F.col("id").alias("id"),
        F.concat(F.lit("s"), F.col("id") % 5).alias("sitemap"),
    )
    # Derby's default string mapping is CLOB (unindexable); pin the
    # indexed text column to VARCHAR exactly as a production load would
    write_jdbc(
        df,
        url,
        "features",
        mode="overwrite",
        driver=DERBY_DRIVER,
        createTableColumnTypes="sitemap VARCHAR(64)",
    )
    names = create_post_load_indexes(
        spark, url, "features", ["id", "sitemap"], driver=DERBY_DRIVER
    )
    assert names == ["idx_features_id", "idx_features_sitemap"]
    # Derby folds unquoted identifiers to upper case; read its catalog
    cat = (
        spark.read.format("jdbc")
        .option("url", url)
        .option(
            "dbtable",
            "(SELECT CONGLOMERATENAME FROM SYS.SYSCONGLOMERATES"
            " WHERE ISINDEX) x",
        )
        .option("driver", DERBY_DRIVER)
        .load()
    )
    landed = {r.CONGLOMERATENAME.lower() for r in cat.collect()}
    assert {"idx_features_id", "idx_features_sitemap"} <= landed


def test_pipeline_triples_load_like_reference_flow(spark, tmp_path):
    # end-to-end analog of export_test.py:12-20: pipeline output table
    # -> relational sink -> count equality
    catalog = Catalog(root=str(tmp_path / "cat"), spark=spark)
    run_pipeline(
        spark, synth_files(spark, 80), alias_df(spark), catalog, run_id="jdbc"
    )
    triples = catalog.read(TRIPLES_TABLE)
    n = triples.count()
    url = _url(tmp_path, "triples")
    write_jdbc(
        triples.select("subj", "pred", "obj"),
        url,
        "triples",
        mode="overwrite",
        driver=DERBY_DRIVER,
    )
    assert _read(spark, url, "triples").count() == n
