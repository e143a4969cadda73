"""Row-level MERGE upsert on the catalog — the Iceberg ``MERGE INTO``
copy-on-write contract: matched keys update, unmatched insert, and ONLY
affected partitions are rewritten (untouched partitions keep their data
files byte-identical).  ≈ the reference's keyed re-crawl replace
(--cleanup-outdated-jsonld, /root/reference/userCode/lib/containers.py:52)."""

from __future__ import annotations

import os

import pytest

from scheduler_spark.catalog import Catalog


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, part string, payload string")


def _part_files(cat: Catalog, table: str, part: str) -> dict[str, float]:
    root = os.path.join(cat.table_path(table), f"part={part}")
    return {
        f: os.path.getmtime(os.path.join(root, f))
        for f in os.listdir(root)
        if f.endswith(".parquet")
    }


def _seed(spark, cat: Catalog) -> None:
    cat.overwrite_partitions(
        _df(
            spark,
            [
                ("k1", "A", "a1"),
                ("k2", "A", "a2"),
                ("k3", "B", "b1"),
                ("k4", "C", "c1"),
            ],
        ),
        "t",
        ["part"],
    )


def test_merge_updates_inserts_and_leaves_other_partitions_alone(spark, tmp_path):
    cat = Catalog(root=str(tmp_path), spark=spark)
    _seed(spark, cat)
    c_before = _part_files(cat, "t", "C")

    src = _df(spark, [("k1", "A", "a1-v2"), ("k9", "B", "b-new")])
    cat.merge_upsert(src, "t", ["k"], "part")

    got = {(r.k, r.part): r.payload for r in cat.read("t").collect()}
    assert got == {
        ("k1", "A"): "a1-v2",  # updated
        ("k2", "A"): "a2",  # untouched row in a rewritten partition
        ("k3", "B"): "b1",
        ("k9", "B"): "b-new",  # inserted
        ("k4", "C"): "c1",
    }
    # partition C was not part of the merge: same files, same mtimes
    assert _part_files(cat, "t", "C") == c_before

    snap = cat.snapshots("t")[-1]["properties"]
    assert snap["operation_detail"] == "merge_upsert"
    assert snap["n_updated"] == 1 and snap["n_inserted"] == 1
    assert snap["rewritten_partitions"] == ["A", "B"]


def test_merge_moves_key_across_partitions(spark, tmp_path):
    """A matched key whose partition changed is deleted from its old
    partition (the old partition holds a matched row, so CoW rewrites
    it) — no duplicate key left behind."""
    cat = Catalog(root=str(tmp_path), spark=spark)
    _seed(spark, cat)

    src = _df(spark, [("k4", "A", "moved")])
    cat.merge_upsert(src, "t", ["k"], "part")

    rows = {(r.k, r.part) for r in cat.read("t").collect()}
    assert ("k4", "A") in rows and ("k4", "C") not in rows
    assert cat.snapshots("t")[-1]["properties"]["rewritten_partitions"] == ["A", "C"]


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    cat = Catalog(root=str(tmp_path), spark=spark)
    _seed(spark, cat)
    dup = _df(spark, [("k1", "A", "x"), ("k1", "A", "y")])
    with pytest.raises(ValueError, match="cardinality"):
        cat.merge_upsert(dup, "t", ["k"], "part")


def test_merge_into_missing_table_is_insert_only(spark, tmp_path):
    cat = Catalog(root=str(tmp_path), spark=spark)
    src = _df(spark, [("k1", "A", "a"), ("k2", "B", "b")])
    cat.merge_upsert(src, "t", ["k"], "part")
    assert cat.read("t").count() == 2
    props = cat.snapshots("t")[-1]["properties"]
    assert props["n_updated"] == 0 and props["n_inserted"] == 2


def test_merge_empties_partition_with_escaped_value(spark, tmp_path):
    """Partition values Spark escapes on disk (':' → '%3A') are still
    found and dropped when the merge empties them — directory matching
    decodes names instead of re-encoding the value."""
    cat = Catalog(root=str(tmp_path), spark=spark)
    cat.overwrite_partitions(
        _df(spark, [("k1", "src:a", "x"), ("k2", "plain", "y")]), "t", ["part"]
    )
    cat.merge_upsert(_df(spark, [("k1", "plain", "moved")]), "t", ["k"], "part")
    rows = {(r.k, r.part) for r in cat.read("t").collect()}
    assert rows == {("k1", "plain"), ("k2", "plain")}


def test_merge_counts_distinct_keys_not_target_rows(spark, tmp_path):
    """A key duplicated in the TARGET still counts as one update and
    never produces a negative n_inserted."""
    cat = Catalog(root=str(tmp_path), spark=spark)
    cat.overwrite_partitions(_df(spark, [("k1", "A", "v1")]), "t", ["part"])
    # sneak in a duplicate of k1 via a second partition-dir write
    cat.overwrite_partitions(_df(spark, [("k1", "B", "v2")]), "t", ["part"])
    cat.merge_upsert(_df(spark, [("k1", "A", "v3")]), "t", ["k"], "part")
    props = cat.snapshots("t")[-1]["properties"]
    assert props["n_updated"] == 1 and props["n_inserted"] == 0
    rows = {(r.k, r.part, r.payload) for r in cat.read("t").collect()}
    assert rows == {("k1", "A", "v3")}  # MERGE collapses the target dup


def test_merge_rejects_flat_unpartitioned_target(spark, tmp_path):
    cat = Catalog(root=str(tmp_path), spark=spark)
    cat.append(_df(spark, [("k1", "A", "x")]), "t")  # flat layout
    with pytest.raises(ValueError, match="non-partitioned"):
        cat.merge_upsert(_df(spark, [("k1", "A", "y")]), "t", ["k"], "part")
