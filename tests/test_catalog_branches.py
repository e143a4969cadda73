"""Branch refs on the snapshot catalog — the lakeFS branch→commit→merge
contract (/root/reference/userCode/lib/lakefs.py:60-111,
lib/classes.py:267-345, assetGroups/export.py:543-554), plus the
root-relative manifest contract (catalog moves must not break
time-travel/incremental reads)."""

from __future__ import annotations

import shutil

import pytest

from scheduler_spark.catalog import Catalog


def _rows(spark, tag: str, n: int = 5):
    return spark.range(n).selectExpr("id", f"'{tag}' AS tag")


def test_branch_write_invisible_until_merge(spark, tmp_path):
    cat = Catalog(root=str(tmp_path), spark=spark)
    cat.append(_rows(spark, "main1"), "t")
    cat.create_branch("t", "release")
    cat.append_to_branch(_rows(spark, "branch1"), "t", "release")

    # main does not see the branch write
    assert cat.read("t").filter("tag = 'branch1'").count() == 0
    # the branch sees base ∪ its own appends
    br = cat.read_branch("t", "release")
    assert br.filter("tag = 'main1'").count() == 5
    assert br.filter("tag = 'branch1'").count() == 5

    cat.merge_branch_to_main("t", "release")
    assert cat.read("t").filter("tag = 'branch1'").count() == 5
    assert not cat.branch_exists("t", "release")


def test_branch_is_snapshot_isolated_from_main_appends(spark, tmp_path):
    cat = Catalog(root=str(tmp_path), spark=spark)
    cat.append(_rows(spark, "main1"), "t")
    cat.create_branch("t", "wip")
    cat.append(_rows(spark, "main2"), "t")  # after the branch point
    br = cat.read_branch("t", "wip")
    assert br.filter("tag = 'main2'").count() == 0
    assert br.filter("tag = 'main1'").count() == 5


def test_time_travel_correct_across_merge(spark, tmp_path):
    cat = Catalog(root=str(tmp_path), spark=spark)
    s1 = cat.append(_rows(spark, "main1"), "t")
    cat.create_branch("t", "release")
    cat.append_to_branch(_rows(spark, "branch1"), "t", "release")
    s2 = cat.merge_branch_to_main("t", "release")

    assert cat.read_at("t", s1).count() == 5
    assert cat.read_at("t", s2).count() == 10
    # incremental read since the pre-merge snapshot = exactly the merge
    inc = cat.read_incremental("t", s1)
    assert inc.count() == 5 and inc.filter("tag = 'branch1'").count() == 5


def test_branch_requires_create_and_unique_name(spark, tmp_path):
    cat = Catalog(root=str(tmp_path), spark=spark)
    cat.append(_rows(spark, "main1"), "t")
    with pytest.raises(ValueError):
        cat.append_to_branch(_rows(spark, "x"), "t", "nope")
    cat.create_branch("t", "b")
    with pytest.raises(ValueError):
        cat.create_branch("t", "b")


def test_manifests_survive_catalog_root_move(spark, tmp_path):
    """Manifest paths are root-relative: moving the whole catalog to a
    new directory keeps time-travel and incremental reads working."""
    old_root = tmp_path / "cat_a"
    cat = Catalog(root=str(old_root), spark=spark)
    s1 = cat.append(_rows(spark, "one"), "t")
    cat.append(_rows(spark, "two"), "t")

    new_root = tmp_path / "cat_b"
    shutil.move(str(old_root), str(new_root))
    moved = Catalog(root=str(new_root), spark=spark)
    assert moved.read_at("t", s1).count() == 5
    inc = moved.read_incremental("t", s1)
    assert inc.count() == 5 and inc.filter("tag = 'two'").count() == 5
