"""Hand-computed gates for the round-3 quality suite and KG linking ops:
quality_gopher_rules / repetition_collapse / pii_redaction /
entity_fuzzy_match run against CRAFTED parquet tables (exact expected
values), and the pagerank operator is pinned on analytic graphs.
DuckDB parity for all five lives in the oracle gate
(tools/oracle_check.py)."""

from __future__ import annotations

import pytest

from scheduler_spark import queries as Q
from scheduler_spark.operators.pagerank import pagerank


def _docs_dir(spark, tmp_path, texts):
    rows = [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_quality_gopher_rules_exact(spark, tmp_path):
    keeper = " ".join(
        ["alpha beta gamma delta epsil zeta eta theta iota kappa"] * 6
    )  # 60 tokens, 10 distinct, top fraction 0.1
    sf = _docs_dir(spark, tmp_path, ["aa bb aa cc", keeper])
    out = {r["doc_id"]: r.asDict() for r in Q.quality_gopher_rules(spark, sf).collect()}
    r0 = out[0]
    assert r0["n_tok"] == 4
    assert r0["distinct_ratio"] == 0.75
    assert r0["top_tok_frac"] == 0.5
    assert r0["mean_word_len"] == 2.0
    assert r0["dup_2gram_frac"] == 0.0
    assert r0["keep"] is False  # too short
    r1 = out[1]
    assert r1["n_tok"] == 60
    assert r1["top_tok_frac"] == round(6 / 60, 6)
    assert r1["distinct_ratio"] == round(10 / 60, 6)
    assert r1["keep"] is True


def test_quality_rules_empty_doc_safe(spark, tmp_path):
    sf = _docs_dir(spark, tmp_path, ["", "1234 99"])
    rows = {r["doc_id"]: r.asDict() for r in Q.quality_gopher_rules(spark, sf).collect()}
    for r in rows.values():  # no tokens at all — every metric defined, keep False
        assert r["n_tok"] == 0
        assert r["distinct_ratio"] == 0.0
        assert r["dup_2gram_frac"] == 0.0
        assert r["keep"] is False


def test_repetition_collapse_exact(spark, tmp_path):
    sf = _docs_dir(spark, tmp_path, ["aa aa bb", "xx xx xx xx", "ab cd"])
    out = {r["doc_id"]: r.asDict() for r in Q.repetition_collapse(spark, sf).collect()}
    assert (out[0]["n_tok"], out[0]["n_after"]) == (3, 2)
    assert out[0]["collapsed_frac"] == round(1 / 3, 6)
    assert (out[1]["n_tok"], out[1]["n_after"]) == (4, 1)
    assert (out[2]["n_tok"], out[2]["n_after"]) == (2, 2)


def test_pii_redaction_exact(spark, tmp_path):
    spark.createDataFrame(
        [(7, "Customer#000000007")], "c_custkey long, c_name string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    row = Q.pii_redaction(spark, str(tmp_path)).collect()[0]
    assert row["n_emails"] == 1 and row["n_phones"] == 1
    assert row["redacted"] == "reach Customer#000000007 at <EMAIL> or <PHONE>"


def test_entity_fuzzy_match_exact(spark, tmp_path):
    sf = _docs_dir(spark, tmp_path, ["spark park lark"])
    got = {
        (r["mention"], r["entity"], r["dist"])
        for r in Q.entity_fuzzy_match(spark, sf).collect()
    }
    assert got == {
        ("park", "spark", 1),
        ("park", "park", 0),
        ("park", "lark", 1),
        ("ark", "park", 1),
        ("ark", "lark", 1),
    }


def test_delete_variants_exact(spark):
    from scheduler_spark.operators.linking import delete_variants

    import pyspark.sql.functions as F

    row = (
        spark.createDataFrame([("abc",), ("a",)], "s string")
        .select("s", delete_variants(F.col("s")).alias("v"))
        .collect()
    )
    got = {r["s"]: set(r["v"]) for r in row}
    assert got["abc"] == {"abc", "bc", "ac", "ab"}
    assert got["a"] == {"a", ""}


def test_fuzzy_candidates_complete_for_mid_substitution(spark, tmp_path):
    """The case ANY q-gram/suffix blocking misses: a length-3 mention
    vs a length-3 entity differing by a MIDDLE substitution ('abc' vs
    'axc') shares no character bigram, but the symmetric-delete
    neighborhoods intersect at 'ac' — the pair must be found, with
    results identical to the declarative last-char/band/lev contract."""
    sf = _docs_dir(spark, tmp_path, ["xabc axc"])
    got = {
        (r["mention"], r["entity"], r["dist"])
        for r in Q.entity_fuzzy_match(spark, sf).collect()
    }
    assert got == {("abc", "axc", 1), ("abc", "xabc", 1)}


def test_fuzzy_candidates_superset_of_brute_force(spark, tmp_path):
    """Symmetric-delete candidate generation must be a superset of all
    distance-≤1 pairs (exactness of the construction) on a vocabulary
    exercising equality, substitution, insertion, and deletion."""
    from pyspark.sql import functions as F

    from scheduler_spark.operators.linking import fuzzy_candidates

    words = ["park", "spark", "lark", "pork", "parks", "ark", "axc", "abc", "ab"]
    left = spark.createDataFrame([(w,) for w in words], "mention string")
    right = spark.createDataFrame([(w,) for w in words], "entity string")
    cand = {
        (r["mention"], r["entity"])
        for r in fuzzy_candidates(left, right, "mention", "entity").collect()
    }
    truth = {
        (r["mention"], r["entity"])
        for r in left.crossJoin(right)
        .filter(F.levenshtein("mention", "entity") <= 1)
        .collect()
    }
    assert truth <= cand


# ---------------------------------------------------------------------------
# pagerank operator
# ---------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_entity string, dst_entity string")


def test_pagerank_symmetric_cycle(spark):
    pr = {
        r["entity_id"]: r["rank"]
        for r in pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iterations=5).collect()
    }
    assert pr["a"] == pytest.approx(0.5, abs=1e-12)
    assert pr["b"] == pytest.approx(0.5, abs=1e-12)


def test_pagerank_dangling_mass_conserved(spark):
    # b has no out-edges: without dangling redistribution Σrank decays.
    rows = pagerank(_edges(spark, [("a", "b"), ("c", "b")]), iterations=15).collect()
    ranks = {r["entity_id"]: r["rank"] for r in rows}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert ranks["b"] > ranks["a"]  # sink collects link mass
    assert ranks["a"] == pytest.approx(ranks["c"], abs=1e-12)  # symmetric sources


def test_pagerank_deterministic_and_self_loop_free(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "a")])
    r1 = sorted((r["entity_id"], r["rank"]) for r in pagerank(e, iterations=8).collect())
    r2 = sorted((r["entity_id"], r["rank"]) for r in pagerank(e, iterations=8).collect())
    assert r1 == r2
    # self-loop dropped → pure 3-cycle → uniform stationary distribution
    for _, v in r1:
        assert v == pytest.approx(1 / 3, abs=1e-9)


def test_pagerank_self_loop_only_node_gets_rank_row(spark):
    # 'a' appears only in a self-loop: it must still get a rank row
    # (as a dangling node), and total mass stays 1.
    rows = pagerank(_edges(spark, [("a", "a"), ("b", "c")]), iterations=5).collect()
    ranks = {r["entity_id"]: r["rank"] for r in rows}
    assert set(ranks) == {"a", "b", "c"}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_edges(spark):
    out = pagerank(_edges(spark, []), iterations=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["entity_id", "rank"]
