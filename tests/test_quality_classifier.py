"""Selection-property gates for the fastText-style quality classifier
(queries.quality_classifier_scores): the log-odds weights must actually
separate target-like documents from junk, score must be a sigmoid in
(0, 1), and featureless docs must stay total with keep=false.
Formula-exact DuckDB parity lives in the oracle gate."""

from __future__ import annotations

from scheduler_spark.queries import quality_classifier_scores


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_classifier_separates_target_from_junk(spark, tmp_path):
    # 'en' docs share distinctive bigrams; 'xx' docs use disjoint junk
    # vocabulary — the en-vs-corpus log-odds weights must rank every
    # target doc above every junk doc and keep the target class
    rows = [
        (i, "en", "the quick brown fox jumps over the lazy dog again")
        for i in range(20)
    ] + [
        (100 + i, "xx", "zzq qxz vbk wkj zzq qxz vbk wkj plm nbv")
        for i in range(20)
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in quality_classifier_scores(spark, sf_dir).collect()}
    en_scores = [out[i]["quality_score"] for i in range(20)]
    xx_scores = [out[100 + i]["quality_score"] for i in range(20)]
    assert min(en_scores) > max(xx_scores)
    assert all(out[i]["keep"] for i in range(20))
    assert not any(out[100 + i]["keep"] for i in range(20))
    assert all(0.0 < s < 1.0 for s in en_scores + xx_scores)


def test_classifier_feature_count_and_totality(spark, tmp_path):
    rows = [
        (1, "en", "alpha beta gamma delta"),  # 3 bigrams
        (2, "en", "single"),                  # <2 tokens: no features
        (3, "xx", "!!!"),                     # zero tokens
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in quality_classifier_scores(spark, sf_dir).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_feats"] == 3
    for d in (2, 3):
        assert out[d]["n_feats"] == 0
        assert out[d]["quality_score"] is None
        assert out[d]["keep"] is False
