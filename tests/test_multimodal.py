"""Multimodal binary-column plumbing: schema, Arrow batching, quarantine."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from scheduler_spark.operators.multimodal import extract_media_features, synth_media


def test_features_schema_and_determinism(spark):
    media = synth_media(spark, n=40)
    feats = extract_media_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 40
    known = [r for r in rows.values() if r.kind in ("image", "audio", "video")]
    unknown = [r for r in rows.values() if r.kind == "hologram"]
    assert all(r.features is not None and len(r.features) == 8 for r in known)
    # unknown kind → quarantined (NULL features), not a crash
    assert unknown and all(r.features is None for r in unknown)


def test_payload_sha_matches_python(spark):
    media = synth_media(spark, n=10)
    joined = extract_media_features(media).join(media, ["media_id", "kind"])
    for r in joined.collect():
        assert r.payload_sha == hashlib.sha256(bytes(r.payload)).hexdigest()
        assert r.n_bytes == len(bytes(r.payload))


def test_feature_extraction_is_partition_stable(spark):
    m1 = synth_media(spark, n=30).repartition(1)
    m8 = synth_media(spark, n=30).repartition(8)
    f1 = {(r.media_id, tuple(r.features or ())) for r in extract_media_features(m1).collect()}
    f8 = {(r.media_id, tuple(r.features or ())) for r in extract_media_features(m8).collect()}
    assert f1 == f8
