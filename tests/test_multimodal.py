"""Multimodal binary-column plumbing: schema, Arrow batching, quarantine."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from scheduler_spark.operators.multimodal import (
    extract_media_features,
    sample_frames,
    synth_media,
)


def test_frame_sampling_explodes_video_rows(spark):
    media = synth_media(spark, n=24)
    frames = sample_frames(media, every_n_bytes=16)
    rows = frames.collect()
    assert rows
    video_ids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in rows} == video_ids
    # payload is 72 bytes → 5 frames of ≤16 bytes, numbered from 0
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r)
    for mid, fr in per_media.items():
        nos = sorted(f.frame_no for f in fr)
        assert nos == list(range(len(nos)))
        assert sum(f.frame_bytes for f in fr) == 72


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
