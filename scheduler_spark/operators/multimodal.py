"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as `binary` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
`mapInPandas` so each batch moves one Arrow buffer, not N Python
objects.  The decode step itself is STUBBED in this environment (no
imaging/audio libraries in the container) behind `_decode_stub`, which
produces deterministic fake features; the Spark-side contract — schema,
batch shape, partitioning, null-safety — is real and tested.

Production swap: replace `_decode_stub` with PIL/libsndfile/ffmpeg
calls; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_DIM = 8


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: real implementations replace this.

    Raises NotImplementedError for kinds a real decoder wouldn't know,
    mirroring how a production decode failure surfaces per-row.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest[: _FEATURE_DIM * 4], dtype=np.uint32).astype(np.float32) / np.float32(2**32)


def extract_media_features(media: DataFrame) -> DataFrame:
    """binary payloads → fixed-dim feature vectors, Arrow-batched.

    Python touches ONLY the decode step: `payload_sha` and `n_bytes`
    are JVM-side built-ins (`F.sha2` works on binary and matches
    hashlib's hex digest; `F.length` on binary is the byte count), so
    the Arrow round-trip carries just (payload, kind) → features.

    Unknown kinds yield NULL features (quarantine-not-crash, the
    reference's exit-3 tolerance).
    """

    def decode(payload: pd.Series, kind: pd.Series) -> pd.Series:
        feats = []
        for p, k in zip(payload, kind):
            try:
                feats.append(_decode_stub(bytes(p), k).tolist())
            except NotImplementedError:
                feats.append(None)
        return pd.Series(feats, dtype=object)

    features_udf = F.pandas_udf(decode, "array<float>")
    return media.select(
        "media_id",
        "kind",
        F.sha2(F.col("payload"), 256).alias("payload_sha"),
        F.length("payload").cast("long").alias("n_bytes"),
        features_udf(F.col("payload"), F.col("kind")).alias("features"),
    )


_FRAMES_SCHEMA = (
    "media_id long, frame_no int, frame_sha string, frame_bytes long"
)


def sample_frames(media: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame, Arrow-batched.  The frame *decode* is stubbed
    (payload sliced at fixed strides stands in for keyframe extraction);
    the engine-side contract — row explosion per media item, stable
    frame numbering, per-frame hashes, batch shape — is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, shas, sizes = [], [], [], []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                raw = bytes(payload)
                for frame_no, off in enumerate(range(0, len(raw), every_n_bytes)):
                    chunk = raw[off : off + every_n_bytes]
                    ids.append(media_id)
                    nos.append(frame_no)
                    shas.append(hashlib.sha256(chunk).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": nos,
                    "frame_sha": shas,
                    "frame_bytes": sizes,
                }
            )

    return media.mapInPandas(run, schema=_FRAMES_SCHEMA)


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    base = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video"), F.lit("hologram")),
        (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("payload:"), F.sha2(F.col("id").cast("string"), 256)), "utf-8"
    )
    return base.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
