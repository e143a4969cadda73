"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact; crossJoin + ranking window).
Scale path: random-hyperplane LSH — bucket vectors by the sign pattern
of `n_planes` fixed pseudo-random hyperplanes (derived deterministically
from xxhash64, no RNG state), probe only the query's bucket ± multi-probe
neighbors, rank within the candidate set.

At 10^12 scale the brute force is O(Q·N·d); the LSH variant scans only
N/2^planes per probe bucket and is embarrassingly parallel (bucket join).
Recall is tunable via n_planes/probes; exactness is NOT claimed — the
baseline exists precisely to measure recall against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine(e_a, e_b):
    dot = F.aggregate(F.zip_with(e_a, e_b, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(F.transform(e_a, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    nb = F.sqrt(F.aggregate(F.transform(e_b, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    return dot / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (qid, cid, rank, sim)."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("eq")
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("ec")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("sim", cosine(F.col("eq"), F.col("ec")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank", F.round("sim", 6).alias("sim"))
    )


def _hyperplane(dim: int, plane: int):
    """Deterministic pseudo-random unit-free hyperplane as a column
    expression: component j = xxhash64(plane, j) scaled to [-1, 1]."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(F.lit(plane), j).cast("double") / F.lit(float(2**63))
        ),
    )


def _bucket_signature(vec_col, dim: int, n_planes: int):
    """Sign pattern of the vector against n_planes hyperplanes, packed
    into a long — the LSH bucket id."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec_col, _hyperplane(dim, p), lambda x, h: x * h),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("long"), p),
        ).otherwise(F.lit(0).cast("long"))
        for p in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseXOR(b)
    return out


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probes: int = 2,
    train_sample: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse k-means quantizer → probe the
    nearest `n_probes` cells per query → exact rank inside candidates.

    The quantizer trains driver-side on a bounded sample (numpy
    Lloyd's — centroids are a tiny model, the classic broadcast
    pattern); assignment/search are pure column expressions.  At
    10^12 scale the sample stays bounded and the per-cell scan is
    N*(n_probes/n_lists) — the standard IVF cost model.
    """
    import numpy as np

    sample = np.array(
        [
            r["v"]
            for r in corpus.select(F.col(vec_col).cast("array<float>").alias("v"))
            .limit(train_sample)
            .collect()
        ],
        dtype=np.float64,
    )
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)]
    for _ in range(kmeans_iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(cents)):
            members = sample[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)

    def dist2_to(centroid: list[float], vec) -> Column:
        c = F.array(*[F.lit(float(x)) for x in centroid])
        return F.aggregate(
            F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def cell_ranks(vec, n: int):
        """Array of the n nearest centroid ids for `vec`."""
        dists = F.array(
            *[
                F.struct(dist2_to(c, vec).alias("d"), F.lit(j).alias("j"))
                for j, c in enumerate(cents.tolist())
            ]
        )
        return F.slice(
            F.transform(F.array_sort(dists), lambda s: s["j"]), 1, n
        )

    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("ec")
    ).withColumn("cell", F.element_at(cell_ranks(F.col("ec"), 1), 1))
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("eq")
    ).withColumn("cell", F.explode(cell_ranks(F.col("eq"), n_probes)))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        q.join(c, "cell")
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("sim", cosine(F.col("eq"), F.col("ec")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank", F.round("sim", 6).alias("sim"))
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane bucketing.

    Single-probe: only candidates sharing the query's bucket are
    ranked.  With n_planes=4 a uniform corpus splits ~16 ways; recall
    for near neighbors is high because near-parallel vectors agree on
    most hyperplane signs.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("eq")
    ).withColumn("bucket", _bucket_signature(F.col("eq"), dim, n_planes))
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("ec")
    ).withColumn("bucket", _bucket_signature(F.col("ec"), dim, n_planes))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        q.join(c, "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("sim", cosine(F.col("eq"), F.col("ec")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank", F.round("sim", 6).alias("sim"))
    )
