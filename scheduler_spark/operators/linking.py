"""Entity-link scoring — the mainstem-enrichment analog.

The reference enriches each harvested feature with its associated river
mainstem via a spatial lookup against a broadcast-served reference file
(/root/reference/userCode/lib/containers.py:152-157; golden pairs
asserted at /root/reference/userCode/defs_test.py:104-130).  Our analog
links code mentions to canonical entities two ways:

1. **Alias dictionary** (`link_by_alias`) — a small broadcastable
   dimension `(alias, entity_id)`; normalized mention values equi-join
   against it.  Explicit ``F.broadcast``: at 100 TB the fact side is
   huge, the dictionary is MBs — this must never shuffle the fact table.

2. **MinHash-LSH blocking** (`lsh_candidate_pairs`) — near-duplicate
   identifier spellings (snake vs camel etc.) are blocked by banded
   MinHash over lowercase char-3-gram shingles, then verified with
   *exact* Jaccard so results are deterministic (LSH only prunes the
   candidate space, it never decides membership).

Everything is built-in column expressions (shingles via ``F.transform``
over ``F.sequence``, signatures via ``F.array_min`` of per-seed
``xxhash64``) — whole-stage-codegen'd, no Python workers.

Scale notes:
- distinct() before shingling: LSH runs over unique values, not raw
  mention rows (dedup factor ~ mentions/value ≫ 1).
- band buckets are capped (`max_bucket`): a degenerate bucket (stop-word
  shingle profile) would otherwise produce O(n²) candidate pairs; the
  cap bounds the self-join per bucket, and the loss it causes is
  measurable with `operators.dedup.bucket_cap_stats` over the same
  banded frame (oracle-gated for simhash via `simhash_bucket_stats`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import EDGES, enforce

# Band shape r=1, b=16: candidate iff ANY of 16 minhashes collide.
# At the 0.4 decision threshold this gives pair-recall ≥ 1-(1-0.4)^16
# ≈ 0.9997 for true pairs while exact-Jaccard verification keeps
# precision exact; production tuning for huge vocabularies would raise
# r to cut candidate volume (recall/cost trade, SURVEY.md §7.4).
DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 16  # rows per band = num_hashes // bands
DEFAULT_JACCARD = 0.4
DEFAULT_MAX_BUCKET = 64


def normalize_mention_value(kind_col, value_col):
    """kind-aware normalization to alias-dictionary surface form.

    imports join as-is; URIs join by their terminal path segment.
    """
    return (
        F.when(kind_col == "uri", F.element_at(F.split(value_col, "/"), -1))
        .otherwise(value_col)
    )


def link_by_alias(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """mentions ⨝ broadcast(alias dict) → (content_sha…, entity_id).

    Returns mention rows + `entity_id` + `link_score`/`link_method`.
    """
    m = mentions.filter(F.col("kind").isin("import", "uri")).withColumn(
        "norm_value", normalize_mention_value(F.col("kind"), F.col("value"))
    )
    dim = F.broadcast(aliases.select(F.col("alias"), F.col("entity_id")))
    joined = m.join(dim, m["norm_value"] == dim["alias"], "inner")
    return joined.select(
        "content_sha", "repo", "path", "commit", "kind", "value",
        "entity_id",
        F.lit(1.0).alias("link_score"),
        F.lit("alias").alias("link_method"),
    )


def shingles(col, n: int = 3):
    """Distinct lowercase char n-grams, as a column expression."""
    lowered = F.lower(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(lowered) - n, F.lit(0))),
            lambda i: F.substr(lowered, i + 1, F.lit(n)),
        )
    )


def minhash_signature(shingle_col, num_hashes: int = DEFAULT_NUM_HASHES):
    """Array of `num_hashes` min-hashes of the shingle set.

    NB the lambda must be unary: F.transform passes the element index as
    a second argument when the lambda is binary, which would silently
    replace the hash seed.
    """

    def hasher(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    return F.array(
        *[F.array_min(F.transform(shingle_col, hasher(i))) for i in range(num_hashes)]
    )


def lsh_candidate_pairs(
    values: DataFrame,
    value_col: str = "value",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    jaccard_threshold: float = DEFAULT_JACCARD,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    shingle_n: int = 3,
) -> DataFrame:
    """Distinct values → verified similar pairs (EDGES schema).

    LSH bands generate candidates; exact Jaccard over shingle sets
    decides.  Deterministic for a fixed input set.
    """
    rows_per_band = num_hashes // bands
    v = (
        values.select(F.col(value_col).alias("value"))
        .filter(F.length("value") >= shingle_n)
        .distinct()
        .withColumn("sh", shingles(F.col("value"), shingle_n))
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    )
    banded = v.select(
        "value",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col("sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
                        F.lit(b),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    # cap pathological buckets (observable drop, not silent); a count
    # window is one shuffle vs two for groupBy+join-back
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    banded = (
        banded.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("bucket_n") <= max_bucket)
        .drop("bucket_n")
    )
    a = banded.select(
        F.col("band"), F.col("bucket"),
        F.col("value").alias("src_entity"), F.col("sh").alias("sh_a"),
    )
    b = banded.select(
        F.col("band"), F.col("bucket"),
        F.col("value").alias("dst_entity"), F.col("sh").alias("sh_b"),
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("src_entity") < F.col("dst_entity"))
        .select("src_entity", "dst_entity", "sh_a", "sh_b")
        .dropDuplicates(["src_entity", "dst_entity"])
    )
    scored = pairs.withColumn(
        "score",
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
    ).filter(F.col("score") >= jaccard_threshold)
    out = scored.select(
        "src_entity", "dst_entity", F.col("score").cast("double"), F.lit("lsh").alias("method")
    )
    return enforce(out, EDGES)


def delete_variants(col):
    """``{s} ∪ {s with one character deleted}`` as a distinct array.

    The symmetric-delete neighborhood (the public SymSpell / FastSS
    spelling-correction construction): two strings are at Levenshtein
    distance ≤ 1 **iff** their delete-1 neighborhoods intersect —
    a substitution at position i maps both strings to the same
    deletion, an insertion/deletion maps the longer string onto the
    shorter one itself, and equality is the identity member.  Pure
    column expressions (transform over sequence) — codegen'd, no
    Python workers.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.length(c)),
            lambda i: F.when(i == F.lit(0), c).otherwise(
                F.concat(
                    F.substr(c, F.lit(1), i - 1),
                    F.substr(c, i + 1, F.length(c)),
                )
            ),
        )
    )


def fuzzy_candidates(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """Exact candidate generation for edit-distance-≤1 linking via a
    delete-variant equi-join — the scale-safe replacement for coarse
    attribute blocking.

    Why this survives 100 TB: the join key is the variant STRING, so
    key cardinality is ≈ vocabulary × average length (millions of
    blocks, not 26), and each block is alphabet-bounded — a variant of
    length L has at most 26·(L+1) one-insertion pre-images plus itself,
    independent of corpus size.  A last-character block key by contrast
    has 26 values ⇒ O(V²/26) verify pairs on a skewed shuffle.
    Candidates are a guaranteed SUPERSET of all distance-≤1 pairs
    (exactness of the symmetric-delete construction), so the verify
    filter downstream decides membership and recall is 1.0 by
    construction — no posting cap needed, nothing shed.

    Returns distinct (left_col, right_col) candidate pairs.
    """
    lv = left.select(
        left_col, F.explode(delete_variants(left_col)).alias("vkey")
    )
    rv = right.select(
        right_col, F.explode(delete_variants(right_col)).alias("vkey")
    )
    return lv.join(rv, "vkey").select(left_col, right_col).distinct()
