"""Training-corpus preparation — the composed LLM-data pipeline.

The KG pipeline (pipeline.run_pipeline) is the reference's sync job;
this is its training-data sibling, composing the individually
oracle-gated stages into one catalog-committed run:

    docs ──quality filter (Gopher rules, shuffle-free)──▶ kept
         ──exact dedup (normalized sha256, keep min id)──▶ uniques
         ──MinHash-LSH pairs ─▶ connected components ─▶ near-dup keepers
         ──deterministic hash split (train/val)
         ──contiguous-fill sequence packing (per split+source)
         ──▶ catalog table + per-stage counters (lineage)

Every stage is the same code path its oracle/pytest gate verifies
(functions/text.quality_metrics, dedup.minhash_lsh_pairs,
components.connected_components) — the composition adds selection and
bookkeeping, not new math.

Scale shape: quality + fingerprint are pure maps; exact dedup is one
shuffle on the fingerprint; LSH is the banded equi-join; CC runs over
the near-dup pair graph (orders of magnitude smaller than the corpus);
split is a hash expression; packing is one window shuffle on
(split, source).  Nothing rescans text after the single metric pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    normalized_fingerprint,
    quality_keep,
    quality_metrics,
    word_tokens,
)
from .components import connected_components
from .dedup import minhash_lsh_pairs

CORPUS_TABLE = "training_corpus"


@dataclass
class CorpusResult:
    run_id: str
    n_input: int
    n_quality_rejected: int
    n_exact_dups: int
    n_near_dups: int
    n_train: int
    n_val: int
    snapshot_id: int


def _keepers_after_near_dup(pairs: DataFrame) -> DataFrame:
    """Near-dup pair graph → (doc_id, keeper_doc_id); the NUMERIC min id
    per component is the keeper.  connected_components canonicalizes by
    LEXICOGRAPHIC min of the string ids, so ids are zero-padded to a
    fixed width first ("09" < "10" where "10" < "9") — without the pad
    a component spanning a digit-length boundary keeps the wrong doc."""
    pad = lambda c: F.lpad(F.col(c).cast("string"), 20, "0")  # noqa: E731
    ents = connected_components(
        pairs.select(
            pad("doc_a").alias("src_entity"), pad("doc_b").alias("dst_entity")
        )
    )
    return ents.select(
        F.col("entity_id").cast("long").alias("doc_id"),
        F.col("canonical_id").cast("long").alias("keeper_doc_id"),
    )


def prepare_training_corpus(
    docs: DataFrame,
    catalog,
    run_id: str,
    near_dup_threshold: float = 0.7,
    train_pct: int = 90,
    pack_tokens: int = 512,
) -> CorpusResult:
    """docs(doc_id, text, source) → committed training_corpus table
    (doc_id, source, split, pack_id, n_tok) + stage counters.

    Counter arithmetic is auditable:
    n_input = rejected + exact_dups + near_dups + n_train + n_val.
    """
    metrics = quality_metrics(F.col("toks"))
    tagged = docs.select(
        "doc_id", "source", "text", word_tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        "source",
        "text",
        *[expr.alias(name) for name, expr in metrics.items()],
    ).withColumn(
        "keep",
        quality_keep(
            F.col("n_tok"),
            F.col("top_tok_frac"),
            F.col("distinct_ratio"),
            F.col("mean_word_len"),
        ),
    )
    # materialized once (memory+disk): the metric pass runs a single
    # time and every later stage/counter reuses it; text is only read
    # downstream by the fingerprint and LSH shingling stages
    tagged = tagged.localCheckpoint()
    n_input = tagged.count()
    kept = tagged.filter(F.col("keep"))
    n_kept = kept.count()
    n_quality_rejected = n_input - n_kept

    # exact dedup: keep the min doc_id per normalized fingerprint
    fp = kept.withColumn("fingerprint", normalized_fingerprint(F.col("text")))
    w_fp = Window.partitionBy("fingerprint")
    uniques = (
        fp.withColumn("_min_id", F.min("doc_id").over(w_fp))
        .filter(F.col("doc_id") == F.col("_min_id"))
        .drop("_min_id", "fingerprint")
    )
    n_exact_dups = n_kept - uniques.count()

    # near-dup: LSH pairs over the survivors, CC, keep component minima
    pairs = minhash_lsh_pairs(
        uniques, id_col="doc_id", text_col="text", threshold=near_dup_threshold
    )
    keepers = _keepers_after_near_dup(pairs)
    final = (
        uniques.join(keepers, "doc_id", "left")
        .filter(
            F.col("keeper_doc_id").isNull()
            | (F.col("keeper_doc_id") == F.col("doc_id"))
        )
        .drop("keeper_doc_id")
    )
    n_near_dups = uniques.count() - final.count()

    # same multiplicative-hash carve the train_val_split oracle pins
    # (pre-mod keeps the product inside BIGINT for any doc_id)
    split = F.when(
        F.pmod(F.pmod("doc_id", F.lit(9999991)) * F.lit(2654435761), F.lit(100))
        < train_pct,
        "train",
    ).otherwise("val")
    w_pack = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        final.withColumn("split", split)
        .select(
            "doc_id",
            "source",
            "split",
            F.floor(
                F.coalesce(F.sum("n_tok").over(w_pack), F.lit(0)) / pack_tokens
            ).cast("long").alias("pack_id"),
            "n_tok",
        )
        .localCheckpoint()
    )
    n_train = out.filter(F.col("split") == "train").count()
    n_val = out.filter(F.col("split") == "val").count()

    snapshot_id = catalog.append(
        out,
        CORPUS_TABLE,
        properties={
            "run_id": run_id,
            "n_input": n_input,
            "n_quality_rejected": n_quality_rejected,
            "n_exact_dups": n_exact_dups,
            "n_near_dups": n_near_dups,
            "n_train": n_train,
            "n_val": n_val,
        },
    )
    return CorpusResult(
        run_id=run_id,
        n_input=n_input,
        n_quality_rejected=n_quality_rejected,
        n_exact_dups=n_exact_dups,
        n_near_dups=n_near_dups,
        n_train=n_train,
        n_val=n_val,
        snapshot_id=snapshot_id,
    )


def char_grams(text_col, n: int = 20):
    """Distinct overlapping character n-grams as a column expression
    (the contamination unit: a shared n-gram means verbatim overlap).
    Short texts yield their whole (padded-by-truncation) prefix once."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(c) - n, F.lit(0))),
            lambda i: F.substr(c, i + 1, F.lit(n)),
        )
    )


def contamination_gram_hits(
    base: DataFrame,
    gram_col: str = "s",
    limit: int = 100,
) -> DataFrame:
    """Train/eval contamination audit, the 100 TB shape: explode the
    distinct grams and equi-join eval grams to train grams on
    (source, gram), instead of carrying full gram ARRAYS of every doc
    pair through a per-source join and intersecting per pair.

    `base` must carry (doc_id, source, is_eval, <gram_col>=array<string>).

    Why this scales where the pair-intersect does not: the join key is
    the literal gram — cardinality ≈ corpus bytes, so the shuffle is
    wide but flat, and a source with E eval + T train docs costs
    Σ_gram |eval postings|·|train postings| instead of E·T full-array
    intersections.  Hot boilerplate grams are exactly the skewed-key
    case AQE skew-join splitting handles (tests/test_skew.py); a
    deterministic posting cap (dedup.winnow_copy_pairs pattern) can
    shed them when boilerplate dominates, at the cost of deviating
    from the exact contract.

    Exact equivalence to the pair-intersect contract: a pair shares
    ≥1 gram iff the exploded join emits ≥1 row for it, and the final
    count_distinct(train_doc_id) collapses multiplicity — pinned by
    tests/test_contamination.py at sf0.01 and by the unchanged
    contamination_check oracle row.
    """
    ev = base.filter(F.col("is_eval")).select(
        F.col("doc_id").alias("eval_doc_id"),
        "source",
        F.explode(gram_col).alias("gram"),
    )
    tr = base.filter(~F.col("is_eval")).select(
        F.col("doc_id").alias("train_doc_id"),
        "source",
        F.explode(gram_col).alias("gram"),
    )
    hits = ev.join(tr, ["source", "gram"])
    return (
        hits.groupBy("eval_doc_id")
        .agg(F.countDistinct("train_doc_id").cast("long").alias("n_train_hits"))
        .orderBy(F.desc("n_train_hits"), "eval_doc_id")
        .limit(limit)
    )
