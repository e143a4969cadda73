"""Triple materialization — the `release graph` analog.

The reference rolls every summoned doc of a source into one
deduplicated n-quads artifact `graphs/latest/<source>_release.nq.gz`
with a run-context 4th term (/root/reference/docs/hdt.md:3-21,
userCode/assetGroups/release_graph_generator.py:79-83).  Here the
release graph is a `triples` table partitioned by source (`repo`):

- (subj, "links_to", entity)      — alias/uri-linked imports
  (≈ the `hyf:linearElement` mainstem triples, defs_test.py:75-80)
- (subj, "defines", ident:<canon>) — CC-canonicalized identifiers
- (subj, "in_lang", lang)          — cheap structural triple

`graph` carries the run id (quad context term); `content_sha` carries
the per-row invariant end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import TRIPLES, enforce
from ..synth import subject_id


def _with_subj(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "subj", subject_id(F.col("repo"), F.col("path"), F.col("commit"))
    )


def build_triples(
    files_sha: DataFrame,
    linked: DataFrame,
    ident_mentions: DataFrame,
    ident_entities: DataFrame,
    run_id: str,
) -> DataFrame:
    """Assemble the deduplicated triples table from stage outputs.

    files_sha:      files + content_sha (for in_lang triples)
    linked:         link_by_alias output
    ident_mentions: mentions where kind='identifier'
    ident_entities: ENTITIES mapping for identifier values
    """
    graph = F.lit(f"run:{run_id}")

    links = _with_subj(linked).select(
        "subj",
        F.lit("links_to").alias("pred"),
        F.col("entity_id").alias("obj"),
        graph.alias("graph"),
        F.col("repo").alias("src_partition"),
        "content_sha",
    )

    defines = (
        _with_subj(ident_mentions)
        .join(
            ident_entities.withColumnRenamed("entity_id", "value"),
            "value",
        )
        .select(
            "subj",
            F.lit("defines").alias("pred"),
            F.concat(F.lit("ident:"), F.col("canonical_id")).alias("obj"),
            graph.alias("graph"),
            F.col("repo").alias("src_partition"),
            "content_sha",
        )
    )

    in_lang = _with_subj(files_sha).select(
        "subj",
        F.lit("in_lang").alias("pred"),
        F.col("lang").alias("obj"),
        graph.alias("graph"),
        F.col("repo").alias("src_partition"),
        "content_sha",
    )

    out = links.unionByName(defines).unionByName(in_lang).dropDuplicates(
        ["subj", "pred", "obj"]
    )
    return enforce(out, TRIPLES)
