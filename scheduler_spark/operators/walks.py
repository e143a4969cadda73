"""Deterministic graph walks — the DeepWalk corpus-generation step.

DeepWalk / node2vec (Perozzi et al. 2014; Grover & Leskovec 2016)
train embeddings on random-walk "sentences" over the graph.  The
engine generates the walk corpus distributively and DETERMINISTICALLY:
the next hop from node ``cur`` on step ``s`` of the walk started at
``start`` is the out-neighbor at index

    (start·31 + cur·7 + s) mod outdeg(cur)

over the id-sorted neighbor list — reproducible on any cluster layout
and expressible identically in SQL (no RNG), the same determinism
discipline as stratified_sample_deterministic / corpus_mix_weights.

Scale notes:
- the ranked neighbor table (u, v, idx, deg) is computed ONCE (one
  shuffle on u: row_number + count over the same window partition) and
  reused by every step.
- each step is one equi-join of the walk frontier against the ranked
  table on the current node — L joins total for length-L walks, the
  classic frontier shape (operators/bfs.py); bucketing both sides on
  the node id makes every step shuffle-free at cluster scale.
- walks that reach a sink (no out-edges) simply stop: the inner join
  drops them, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_LENGTH = 3


def deterministic_walks(
    edges: DataFrame,
    length: int = DEFAULT_LENGTH,
    src: str = "src_entity",
    dst: str = "dst_entity",
) -> DataFrame:
    """Directed edge list (BIGINT node ids) → DataFrame(start_node,
    step, node): one row per visited node per walk, step 0..length,
    one walk per node that has at least one out-edge.  Self-loops and
    duplicate edges collapse first."""
    fwd = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    w = Window.partitionBy("u").orderBy("v")
    ranked = fwd.select(
        "u",
        "v",
        (F.row_number().over(w) - 1).alias("idx"),
        F.count(F.lit(1)).over(Window.partitionBy("u")).alias("deg"),
    ).localCheckpoint()
    frontier = fwd.select(F.col("u").alias("start")).distinct().select(
        "start", F.col("start").alias("cur"), F.lit(0).cast("long").alias("step")
    )
    levels = [frontier]
    for s in range(1, length + 1):
        nxt = (
            levels[-1]
            .join(ranked, levels[-1]["cur"] == ranked["u"])
            .filter(
                F.col("idx")
                == F.pmod(F.col("start") * 31 + F.col("u") * 7 + s, F.col("deg"))
            )
            .select("start", F.col("v").alias("cur"), F.lit(s).cast("long").alias("step"))
        )
        levels.append(nxt)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        F.col("start").alias("start_node"), "step", F.col("cur").alias("node")
    )
