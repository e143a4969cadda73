"""k-core decomposition — iterative degree peeling over the entity graph.

The reference's KG consumers rank entities by degree only (the release
rollups, /root/reference/userCode/defs_test.py:104-116 walks fixed-depth
chains); a k-core adds the standard "dense backbone" primitive: drop
every node with degree < k, repeat until fixpoint (Seidman 1983,
"Network structure and minimum degree").  Used in practice to trim
low-signal entities before expensive downstream passes (embedding,
community detection).

Scale notes:
- the graph lives as an undirected, deduplicated edge DataFrame; each
  peel round is ONE map-side-combinable degree aggregation plus two
  left-semi joins against the surviving node set — all equi-joins on
  the node id, AQE-partitionable, no driver-side adjacency.
- ``localCheckpoint`` per round truncates lineage (the CC/BFS/PageRank
  loop discipline, operators/components.py:19-28).
- one scalar action per round (the surviving-node count) detects the
  fixpoint; the loop runs O(peel-depth) rounds — bounded by the graph's
  degeneracy ordering, typically < 100 even on web graphs.
- at 1000-executor scale both join sides would be bucketed on the node
  id so every round's semi-joins are shuffle-free (the same layout
  ``catalog.write_bucketed`` proves in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 2
MAX_ROUNDS = 100


def kcore(
    edges: DataFrame,
    k: int = DEFAULT_K,
    src: str = "src_entity",
    dst: str = "dst_entity",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """Directed/undirected edge list → DataFrame(node_id, core_degree):
    the nodes of the k-core with their within-core degree.

    Self-loops are ignored; parallel/reversed duplicates collapse (the
    degree counts DISTINCT neighbors).  Deterministic: set semantics
    throughout, no floats.
    """
    fwd = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    und = (
        fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    prev_nodes = -1
    for _ in range(max_rounds):
        # und holds BOTH directions, so grouping on u sees every node
        # and count(*) is the distinct-neighbor degree
        keep = (
            und.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
            .localCheckpoint()
        )
        n = keep.count()
        if n == prev_nodes:
            # keepₜ ⊆ keepₜ₋₁ (edges only ever shrink), so equal counts
            # mean equal sets: no node dropped, degrees stable, fixpoint
            break
        prev_nodes = n
        und = (
            und.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        if n == 0:
            break
    return (
        und.groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .select(F.col("u").alias("node_id"), "core_degree")
    )
