"""Connected components over candidate match edges — the dedup/merge
core of canonicalization (≈ `nabu release`'s graph merge,
/root/reference/userCode/assetGroups/release_graph_generator.py:79-83).

Implements the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) as a pure DataFrame loop:

- large-star: for each node u, attach every strictly-larger neighbor to
  the minimum of u's closed neighborhood.
- small-star: for each node u, attach u and its ≤ neighbors to that
  minimum.

Node ids are the entity strings themselves; `min` is lexicographic, so
the final root of each component is its lexicographically-smallest
member — **deterministic under any partitioning** (SURVEY.md §7 "hard
parts": canonical ids must not depend on partition order).

Scale notes:
- converges in O(log n) rounds vs O(diameter) for naive label
  propagation — the difference between 5 and 500 shuffles on a long
  chain at 10^12 scale.
- `localCheckpoint` each round truncates lineage: without it the plan
  doubles per iteration and the driver OOMs planning round ~15.
- convergence test is `exceptAll(...).isEmpty()` on the edge set —
  a cheap semi-structured check that AQE executes as a broadcast-able
  anti-join at small deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import ENTITIES, enforce

MAX_ITERATIONS = 25


def _large_star(edges: DataFrame) -> DataFrame:
    """edges(u,v) → edges'(v, m) for v > u, m = min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    m = sym.groupBy("u").agg(F.min("v").alias("minv")).select(
        "u", F.least(F.col("minv"), F.col("u")).alias("m")
    )
    out = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    return out


def _small_star(edges: DataFrame) -> DataFrame:
    """edges pointed large→small; attach u and its small neighbors to min."""
    pointed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()
    m = pointed.groupBy("u").agg(F.min("v").alias("m"))
    attach_small = (
        pointed.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    attach_self = m.select(F.col("u"), F.col("m").alias("v"))
    return attach_small.union(attach_self).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src_entity",
    dst: str = "dst_entity",
    max_iterations: int = MAX_ITERATIONS,
) -> DataFrame:
    """Edge list → ENTITIES(entity_id, canonical_id).

    Every node that appears in `edges` gets a row; canonical_id is the
    lexicographic min of its component.  Isolated nodes are the caller's
    concern (left-join and coalesce to self).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        e1 = _large_star(e).localCheckpoint()
        e2 = _small_star(e1).localCheckpoint()
        if e2.exceptAll(e).isEmpty() and e.exceptAll(e2).isEmpty():
            e = e2
            break
        e = e2
    # after convergence e is a star: (member, root); add the roots.
    labels = e.select(F.col("u").alias("entity_id"), F.col("v").alias("canonical_id"))
    roots = e.select(F.col("v").alias("entity_id")).distinct().withColumn(
        "canonical_id", F.col("entity_id")
    )
    out = labels.union(roots).distinct()
    return enforce(out, ENTITIES)
