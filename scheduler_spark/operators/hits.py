"""HITS hubs & authorities — link-analysis twin to operators/pagerank.py.

Kleinberg 1999 ("Authoritative sources in a hyperlinked environment"):
    auth(v) = Σ_{u→v} hub(u)        then L1-normalize
    hub(u)  = Σ_{u→v} auth(v)       then L1-normalize
per iteration, starting from hub ≡ 1.  The reference ranks entities by
raw degree only (release rollups); HITS separates "pages that point at
good things" from "things pointed at" — the natural KG companion score
for the harvested link graph (same edge shape the PageRank gate uses).

Scale notes:
- identical loop discipline to pagerank/components: every step is an
  equi-join (edges ⨝ score vector on the node id) plus a
  map-side-combinable sum; ``localCheckpoint`` per half-iteration
  truncates lineage.
- normalization is ONE scalar aggregate per half-iteration (the L1
  mass), not a per-node broadcast; L1 is used instead of the paper's
  L2 so the SQL oracle twin is a plain SUM.
- bucketing both sides on the node id makes the per-iteration joins
  shuffle-free at cluster scale (tests/test_plans.py proves the layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ITERATIONS = 2


def hits(
    edges: DataFrame,
    src: str = "src_entity",
    dst: str = "dst_entity",
    iterations: int = DEFAULT_ITERATIONS,
) -> DataFrame:
    """Directed edge list → DataFrame(entity_id, hub_score, auth_score).

    Self-loops ignored, duplicate edges collapsed; every endpoint gets a
    row (zero scores if it never receives mass).  Deterministic up to
    float summation order — hash-comparing callers should round (the
    oracle gate rounds to 6 dp).

    Degenerate zero-mass graphs (every edge a self-loop, or no edges at
    all): an iteration whose total mass is <= 0 skips normalization and
    keeps the scores UNNORMALIZED — here that means all-zero auth/hub
    columns, never NULL and never a divide-by-zero.  A SQL twin that
    divides by SUM(score) unconditionally diverges on that input class
    (NULL from 0/0); the oracle gate's graph has off-diagonal edges so
    both agree there, but callers porting the SQL elsewhere should wrap
    the divisor in NULLIF + COALESCE to match this zero-mass contract.
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        raw.select(F.col("u").alias("n"))
        .union(raw.select(F.col("v").alias("n")))
        .distinct()
        .localCheckpoint()
    )
    e = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()

    def _normalize(scores: DataFrame, col: str) -> DataFrame:
        mass = scores.agg(F.sum(col)).first()[0] or 0.0
        if mass <= 0.0:
            return scores.localCheckpoint()
        return scores.select(
            "n", (F.col(col) / F.lit(mass)).alias(col)
        ).localCheckpoint()

    hubs = nodes.select("n", F.lit(1.0).alias("hub"))
    auths = nodes.select("n", F.lit(0.0).alias("auth"))
    for _ in range(iterations):
        auth_mass = (
            e.join(hubs, e["u"] == hubs["n"])
            .groupBy(F.col("v").alias("m"))
            .agg(F.sum("hub").alias("s"))
        )
        auths = _normalize(
            nodes.join(auth_mass, nodes["n"] == auth_mass["m"], "left").select(
                "n", F.coalesce(F.col("s"), F.lit(0.0)).alias("auth")
            ),
            "auth",
        )
        hub_mass = (
            e.join(auths, e["v"] == auths["n"])
            .groupBy(F.col("u").alias("m"))
            .agg(F.sum("auth").alias("s"))
        )
        hubs = _normalize(
            nodes.join(hub_mass, nodes["n"] == hub_mass["m"], "left").select(
                "n", F.coalesce(F.col("s"), F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
    return (
        nodes.join(hubs, "n")
        .join(auths, "n")
        .select(
            F.col("n").alias("entity_id"),
            F.col("hub").alias("hub_score"),
            F.col("auth").alias("auth_score"),
        )
    )
