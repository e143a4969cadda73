"""Strongly connected components — closure-composition formulation.

SCC(u) = {v : u →* v and v →* u}.  The engine composes its semi-naive
transitive closure (operators/closure.py) with one self-join: mutual
reachability = closure ⨝ reversed closure on the swapped pair, and the
component id is the lexicographic min over mutual partners (the
connected_components canonical-min contract, so undirected CC and SCC
compose with the same downstream rewriters).

Scope, stated honestly: materializing the closure is O(Σ|reach(u)|),
which is the right trade for the KG-hierarchy graphs this engine
audits (near-DAGs with bounded reachability sets — subclass trees with
equivalence cycles, import graphs with small mutual-include knots).
For an adversarial web-scale digraph with giant reachable sets the
public alternative is forward-backward pivoting (Fleischer et al. 2000)
or coloring (Orzan 2004), whose driver-side recursion this engine
deliberately avoids; the declared contract here is bounded-closure
inputs, enforced by transitive_closure's max_rounds raise.

Directed cycles are exactly what the undirected CC operator cannot
see: a subclass loop (A ⊂ B ⊂ A — an ontology bug) or a mutual-import
knot collapses to one canonical entity here while plain CC would merge
everything weakly connected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .closure import MAX_ROUNDS, transitive_closure


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src_entity",
    dst: str = "dst_entity",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """Directed edge list → DataFrame(entity_id, scc_id): every edge
    endpoint labeled with the min id of its strongly connected
    component (its own id when nothing is mutually reachable —
    singleton SCCs included, matching connected_components' totality).
    """
    tc = transitive_closure(edges, src=src, dst=dst, max_rounds=max_rounds)
    fwd = tc.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = tc.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    mutual = fwd.join(rev, ["u", "v"]).groupBy("u").agg(F.min("v").alias("mn"))
    nodes = (
        edges.select(F.col(src).alias("n"))
        .unionByName(edges.select(F.col(dst).alias("n")))
        .distinct()
    )
    return (
        nodes.join(mutual, nodes["n"] == mutual["u"], "left")
        .select(
            F.col("n").alias("entity_id"),
            F.least(F.col("n"), F.coalesce("mn", F.col("n"))).alias("scc_id"),
        )
    )
