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
- `localCheckpoint` once per round truncates lineage: without it the
  plan doubles per iteration and the driver OOMs planning round ~15.
- convergence is detected with a single aggregate fingerprint
  (count + commutative hash-sum of the edge set) — one job per round
  instead of two `exceptAll` anti-joins; a hash-sum collision marking a
  changed edge set as converged has probability ~2^-64 per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import ENTITIES, enforce

MAX_ITERATIONS = 25

# Below these bounds the component graph is driver-trivial: one
# collect + union-find beats ~10 Spark jobs of star iterations.  This is
# the broadcast-join analog for iterative graph work — the *distinct
# entity-pair* graph after LSH blocking is typically orders of magnitude
# smaller than the corpus, so the small path is the common case; the
# distributed loop remains the correctness path for genuinely huge
# vocabularies.  The gate is BYTE-aware, not just row-count-aware: a
# row-count threshold alone would collect 100k edges of 1 KB entity
# IRIs (~200 MB of Python strings) onto the driver; the byte budget is
# measured from the actual id lengths in the same aggregate that counts
# the edges, so the decision stays deterministic for a fixed edge set.
SMALL_GRAPH_THRESHOLD = 100_000
SMALL_GRAPH_MAX_BYTES = 32 * 1024 * 1024


def _large_star(edges: DataFrame) -> DataFrame:
    """edges(u,v) → edges'(v, m) for v > u, m = min(N(u) ∪ {u}).

    r06: no intermediate `distinct` — min-aggregates are insensitive to
    duplicate edges and the round's single `distinct` (end of
    `_small_star`) restores the deduplicated set the convergence
    fingerprint reads, so dropping the two input dedups removes two
    serial exchanges per round (measured ~0.55 s → ~0.45 s per round on
    the golden graph) without changing any round's output set."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("minv")).select(
        "u", F.least(F.col("minv"), F.col("u")).alias("m")
    )
    out = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out


def _small_star(edges: DataFrame) -> DataFrame:
    """edges pointed large→small; attach u and its small neighbors to min."""
    pointed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = pointed.groupBy("u").agg(F.min("v").alias("m"))
    attach_small = (
        pointed.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    attach_self = m.select(F.col("u"), F.col("m").alias("v"))
    return attach_small.union(attach_self).distinct()


def _driver_union_find(spark, pairs: list[tuple[str, str]]) -> DataFrame:
    """Union-find with path compression for driver-small graphs."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            # lexicographic-min root keeps parity with the star loop
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
        parent.setdefault(ru, ru)
        parent.setdefault(rv, rv)
    nodes = set()
    for u, v in pairs:
        nodes.add(u)
        nodes.add(v)
    rows = [(n, find(n)) for n in sorted(nodes)]
    return spark.createDataFrame(rows, "entity_id string, canonical_id string")


def connected_components(
    edges: DataFrame,
    src: str = "src_entity",
    dst: str = "dst_entity",
    max_iterations: int = MAX_ITERATIONS,
    small_graph_threshold: int = SMALL_GRAPH_THRESHOLD,
    small_graph_max_bytes: int = SMALL_GRAPH_MAX_BYTES,
) -> DataFrame:
    """Edge list → ENTITIES(entity_id, canonical_id).

    Every node that appears in `edges` gets a row; canonical_id is the
    lexicographic min of its component.  A node whose only edges are
    self-loops is its own singleton component (a self-match asserts the
    entity exists — it must not vanish from canonicalization).  Nodes
    absent from `edges` entirely are the caller's concern (left-join
    and coalesce to self).
    """
    def fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    # r06: checkpoint the raw edge list once — `selfers` below re-reads
    # it inside the FINAL output job, and without this the whole
    # upstream pair-generation plan (e.g. simhash banding + verify) ran
    # a second time just to find self-loops (measured ~0.7 s per run on
    # the golden corpus).
    raw = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint()
    e = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    # Nodes whose ONLY edges are self-loops: singleton components.  The
    # anti-join is over two node-distinct sets (vocabulary-bounded, far
    # smaller than the edge list), so this costs one cheap extra job —
    # and only when self-loops exist at all (the count gate below).
    selfers = raw.filter(F.col("u") == F.col("v")).select("u").distinct()
    touched = e.select("u").union(e.select(F.col("v").alias("u"))).distinct()
    singletons = (
        selfers.join(touched, "u", "left_anti")
        .select(F.col("u").alias("entity_id"), F.col("u").alias("canonical_id"))
    )

    def with_singletons(out: DataFrame) -> DataFrame:
        return enforce(out.unionByName(singletons), ENTITIES)

    # one aggregate decides the path: edge count AND estimated collect
    # size — both must fit the driver budget.  octet_length, not length:
    # character counts undercount multi-byte UTF-8 IRIs up to 4×; plus
    # ~120 B/edge for Python tuple/str object overhead on the driver.
    size_row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum((F.octet_length("u") + F.octet_length("v")).cast("long")), F.lit(0)
        ).alias("payload_bytes"),
    ).first()
    n_edges = size_row["n"]
    est_bytes = size_row["payload_bytes"] + n_edges * 120
    if n_edges == 0:
        return with_singletons(e.sparkSession.createDataFrame([], ENTITIES))
    if n_edges <= small_graph_threshold and est_bytes <= small_graph_max_bytes:
        pairs = [(r["u"], r["v"]) for r in e.collect()]
        return with_singletons(_driver_union_find(e.sparkSession, pairs))

    prev = fingerprint(e)
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = fingerprint(e)
        if cur == prev:
            break
        prev = cur
    # after convergence e is a star: (member, root); add the roots.
    labels = e.select(F.col("u").alias("entity_id"), F.col("v").alias("canonical_id"))
    roots = e.select(F.col("v").alias("entity_id")).distinct().withColumn(
        "canonical_id", F.col("entity_id")
    )
    out = labels.union(roots).distinct()
    return with_singletons(out)
