"""Connected components over a pair table — the duplicate-CLUSTER
operator a large-scale dedup pipeline needs after LSH: near-dup PAIRS
(operators.dedup.lsh_candidate_pairs, similarity.cosine_near_dups) are
edges; the unit of deduplication is the connected component (keep one
canonical doc per cluster, drop the rest). Transitivity matters: a≈b
and b≈c puts a and c in one cluster even when a≉c directly.

Algorithms (``algorithm=`` on connected_components):

* ``"hashmin"`` (default) — distributed hash-min label propagation:
  every node starts labeled with its own id; each round every node
  takes the min of its label and its neighbors' labels; converged when
  no label changes. Each round is one shuffle-join + aggregate
  (Catalyst plans it as SMJ/HHJ with partial aggregation), and lineage
  is truncated per round with localCheckpoint so the plan doesn't grow
  with iterations. Rounds needed = graph DIAMETER; near-dup graphs are
  overwhelmingly tiny cliques and short chains (diameter ≤ ~3), so 2-4
  rounds converge — the right default for dedup.
* ``"star"`` — alternating large-star/small-star contraction (Kiveris
  et al., "Connected Components in MapReduce and Beyond", public
  algorithm): large-star links every strictly-larger neighbor of u to
  min(Γ(u) ∪ {u}); small-star (on edges oriented max→min) links every
  member of Γ(u) ∪ {u} except the min to the min. Each step halves
  component "height", so convergence is O(log n) ROUNDS regardless of
  diameter — the escalation path for adversarial long-path graphs
  where hash-min would need diameter rounds (pinned by a 10k-node path
  test converging in ≤ 2·log₂ n + 4 rounds). Both produce identical
  output (equality pinned on the dedup_clusters edge set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 50,
    algorithm: str = "hashmin",
    check_every: int = 2,
) -> DataFrame:
    """edges(a, b) → (node, component) where component = MIN node id in
    the node's connected component (the canonical-doc convention).
    Isolated nodes: include a self-loop (a == b) edge for every node
    that must appear in the output — callers seed ``ids.select(id, id)``
    unioned with the pair table.

    Deterministic: pure min-propagation, no RNG, no ordering
    sensitivity. Raises after ``max_iter`` rounds without convergence
    instead of returning a wrong answer. ``algorithm="star"`` switches
    to the O(log n)-round large-star/small-star contraction (module
    docstring) for graphs whose diameter exceeds a sane round count.

    ``check_every`` batches that many propagation steps between
    convergence checks: the checkpoint + changed-count driver action
    runs once per batch instead of once per step (each unchecked step
    only deepens lineage by one join). Sound because labels only ever
    DECREASE: if the batch's LAST step changed nothing the table is a
    fixpoint, regardless of earlier steps — at worst the final batch
    runs check_every-1 no-op steps past convergence."""
    if algorithm not in ("hashmin", "star"):
        raise ValueError(f"algorithm must be hashmin|star, got {algorithm!r}")
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        # checkpoint: each round's convergence action would otherwise
        # re-execute the whole upstream edge derivation (for
        # dedup_clusters that's the LSH + Jaccard pipeline, per round)
        .localCheckpoint()
    )
    if algorithm == "star":
        return _star_components(sym, max_iter)
    # V-sized materialization: nodes feed the self-loop union AND the
    # initial labels, and must not re-run the caller's (potentially
    # expensive) edge plan — sym above is already checkpointed, so this
    # distinct reads cached blocks
    nodes = (
        sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
    )
    # guarantee a self-loop for EVERY node: min-over-neighbors then
    # includes the node's own label, so one join+aggregate IS the whole
    # propagation step — no second join to LEAST against the old table.
    # No distinct and no re-materialization: duplicate edges cannot
    # change a MIN aggregate, and both union legs read caches
    sym = sym.union(
        nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    )
    labels = nodes.select("node", F.col("node").alias("component"))
    for r in range(max_iter):
        new_labels = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("component"))
            .withColumnRenamed("src", "node")
        )
        if (r + 1) % check_every == 0 or r == max_iter - 1:
            prev = labels  # lazily checkpointed (or round-0 cache-backed)
            new_labels = new_labels.localCheckpoint()
            # LAST-step check: labels only decrease, so one unchanged
            # step certifies the fixpoint — and converging inside the
            # final batch must count as converged, so compare against
            # the previous ROUND, not the batch start (prev's lazy
            # checkpoint materializes inside this same count action)
            changed = (
                new_labels.alias("n")
                .join(prev.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels
        else:
            # lazy checkpoint: no driver action now, but lineage is
            # truncated (and blocks cached) when the batch-end count
            # materializes the chain — one action per batch total
            labels = new_labels.localCheckpoint(eager=False)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "diameter exceeds the bound; raise max_iter or pass "
        'algorithm="star" (O(log n) rounds) for adversarial graphs'
    )


def _star_components(sym: DataFrame, max_iter: int) -> DataFrame:
    """Large-star/small-star contraction over a symmetric edge set.
    Converged when a full L+S round leaves the (deduplicated) edge set
    unchanged; the fixed point is a forest of stars (node → component
    min), read back as the label table."""
    nodes = sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
    # drop self-loops: Γ(u) handles u implicitly via least(u, min(v)),
    # and (x, x) edges would survive every round as noise
    e = (
        sym.where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # --- large-star: ∀v ∈ Γ(u), v > u → (v, min(Γ(u) ∪ {u})) -----
        nbr = e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = nbr.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        e_l = (
            nbr.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            # lazy: no driver action here — e_s's count materializes it,
            # truncating lineage at the same point
            .localCheckpoint(eager=False)
        )
        # --- small-star: orient max→min; ∀v ∈ Γ(u) ∪ {u} \ {m} → (v, m)
        d = e_l.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins_s = d.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        members = d.union(mins_s.select("u", F.col("u").alias("v")))
        e_s = (
            members.join(mins_s, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        # fixed point: the star edge set reproduces itself. Sets are
        # distinct(), so equal counts + empty one-sided difference ⟺
        # equality; isEmpty short-circuits.
        if e_s.count() == e.count() and e_s.exceptAll(e).isEmpty():
            links = e_s.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            )
            return nodes.join(links, "node", "left").select(
                "node",
                F.coalesce(F.col("component"), F.col("node")).alias("component"),
            )
        e = e_s
    raise RuntimeError(
        f"star contraction did not converge in {max_iter} rounds — "
        "this exceeds the O(log n) bound; the edge table is likely "
        "growing from upstream nondeterminism"
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    a: str = "a",
    b: str = "b",
    seed_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distance over the way graph — the routing /
    reachability primitive (isochrone rings, network distance from
    seed POIs; the graph twin of the spatial kNN in operators/knn.py).

    edges(a, b) + seeds(node) → (node, hop) with hop = MINIMUM number
    of edges from any seed, for every node within max_hops.

    Distributed shape (the connected_components discipline): one
    shuffle join + anti-join per ROUND, never per node; the frontier —
    not the visited set — drives each round's join, so work per round
    is proportional to the expanding ring; lineage truncated per round
    with localCheckpoint; early exit when the frontier empties.  Rounds
    = max_hops, the caller's radius dial (an isochrone wants a small
    fixed radius, not the graph diameter)."""
    sym = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    if not directed:
        sym = sym.union(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
        )
    sym = sym.distinct().localCheckpoint()

    visited = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier, sym.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
    return visited
