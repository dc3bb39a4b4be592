"""Connected components over a pair table — the duplicate-CLUSTER
operator a large-scale dedup pipeline needs after LSH: near-dup PAIRS
(operators.dedup.lsh_candidate_pairs, similarity.cosine_near_dups) are
edges; the unit of deduplication is the connected component (keep one
canonical doc per cluster, drop the rest). Transitivity matters: a≈b
and b≈c puts a and c in one cluster even when a≉c directly.

Algorithm: distributed hash-min label propagation — every node starts
labeled with its own id; each round every node takes the min of its
label and its neighbors' labels; converged when no label changes. Each
round is one shuffle-join + aggregate (Catalyst plans it as SMJ/HHJ with
partial aggregation), and lineage is truncated per round with
localCheckpoint so the plan doesn't grow with iterations. Rounds needed
= graph diameter; near-dup graphs are overwhelmingly tiny cliques and
short chains (diameter ≤ ~3), so 2-4 rounds converge. For adversarial
long-path graphs the known O(log n)-round refinement is large-star/
small-star (Kiveris et al., "Connected Components in MapReduce and
Beyond") — same join primitives, noted here as the escalation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """edges(a, b) → (node, component) where component = MIN node id in
    the node's connected component (the canonical-doc convention).
    Isolated nodes: include a self-loop (a == b) edge for every node
    that must appear in the output — callers seed ``ids.select(id, id)``
    unioned with the pair table.

    Deterministic: pure min-propagation, no RNG, no ordering
    sensitivity. Raises after ``max_iter`` rounds without convergence
    (pathological diameter) instead of returning a wrong answer."""
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        # checkpoint: each round's convergence action would otherwise
        # re-execute the whole upstream edge derivation (for
        # dedup_clusters that's the LSH + Jaccard pipeline, per round)
        .localCheckpoint()
    )
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        # min neighbor label per node (self-loops make this include the
        # node's own label, so LEAST with the current label is implied)
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "diameter exceeds the bound; raise max_iter or use a "
        "star-contraction variant for adversarial graphs"
    )
