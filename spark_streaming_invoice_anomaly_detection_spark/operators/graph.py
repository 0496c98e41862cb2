"""Connected components over near-duplicate pairs.

Pairwise near-dup detection (operators/dedup.py) emits EDGES; an actual
dedup pass needs GROUPS — "keep one doc per component of the similarity
graph". Transitivity is what pairs can't express: if A~B and B~C, then
A, B, C must collapse to one canonical doc even though (A, C) was never a
candidate pair.

The iteration is min-label propagation: every node starts as its own
component, then repeatedly adopts the smallest label among itself and its
neighbors. It converges in O(graph diameter) rounds — and near-dup
similarity graphs are short: clusters are stars/cliques around a source
doc (diameter ≤ ~3), not long chains. For adversarial long-chain graphs at
100 TB the published upgrade is the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) which converges in O(log n) rounds with the same
join-shape per round; the per-round dataflow below (edges ⋈ labels →
min-agg → join-back) is deliberately that same shape.

Scale notes: state per round is one (node, comp) table partitioned by
node. Propagation is FRONTIER-driven (the delta-iteration shape of
Flink's iterate-delta and Pregel's vote-to-halt): only labels that
changed last round send messages, so round k's edge join touches
|edges incident to the frontier|, not |edges|. Labels only decrease,
and every decrease is re-sent, so each node has always seen the current
label of every neighbor — the fixpoint is identical to full
re-propagation. After round 1 the frontier collapses to the few nodes
still converging, AQE sees the runtime size of the checkpointed
frontier and broadcasts it, and the per-round cost drops from
O(|edges|) shuffled to O(frontier-incident edges). Lineage is cut
every round with localCheckpoint so the plan doesn't grow with the
iteration count (a driver-loop requirement Catalyst can't see past).
This is one of the two driver-loop iterative ops in the engine (with the
ML k-sweep) — everything row-scale stays distributed; the driver only
sees the single boolean "did any label change".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = smallest
    node id reachable through the pair graph.

    ``pairs`` is consumed as an undirected edge list (both orientations are
    added here). Raises if the propagation hasn't converged after
    ``max_iter`` rounds — near-dup graphs converge in a handful.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    # Round 1's frontier is every node (everyone announces its own label);
    # afterwards only nodes whose label just dropped re-announce. Any
    # neighbor that did NOT change this round already announced its
    # current label in an earlier round, so skipping it loses nothing.
    frontier = labels
    for _ in range(max_iter):
        nbr_min = (
            edges.join(frontier, edges.v == frontier.node)
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # The convergence flag is FUSED into the propagation projection:
        # detecting "did any label change" is then a predicate scan of the
        # frame we just checkpointed anyway, not (as a naive loop writes
        # it) a second old-vs-new join — one fewer shuffle per round.
        new_comp = F.least(
            F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                new_comp.alias("comp"),
                (new_comp < F.col("comp")).alias("changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter("changed").limit(1).count()
        # Both views are filters over the frame just checkpointed — no
        # recomputation, and the frontier's runtime row count is visible
        # to AQE for the next round's join-strategy choice.
        frontier = new_labels.filter("changed").drop("changed")
        labels = new_labels.drop("changed")
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_canonical(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(doc_id, canonical_id, is_kept): every doc mapped to its component
    minimum (docs without any near-dup edge are their own canonical).
    The downstream dedup filter is just ``is_kept``."""
    comp = connected_components(pairs, src, dst)
    return (
        all_ids.select(F.col(id_col))
        .join(comp, all_ids[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("canonical_id"),
        )
        .withColumn("is_kept", F.col(id_col) == F.col("canonical_id"))
    )


__all__ = ["connected_components", "dedup_canonical"]
