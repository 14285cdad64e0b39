"""Connected components over a near-duplicate pair graph: the final
step of a large-scale dedup pipeline (pairs -> clusters -> one
canonical doc per cluster).

100 TB design: min-label propagation. Each round is two shuffle joins
(edges ⋈ labels, labels ⋈ neighbor-min) and converges in O(component
diameter) rounds. Near-dup components are star-like — many near-copies
of one source doc — so the diameter is tiny (~2) and the loop runs a
handful of rounds regardless of corpus size; the driver loop only
counts rounds, never rows. The edge set and each round's labels are
localCheckpoint-ed so lineage stays flat across iterations. For
adversarial long-chain graphs the upgrade is alternating large-star/
small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond"), which bounds rounds at O(log n) — same join
shapes, so it slots in here without touching callers.

The reference has no graph operator (near-dup is outside its scope,
SURVEY.md §2.10); this completes the repo's dedup family:
exact (dedup_exact) -> candidate pairs (minhash/simhash/jaccard) ->
clusters + canonical choice (here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, lbl) with lbl = the smallest vertex id in the component.
    Vertices absent from every edge keep their own id (singleton
    clusters). Deterministic: labels only ever decrease to the min."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = (
        sym.union(sym.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("lbl"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.withColumnRenamed("id", "d"), "d")
            .groupBy("s")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .withColumnRenamed("s", "id")
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") < F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
