"""Distributed connected components over duplicate-pair edges.

A 100 TB dedup pass does not stop at PAIRS: exact- and near-dup pairs chain
(A~B, B~C) into clusters, and the keep-list must retain one representative
per CLUSTER, not per pair — otherwise transitive duplicates survive.  The
reference has no analog (its dedup is the URL-seen set); this is a §2.10
LLM-pipeline addition, the cluster step every minhash-dedup pipeline runs
(e.g. the C4/RefinedWeb recipes).

Spark-first shape: iterative min-label propagation expressed entirely as
equi-joins + groupBy.min — the textbook BSP connected-components loop.
Per iteration each vertex adopts the minimum label in its closed
neighborhood; labels are monotonically non-increasing integers, so the
SUM(label) fixpoint test is exact and cheap.  Iterations converge in
O(graph diameter) rounds; LSH dup clusters are near-cliques (diameter ≤ 2-3
in practice), so 3-5 rounds close real corpora.  For adversarial long-chain
graphs the large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond") halves diameter per round — same join
primitives, noted here as the escalation path; the simple propagation is
kept because dup graphs are shallow and the code stays oracle-mirrorable
(DuckDB recursive-CTE transitive closure).

Every iteration localCheckpoints the label table: the loop would otherwise
stack J joins of lineage and re-execute the whole prefix each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected ``edges`` graph with the minimum
    vertex id of its connected component.

    Input: edges(src, dst) with integer vertex ids (duplicate edges fine).
    Output: (v, lbl) — one row per vertex that appears in any edge; ``lbl``
    is the component representative (min id).  Deterministic: labels are
    integer mins, independent of partitioning and iteration interleaving.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("u").alias("v"))
        .distinct()
        .withColumn("lbl", F.col("v"))
        .localCheckpoint(eager=True)
    )
    total = labels.agg(F.sum("lbl")).head()[0]
    for _ in range(max_iter):
        # min over the closed neighborhood: own label ∪ neighbors' labels
        msgs = und.join(labels.withColumnRenamed("v", "u"), "u").select("v", "lbl")
        new_labels = (
            labels.select("v", "lbl")
            .union(msgs)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        new_total = new_labels.agg(F.sum("lbl")).head()[0]
        labels = new_labels
        if new_total == total:  # monotone integer fixpoint — exact test
            break
        total = new_total
    return labels
