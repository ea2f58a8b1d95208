"""Connected components over near-duplicate pair graphs + representative
selection — the "collapse near-dup clusters, keep one doc" stage of a
training-data pipeline.

A near-dup pass (ngram_jaccard_pairs / minhash_near_dups / simhash_near_dups
in operators/similarity.py) emits PAIRS; downstream consumers need CLUSTERS
(transitive closure of the pair relation) so that A~B, B~C collapses to one
kept document even when A~C was never emitted. Reference analog: the crawler
dedups per-pair only (services/deduplicator/ content-hash exact groups);
cluster collapse is part of this repo's LLM-pipeline extension.

Algorithm: iterative min-label propagation — each round every node takes the
minimum label in its closed neighborhood; converges in O(diameter) rounds.
This is the same algorithm Spark's own GraphX `connectedComponents` runs as
a Pregel loop, and the right choice for near-dup graphs, whose components
(template/boilerplate clusters) are small and dense, so diameter is tiny.
Per round: one join + one partial-aggregated groupBy = O(|E|) shuffled
bytes; `localCheckpoint` truncates lineage so the plan does not grow with
rounds. For adversarially high-diameter graphs the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) drops rounds to O(log^2 n) at the cost of a
materialized edge rewrite per round; not needed for this workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in `pairs`, where
    cluster_id is the minimum node id of the node's connected component.

    `pairs` is an undirected edge list (one row per pair, either
    orientation). Deterministic: min-id labels are orientation- and
    order-independent. Raises if the loop has not converged after
    `max_iter` rounds (diameter > max_iter — switch to large-star/small-star
    before raising the cap).
    """
    # ids pass through untouched (no cast) so the output cluster_id keeps the
    # exact input id type — the driver's oracle compare is schema-strict
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # closed neighborhood: self-loop keeps a node's own label in the min
    sym = sym.union(
        sym.select("src").distinct().select("src", F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    labels = sym.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # each node pulls min(label of closed neighborhood); groupBy
        # partial-aggregates map-side, so shuffled bytes ~ distinct nodes
        new_labels = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        # labels only ever decrease, so "any row differs" is a sound
        # fixpoint probe; limit(1) short-circuits the scan
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        prev = labels
        labels = new_labels
        prev.unpersist()
        if changed == 0:
            sym.unpersist()
            return labels.select("node", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds the cap — use large-star/small-star)"
    )


def near_dup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a near-dup pair, cluster_id =
    min doc_id of its transitive closure."""
    return connected_components(pairs, id_a, id_b).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


def dedup_keep_list(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One row per KEPT document: the cluster representative (min doc_id)
    for clustered docs, plus every singleton doc untouched by any pair.

    Anti-join of the drop set (clustered docs that are not their cluster's
    min) against the corpus — O(|clustered docs|) broadcast-able side, no
    shuffle of the corpus beyond the join itself.
    """
    drop = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return docs.join(drop, id_col, "left_anti")
