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
rounds. For adversarially high-diameter graphs (URL redirect/mirror chains,
pathological template drift) `connected_components_star` implements the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14): O(log^2 n) rounds regardless
of diameter, at the cost of a materialized edge rewrite per round. Same
output contract; pick via `near_dup_clusters(..., algorithm="star")`.
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


def _canon_edges(e: DataFrame) -> DataFrame:
    """Distinct undirected edges in canonical (hi, lo) orientation, no
    self-loops. `e` has columns (u, v) of any orderable type."""
    return (
        e.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. SoCC'14 §3): every node u links each
    strictly-LARGER neighbor to m = min(N(u) ∪ {u}). Needs the symmetric
    view so both endpoints act as the center."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    # v > u >= m, so (v, m) is already (hi, lo) and never a self-loop
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node u links each neighbor <= u (and itself)
    to m = min of those neighbors. On the canonical (hi, lo) orientation the
    lo side IS the <=-neighborhood, so no symmetric expansion is needed."""
    mins = e.groupBy("u").agg(F.min("v").alias("mn"))  # mn < u by canon
    nbrs_plus_self = e.select("u", "v").union(
        e.select("u", F.col("u").alias("v"))
    )
    # every emitted (x, mn) has x > mn (mn is the strict minimum), canonical
    return (
        nbrs_plus_self.join(mins, "u")
        .filter(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14).

    Same output contract as `connected_components`: (node, cluster_id) with
    cluster_id = min node id of the component, ids passed through untouched.
    Converges in O(log^2 n) rounds REGARDLESS of component diameter — the
    10^10-scale choice when the pair graph may contain long chains (URL
    redirect/mirror chains), where min-label propagation needs O(diameter)
    rounds. Each round is two groupBy-min + join passes over the shrinking
    edge set; `localCheckpoint` truncates lineage per round. Fixpoint is an
    exact edge-set equality probe (both `exceptAll` directions, each
    short-circuited by limit(1))."""
    edges = _canon_edges(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    ).localCheckpoint(eager=True)
    nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .union(pairs.select(F.col(id_b).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _labels(final_edges: DataFrame) -> DataFrame:
        # at the fixpoint every edge is (leaf, root); roots appear only on
        # the lo side, so the self-label union covers them (and isolated
        # nodes never occur — every node of `pairs` is in some edge)
        return (
            final_edges.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
            .union(nodes.select("node", F.col("node").alias("lbl")))
            .groupBy("node")
            .agg(F.min("lbl").alias("cluster_id"))
        )

    for _ in range(max_iter):
        after = _small_star(
            _large_star(edges).localCheckpoint(eager=True)
        ).localCheckpoint(eager=True)
        changed = (
            after.exceptAll(edges).limit(1).count()
            or edges.exceptAll(after).limit(1).count()
        )
        prev = edges
        edges = after
        prev.unpersist()
        if changed == 0:
            out = _labels(edges)
            return out.select("node", "cluster_id")
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds "
        "(expected O(log^2 n) — check for non-deterministic ids)"
    )


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    algorithm: str = "propagation",
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a near-dup pair, cluster_id =
    min doc_id of its transitive closure. `algorithm`: "propagation"
    (min-label, O(diameter) rounds — right for small dense template
    clusters) or "star" (large-star/small-star, O(log^2 n) rounds — right
    when long chains are possible)."""
    impl = {
        "propagation": connected_components,
        "star": connected_components_star,
    }[algorithm]
    return impl(pairs, id_a, id_b).select(
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
