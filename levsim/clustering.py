"""Transitive closure: distributed connected components over matched pairs.

Algorithm: iterative minimum-label propagation (the DataFrame form of
hash-to-min, cf. Kiveris et al., "Connected Components in MapReduce and
Beyond" — public).  Each round every node adopts the minimum component label
among itself and its neighbors:

    comp <- min(comp, min over edges (comp of neighbor))

implemented as two equi-joins (edges x labels) + one groupBy(min).
Convergence in O(diameter) rounds; ER duplicate clusters have tiny
diameters (the seed pair graph is near-clique), so 2-4 rounds typical.

Scale notes:
- labels are repartitioned ONCE on node id; each round's joins reuse that
  partitioning (no new exchange for the label side under AQE).
- localCheckpoint() per round truncates the lineage so the plan doesn't
  grow exponentially across iterations.
- convergence test = sum(label) stable: labels only ever decrease, so an
  unchanged sum proves a fixed point — one cheap aggregate per round, no
  extra join.
- skewed hub nodes (a label joined by millions of edges) are handled by
  AQE skew-join splitting (enabled in session defaults); the blocking
  layer's block-size cap bounds degree upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) -> (doc_id, cluster_id); singletons absent (callers
    left-join and coalesce to self if needed).  cluster_id = min node id in
    the component (deterministic, content-derived — stable across runs)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).dropDuplicates(["s", "d"])
    e = e.localCheckpoint()
    nodes = e.select(F.col("s").alias("id")).union(e.select("d")).distinct()
    labels = nodes.withColumn("comp", F.col("id"))
    labels = labels.repartition("id").localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        # neighbor labels in both directions
        m1 = e.join(labels.withColumnRenamed("id", "s"), "s").select(
            F.col("d").alias("id"), "comp"
        )
        m2 = e.join(labels.withColumnRenamed("id", "d"), "d").select(
            F.col("s").alias("id"), "comp"
        )
        new_labels = (
            labels.select("id", "comp")
            .union(m1)
            .union(m2)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        ).localCheckpoint()
        # labels only ever decrease (min-propagation), so an unchanged
        # label-multiset signature proves the fixed point; ids may be any
        # orderable type (urls, longs) -> hash-based signature
        sig = new_labels.agg(
            F.sum(F.hash("id", "comp").cast("decimal(38,0)")).alias("h1"),
            F.sum(F.xxhash64("id", "comp").cast("decimal(38,0)")).alias("h2"),
        ).collect()[0]
        labels = new_labels
        if prev_sig is not None and sig == prev_sig:
            break
        prev_sig = sig
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))


def attach_clusters(docs: DataFrame, components: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Every doc gets a cluster_id; unmatched docs become their own cluster."""
    c = components.withColumnRenamed("doc_id", id_col) if id_col != "doc_id" else components
    return (
        docs.join(c, id_col, "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    )
