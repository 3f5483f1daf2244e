"""Transitive closure: distributed connected components over matched pairs.

Algorithm: iterative minimum-label propagation with pointer jumping (the
DataFrame form of hash-to-min + path compression, cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond" — public).  Each round every
node adopts the minimum label among itself and its neighbors:

    comp <- min(comp, min over edges (comp of neighbor))

(two equi-joins + one groupBy(min)), then labels are flattened one hop
(comp <- comp[comp], a self-join).  Propagation alone needs O(diameter)
rounds; with per-round compression convergence is O(log diameter), so even
pathological chain-shaped match graphs finish in ~log2(n) rounds.  ER
duplicate clusters are near-cliques — typically 2-3 rounds.

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

import warnings

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
    converged = False
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
        )
        # pointer jumping: comp <- label(comp) where comp is itself a node
        jump = new_labels.select(F.col("id").alias("comp"), F.col("comp").alias("comp2"))
        new_labels = (
            new_labels.join(jump, "comp", "left")
            .select("id", F.least(F.coalesce(F.col("comp2"), F.col("comp")), F.col("comp")).alias("comp"))
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
            converged = True
            break
        prev_sig = sig
    if not converged:
        # an unconverged min-propagation returns labels that may still be
        # mid-flight (a component split across labels) — surface it rather
        # than silently returning wrong clusters
        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; returned labels may split components. Raise max_iter "
            "(rounds needed ~= log2(graph diameter)).",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14 — public).

    Same contract as :func:`connected_components` (singletons absent,
    cluster_id = component-minimum node id; equality property-tested).
    Preferred at extreme scale / high-diameter graphs: both operations are
    a single groupBy over node neighborhoods and the edge set converges to
    stars rooted at the component minimum in O(log^2 n) rounds without the
    label-side state of min-propagation.

    large-star: every neighbor v > u links to min(N(u) ∪ {u})
    small-star: every neighbor v <= u (star-oriented) links to the same min
    """
    raw = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    # node set BEFORE dropping self-loops: a node seen only in (x, x) edges
    # is still its own singleton component (matches connected_components)
    nodes = raw.select(F.col("s").alias("id")).union(raw.select("d")).distinct()
    nodes = nodes.localCheckpoint()
    e0 = raw.where(F.col("s") != F.col("d")).dropDuplicates(["s", "d"]).localCheckpoint()

    def large_star(e: DataFrame) -> DataFrame:
        nbrs = e.select(F.col("s").alias("u"), F.col("d").alias("v")).union(
            e.select(F.col("d").alias("u"), F.col("s").alias("v")))
        mins = nbrs.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("mv", "u").alias("m"))
        return (
            nbrs.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("s"), F.col("m").alias("d"))
            .where(F.col("s") != F.col("d"))
            .dropDuplicates(["s", "d"])
        )

    def small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(
            F.greatest("s", "d").alias("u"), F.least("s", "d").alias("v"))
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))  # v <= u always
        linked = oriented.join(mins, "u")
        out = linked.select(F.col("v").alias("s"), F.col("m").alias("d")).union(
            linked.select(F.col("u").alias("s"), F.col("m").alias("d")))
        return out.where(F.col("s") != F.col("d")).dropDuplicates(["s", "d"])

    e = e0
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        e = small_star(large_star(e)).localCheckpoint()
        sig = e.agg(
            F.count("*").alias("n"),
            F.sum(F.hash("s", "d").cast("decimal(38,0)")).alias("h1"),
            F.sum(F.xxhash64("s", "d").cast("decimal(38,0)")).alias("h2"),
        ).collect()[0]
        if prev_sig is not None and sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # the final min-over-neighbors labeling below is only correct on a
        # converged star forest — warn instead of silently mislabeling
        warnings.warn(
            f"connected_components_star did not converge within "
            f"max_iter={max_iter} alternation rounds; returned labels may "
            "split components. Raise max_iter (O(log^2 n) rounds suffice).",
            RuntimeWarning,
            stacklevel=2,
        )
    # converged edge set is a star forest rooted at component minima: every
    # node's label = min over (self ∪ both-direction neighbors)
    pairs = (
        e.select(F.col("s").alias("id"), F.col("d").alias("comp"))
        .union(e.select(F.col("d").alias("id"), F.col("s").alias("comp")))
        .union(nodes.select("id", F.col("id").alias("comp")))
    )
    labels = pairs.groupBy("id").agg(F.min("comp").alias("comp"))
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))


def attach_clusters(docs: DataFrame, components: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Every doc gets a cluster_id; unmatched docs become their own cluster."""
    c = components.withColumnRenamed("doc_id", id_col) if id_col != "doc_id" else components
    return (
        docs.join(c, id_col, "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    )
