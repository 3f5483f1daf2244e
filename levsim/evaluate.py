"""Pairwise F1 evaluation against labeled pairs (BASELINE.json metric:
"pairwise F1 >= 0.99 on labeled pairs at fixed blocking key").

All set algebra is done with joins (inner = TP, left_anti = FP/FN) — no
collect of pair sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def truth_pairs_from_entities(docs: DataFrame, id_col: str = "url",
                              entity_col: str = "entity_id") -> DataFrame:
    """Ground-truth positive pairs: all intra-entity pairs (id_a < id_b)."""
    a = docs.select(F.col(entity_col).alias("e"), F.col(id_col).alias("id_a"))
    b = docs.select(F.col(entity_col).alias("e"), F.col(id_col).alias("id_b"))
    return a.join(b, "e").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")


def pairs_from_clusters(clustered: DataFrame, id_col: str = "url",
                        cluster_col: str = "cluster_id") -> DataFrame:
    """Predicted positive pairs implied by the clustering."""
    a = clustered.select(F.col(cluster_col).alias("c"), F.col(id_col).alias("id_a"))
    b = clustered.select(F.col(cluster_col).alias("c"), F.col(id_col).alias("id_b"))
    return a.join(b, "c").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")


def pair_f1(predicted: DataFrame, truth: DataFrame) -> dict:
    p = predicted.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]).cache()
    t = truth.select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]).cache()
    tp = p.join(t, ["id_a", "id_b"]).count()
    fp = p.join(t, ["id_a", "id_b"], "left_anti").count()
    fn = t.join(p, ["id_a", "id_b"], "left_anti").count()
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    p.unpersist()
    t.unpersist()
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision, "recall": recall, "f1": f1}
