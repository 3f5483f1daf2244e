"""Incremental ER == batch ER: streaming stateful candidate pairs + anti-
join scoring + full-closure clustering, across two catch-up rounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from levsim import blocking, candidates, clustering, incremental, normalize, scoring, streaming, tables


def _clusters_as_partition(rows):
    """{frozenset of member ids per cluster} — id-labeling-independent."""
    from collections import defaultdict

    by = defaultdict(set)
    for r in rows:
        by[r.cluster_id].add(r.doc_id)
    return {frozenset(v) for v in by.values()}


def test_incremental_er_equals_batch(spark, tmp_path):
    pdf = tables.generate_pages_pdf(n_entities=25, seed=11)
    full = spark.createDataFrame(pdf.drop(columns=["entity_id"]))
    first = full.where(F.col("url").rlike("/p/1?[0-9]/"))   # entities 0-19
    second = full.subtract(first)
    in_dir = str(tmp_path / "in")
    pairs_out, ckpt = str(tmp_path / "pairs"), str(tmp_path / "ck")
    matches = str(tmp_path / "matches.parquet")
    tau = 0.62

    norm_full = normalize.with_normalized(full, text_col="text", url_col="url")
    docs = norm_full.select(F.col("url").alias("doc_id"), "norm_text")

    def catch_up():
        streaming.run_incremental_pairs(spark, in_dir, pairs_out, ckpt)
        pairs = spark.read.parquet(pairs_out)
        n_new = incremental.score_new_pairs(spark, pairs, docs, matches, tau=tau)
        comps = incremental.refresh_clusters(spark, matches, tau=tau)
        return n_new, comps

    first.coalesce(1).write.mode("append").parquet(in_dir)
    n1, comps1 = catch_up()
    assert n1 > 0 and comps1.count() > 0

    second.coalesce(1).write.mode("append").parquet(in_dir)
    n2, comps2 = catch_up()
    assert n2 > 0
    # idempotence: a catch-up with no new files scores nothing new
    n3, comps3 = catch_up()
    assert n3 == 0

    # batch reference on the full corpus: same blocking, scoring, CC
    keyed = blocking.add_block_keys(norm_full, id_col="url")
    cand = candidates.candidate_pairs(keyed, max_block_size=10**6,
                                      keep_pass_provenance=False)
    scored = scoring.score_pairs(
        scoring.attach_texts(cand, docs), tau=tau, scorers=("ratio",))
    edges = scored.where(F.col("ratio") >= tau).select("id_a", "id_b")
    batch_comps = clustering.connected_components(edges)

    inc = _clusters_as_partition(comps3.collect())
    bat = _clusters_as_partition(batch_comps.collect())
    assert inc == bat
