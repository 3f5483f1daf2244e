"""Pages generator invariants (FIXTURES.md F1) and clustering edge cases."""

from __future__ import annotations

import pandas as pd

from levsim import clustering, kernels as K, tables


def test_generator_deterministic():
    a = tables.generate_pages_pdf(n_entities=30, seed=42)
    b = tables.generate_pages_pdf(n_entities=30, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = tables.generate_pages_pdf(n_entities=30, seed=43)
    assert not a["text"].equals(c["text"])


def test_generator_html_text_invariant():
    # input_hint: byte-identical extracted text per url
    pdf = tables.generate_pages_pdf(n_entities=10, seed=1)
    for _, row in pdf.iterrows():
        assert bytes(row["html"]) == f"<html><body>{row['text']}</body></html>".encode("utf-8")


def test_generator_calibration():
    # FIXTURES.md F1: intra-cluster ratio vs base >= ~0.9
    pdf = tables.generate_pages_pdf(n_entities=40, seed=42)
    for ent, grp in pdf.groupby("entity_id"):
        texts = grp.sort_values("url")["text"].tolist()
        base = texts[0]
        for t in texts[1:]:
            assert K.ratio(base, t) >= 0.88, (ent, K.ratio(base, t))


def test_generator_unique_urls():
    pdf = tables.generate_pages_pdf(n_entities=50, seed=42)
    assert pdf["url"].is_unique


def test_extract_text_from_html(spark):
    pdf = tables.generate_pages_pdf(n_entities=5, seed=2)
    df = spark.createDataFrame(pdf.drop(columns=["entity_id"]))
    got = df.select("text", tables.extract_text_from_html(df.html).alias("re_text")).collect()
    for r in got:
        assert r.re_text == r.text


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    comps = clustering.connected_components(edges)
    assert comps.count() == 0
    docs = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "norm_text"])
    out = clustering.attach_clusters(docs, comps)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == {1: 1, 2: 2}  # every doc becomes its own cluster


def test_cc_self_loops_and_dups(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3)], ["id_a", "id_b"]
    )
    comps = {r.doc_id: r.cluster_id for r in clustering.connected_components(edges).collect()}
    assert comps[1] == comps[2] == 1
    assert comps[3] == 3


def test_snapshot_partitioned_write_prunes(spark, tmp_path):
    import os

    from levsim.tables import SnapshotTable, generate_pages

    pages = generate_pages(spark, n_entities=20, partitions=4)
    t = SnapshotTable(str(tmp_path), "pages")
    info = t.write(pages, "snap1", partition_by=["lang"])
    assert info.row_count == pages.count()
    assert t.manifest("snap1")["partition_by"] == ["lang"]
    # hive-style layout on disk
    data_dir = os.path.join(str(tmp_path), "pages", "snap_snap1", "data")
    assert any(d.startswith("lang=") for d in os.listdir(data_dir))
    # planning-time partition pruning: the filtered scan reads only the
    # matching directory (PartitionFilters in the physical plan)
    df = t.read(spark, "snap1").where("lang = 'en'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    langs = {r.lang for r in df.select("lang").distinct().collect()}
    assert langs == {"en"}


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Tables bucketed+sorted on the join key SMJ with ZERO exchanges
    (broadcast disabled to force the distributed strategy)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], ["doc_id", "text"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for n in ("bkt_a", "bkt_b"):
            tables.write_bucketed(docs, n, str(tmp_path / n),
                                  "doc_id", n_buckets=8, sort_cols="doc_id")
        a = tables.read_bucketed(spark, "bkt_a")
        b = tables.read_bucketed(spark, "bkt_b").select(
            "doc_id", F.col("text").alias("t2"))
        j = a.join(b, "doc_id")
        assert j.count() == 200
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0
        assert plan.count("SortMergeJoin") == 1
        # groupBy on the bucket key also needs no exchange
        g = a.groupBy("doc_id").agg(F.count("*").alias("n"))
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert g.count() == 200 and gplan.count("Exchange") == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
