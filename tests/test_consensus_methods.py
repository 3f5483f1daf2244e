"""Consensus method variants through the applyInPandas surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from levsim import consensus, kernels as K


@pytest.fixture(scope="module")
def clustered(spark):
    rows = [
        ("c1", "d1", "Levnhtein"), ("c1", "d2", "Leveshein"), ("c1", "d3", "Leenshten"),
        ("c1", "d4", "Leveshtei"), ("c1", "d5", "Lenshtein"), ("c1", "d6", "Lvenstein"),
        ("c1", "d7", "Levenhtin"), ("c1", "d8", "evenshtei"),
        ("c2", "d9", "solo text"),
        ("c3", "da", "dup"), ("c3", "db", "dup"), ("c3", "dc", "dup variant"),
    ]
    return spark.createDataFrame(rows, ["cluster_id", "doc_id", "norm_text"])


@pytest.mark.parametrize("method,expected_c1", [
    ("median", "Levenshtein"),          # the reference's own docstring vector
    ("quickmedian", "Levnshein"),
    ("setmedian", None),                # medoid: any member; checked below
])
def test_methods(spark, clustered, method, expected_c1):
    reps = {r.cluster_id: r for r in
            consensus.elect_representatives(clustered, method=method).collect()}
    assert reps["c2"].representative == "solo text" and reps["c2"].n_members == 1
    assert reps["c1"].n_members == 8
    if expected_c1:
        assert reps["c1"].representative == expected_c1
    else:
        assert reps["c1"].representative in {
            "Levnhtein", "Leveshein", "Leenshten", "Leveshtei",
            "Lenshtein", "Lvenstein", "Levenhtin", "evenshtei",
        }
    # weights-as-multiplicities: 'dup' x2 beats 'dup variant'
    if method == "setmedian":
        assert reps["c3"].representative == "dup"


def test_median_improve_rounds(spark, clustered):
    reps = {r.cluster_id: r.representative for r in
            consensus.elect_representatives(clustered, method="median",
                                            improve_rounds=1).collect()}
    # improve never worsens the SOD of the greedy result
    members = ["Levnhtein", "Leveshein", "Leenshten", "Leveshtei",
               "Lenshtein", "Lvenstein", "Levenhtin", "evenshtei"]
    base = sum(K.distance(K.median(members), m) for m in members)
    got = sum(K.distance(reps["c1"], m) for m in members)
    assert got <= base


def test_hierarchical_reduces_to_flat_below_threshold(spark):
    from levsim.consensus import elect_representatives, elect_representatives_hierarchical

    rows = []
    for cid, members in [("a", ["spam", "spa", "spams", "spam"]),
                         ("b", ["x"]),
                         ("c", ["kitten", "sitten", "mitten"])]:
        for i, t in enumerate(members):
            rows.append((f"{cid}{i}", cid, t))
    df = spark.createDataFrame(rows, ["doc_id", "cluster_id", "norm_text"])
    for method in ("setmedian", "quickmedian", "median"):
        flat = {r.cluster_id: (r.representative, r.n_members)
                for r in elect_representatives(df, method=method,
                                               max_members=None).collect()}
        hier = {r.cluster_id: (r.representative, r.n_members)
                for r in elect_representatives_hierarchical(df, method=method).collect()}
        assert flat == hier, method


def test_hierarchical_megacluster_bounded_and_majority(spark):
    """A 20k-member cluster never lands in one task: fanout subgroups elect
    locally, the weighted second level recovers the dominant variant."""
    from pyspark.sql import functions as F

    from levsim.consensus import elect_representatives_hierarchical

    n = 20000
    base = spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit("mega").alias("cluster_id"),
        F.when(F.col("id") % 10 < 8, F.lit("the canonical boilerplate page"))
        .otherwise(F.lit("the canonical boilerplate pag3")).alias("norm_text"),
    )
    out = elect_representatives_hierarchical(
        base, method="setmedian", fanout=32, direct_threshold=1000).collect()
    assert len(out) == 1
    assert out[0].n_members == n
    assert out[0].representative == "the canonical boilerplate page"
    # determinism under different physical partitioning
    out2 = elect_representatives_hierarchical(
        base.repartition(17), method="setmedian", fanout=32,
        direct_threshold=1000).collect()
    assert out2[0].representative == out[0].representative


def test_hierarchical_all_null_cluster_keeps_id(spark):
    from levsim.consensus import elect_representatives_hierarchical

    rows = [("d1", "c1", None), ("d2", "c1", None), ("d3", "c2", "ok text")]
    df = spark.createDataFrame(rows, ["doc_id", "cluster_id", "norm_text"])
    got = {r.cluster_id: r.representative
           for r in elect_representatives_hierarchical(df).collect()}
    assert got == {"c1": None, "c2": "ok text"}
