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
