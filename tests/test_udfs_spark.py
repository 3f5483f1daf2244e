"""Spark↔local equivalence (SURVEY.md §5.3): pandas-UDF outputs over a
DataFrame must equal scalar kernel calls row-by-row, exactly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from levsim import kernels as K
from levsim import udfs

rng = random.Random(99)
ALPHA = "abcdef ü日"
ROWS = [
    ("".join(rng.choice(ALPHA) for _ in range(rng.randint(0, 40))),
     "".join(rng.choice(ALPHA) for _ in range(rng.randint(0, 40))))
    for _ in range(200)
] + [("", ""), ("abc", ""), ("", "abc"), ("lewenstein", "levenshtein")]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(ROWS, ["a", "b"]).repartition(4).cache()


def test_distance_udf(pairs_df):
    got = pairs_df.withColumn("d", udfs.lev_distance_udf()("a", "b")).collect()
    for r in got:
        assert r.d == K.distance(r.a, r.b), (r.a, r.b)


def test_distance_udf_cutoff(pairs_df):
    got = pairs_df.withColumn("d", udfs.lev_distance_udf(score_cutoff=3)("a", "b")).collect()
    for r in got:
        assert r.d == K.distance(r.a, r.b, score_cutoff=3)


def test_ratio_udf(pairs_df):
    got = pairs_df.withColumn("s", udfs.lev_ratio_udf()("a", "b")).collect()
    for r in got:
        assert r.s == K.ratio(r.a, r.b)  # exact float equality: same code path


def test_jaro_udfs(pairs_df):
    got = pairs_df.withColumn("j", udfs.lev_jaro_udf()("a", "b")).withColumn(
        "jw", udfs.lev_jaro_winkler_udf()("a", "b")
    ).collect()
    for r in got:
        assert r.j == K.jaro(r.a, r.b)
        assert r.jw == K.jaro_winkler(r.a, r.b)


def test_hamming_udf(pairs_df):
    got = pairs_df.withColumn("h", udfs.lev_hamming_udf()("a", "b")).collect()
    for r in got:
        assert r.h == K.hamming(r.a, r.b)


def test_editops_udf(pairs_df):
    got = pairs_df.withColumn("e", udfs.lev_editops_udf()("a", "b")).collect()
    for r in got:
        exp = K.editops(r.a, r.b)
        assert [(x.op, x.spos, x.dpos) for x in r.e] == exp


def test_seqratio_setratio_udf(spark):
    rows = [
        (["newspaper", "litter bin", "tinny", "antelope"], ["caribou", "sausage", "gorn", "woody"]),
        ([], []),
        (["a"], []),
    ]
    df = spark.createDataFrame(rows, ["la", "lb"])
    got = df.withColumn("seq", udfs.seqratio_udf()("la", "lb")).withColumn(
        "set", udfs.setratio_udf()("la", "lb")
    ).collect()
    for r in got:
        assert r.seq == K.seqratio(r.la, r.lb)
        assert r.set == K.setratio(r.la, r.lb)


def test_nulls_propagate(spark):
    df = spark.createDataFrame([("abc", None), (None, "x"), ("a", "b")], ["a", "b"])
    got = df.withColumn("s", udfs.lev_ratio_udf()("a", "b")).orderBy(F.col("a").asc_nulls_first()).collect()
    # sorted by a: (None,"x"), ("a","b"), ("abc",None)
    assert got[0].s is None and got[1].s is not None and got[2].s is None


def test_multi_score_new_scorers(spark):
    """osa / affine_gap / partial_ratio ride the single-Arrow-crossing
    cascade and match their scalar kernels."""
    from levsim import kernels as K
    from levsim.udfs import multi_score_udf

    rows = [("lewenstein", "levenshtein"), ("ab", "ba"), ("", "x"), ("same", "same")]
    df = spark.createDataFrame(rows, "a string, b string")
    u = multi_score_udf(("ratio", "osa", "affine_gap", "partial_ratio"))
    got = {
        (r.a, r.b): r.s
        for r in df.select("a", "b", u("a", "b").alias("s")).collect()
    }
    for a, b in rows:
        s = got[(a, b)]
        assert s.ratio == K.ratio(a, b)
        assert s.osa == K.osa_distance(a, b)
        assert s.affine_gap == K.affine_gap_distance(a, b)
        assert s.partial_ratio == K.partial_ratio(a, b)


def test_score_pairs_accepts_new_scorers(spark):
    """score_pairs / cascade surface the continuation scorers as columns
    (previously silently dropped by the allowlist)."""
    from levsim import kernels as K
    from levsim.scoring import score_pairs, score_pairs_cascade

    df = spark.createDataFrame(
        [(1, 2, "lewenstein", "levenshtein", 10, 11)],
        "id_a long, id_b long, text_a string, text_b string, len_a int, len_b int",
    )
    out = score_pairs(df, scorers=("ratio", "osa", "affine_gap", "partial_ratio")).collect()[0]
    assert out.osa == K.osa_distance("lewenstein", "levenshtein")
    assert out.affine_gap == K.affine_gap_distance("lewenstein", "levenshtein")
    assert out.partial_ratio == K.partial_ratio("lewenstein", "levenshtein")
    casc = score_pairs_cascade(df, tau=0.5, secondary=("jaro_winkler", "osa")).collect()[0]
    assert casc.osa == K.osa_distance("lewenstein", "levenshtein")
    assert casc.ratio >= 0.5
