"""Large-star/small-star CC must agree exactly with min-label propagation
on every graph shape: random, path (worst case), cliques, loops, dups."""

from __future__ import annotations

import random

from levsim.clustering import connected_components, connected_components_star


def _labels(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


def _check(spark, edge_list):
    e = spark.createDataFrame(edge_list, ["id_a", "id_b"])
    a = _labels(connected_components(e))
    b = _labels(connected_components_star(e))
    assert a == b, (sorted(a.items())[:10], sorted(b.items())[:10])
    return b


def test_star_cc_path_graph(spark):
    # 200-node chain: the high-diameter worst case LS/SS exists for
    got = _check(spark, [(i, i + 1) for i in range(200)])
    assert set(got.values()) == {0}


def test_star_cc_cliques_and_singleton_edges(spark):
    edges = []
    for base in (0, 100, 200):
        ids = list(range(base, base + 6))
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges += [(500, 501)]
    got = _check(spark, edges)
    assert got[205] == 200 and got[501] == 500


def test_star_cc_self_loops_dups_reversed(spark):
    got = _check(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4)])
    assert got[4] == 1
    # (3,3) self loop: node isolated -> own component
    assert got.get(3, 3) == 3


def test_star_cc_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        edges = [e for e in edges if e[0] != e[1]]
        _check(spark, edges)


def test_blocking_quality_exact_counts(spark):
    from levsim.evaluate import blocking_quality

    # 5 records; candidates keep 4 pairs of C(5,2)=10; truth has 3 pairs,
    # 2 of them retained by the blocking
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a long, id_b long")
    truth = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
    r = blocking_quality(cand, truth, 5).collect()[0]
    assert (r.total_pairs, r.n_cand, r.n_truth, r.found) == (10, 4, 3, 2)
    assert r.pc_ppm == (1_000_000 * 2) // 3
    assert r.pq_ppm == 500_000
    assert r.rr_ppm == 600_000


def test_blocking_quality_dedupes_inputs(spark):
    from levsim.evaluate import blocking_quality

    cand = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3)], "id_a long, id_b long")
    truth = spark.createDataFrame(
        [(1, 2), (1, 2)], "id_a long, id_b long")
    r = blocking_quality(cand, truth, 3).collect()[0]
    assert (r.n_cand, r.n_truth, r.found) == (2, 1, 1)
    assert r.pc_ppm == 1_000_000
