"""Partition-invariance of the content-derived operators: identical results
regardless of input partitioning and shuffle width — the property that makes
outputs stable across cluster sizes, task retries and speculative execution
(every key/hash/sample in the engine is content-derived, never derived from
partition ids or RNG).  The two-cluster-size scaling criterion implicitly
assumes this; here it is asserted directly."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# queries whose outputs would be the FIRST to drift if anything depended on
# physical layout: hash-based sampling/splits/sketches, minhash banding,
# distributed-rank SNM, connected components, bounded-top-K dedup groups,
# the BPE trainer's driver-side loop, and the LM count joins
QUERIES = [
    "sample_per_group",
    "dataset_split_assign",
    "kmv_token_sketch",
    "minhash_dedup_pairs",
    "sorted_neighborhood",
    "chain_components",
    "exact_dup_groups",
    "bpe_merges",
    "lm_fluency_scores",
    "dup_span_stats",
    # round 5: winnowing's window mins and ExactSubstr's canonical
    # (min doc_id, pos) election are content-derived total orders —
    # collect_set/groupBy ordering must not leak into either
    "winnow_dup_pairs",
    "dup_span_removal",
]


def _run(spark, name, n_part):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    try:
        df = entrymod.queries()[name](spark, SF_DIR)
        if n_part != "keep":
            df = df.repartition(int(n_part))
        return sorted(tuple(r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", QUERIES)
def test_partition_invariant(spark, name):
    a = _run(spark, name, 2)
    b = _run(spark, name, 17)
    assert a == b, f"{name}: output depends on partitioning"
