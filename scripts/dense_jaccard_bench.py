"""Two-parallelism evidence for the DENSE-BITSET all-pairs Jaccard path
(round-4 adaptive escape in dedup.prefix_filtered_jaccard_pairs).

Corpus: the low-entropy regime the escape exists for, generated
DISTRIBUTED (pure column expressions, no driver rows): every doc is a
30-token arc on a fixed 4096-word cycle, token p of doc d being
w[(offset(d) + p) mod 4096] with offset(d) a Knuth multiplicative hash.
Consequences, by construction:

- the distinct word-bigram shingle vocabulary is EXACTLY 4096 (only
  cycle-adjacent pairs occur) -> the adaptive probe picks the dense plan;
- a doc's shingle set is a 29-long arc, so J(a, b) = (29-d)/(29+d) for
  cyclic offset distance d: pairs qualify at threshold 0.5 iff d <= 9,
  giving an analytically known answer structure (expected pair count
  ~ n^2 * 19/(2*4096)) — the assertion below checks every emitted pair
  really has d <= 9 and none with d > 9 exists per sampled offsets.

Usage: python scripts/dense_jaccard_bench.py [n_docs]
Child:  python scripts/dense_jaccard_bench.py --child <cpus> <n_docs>

Each rung runs in its own subprocess (no JVM state leakage); prints one
JSON line per rung plus a summary with docs/sec and scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CYCLE = 4096
ARC = 30  # tokens per doc -> 29 bigram shingles


def make_corpus(spark, n_docs: int):
    from pyspark.sql import functions as F

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(ARC - 1)),
                lambda p: F.concat(
                    F.lit("w"),
                    F.pmod(F.col("id") * 2654435761 + p, F.lit(CYCLE)).cast("string"),
                ),
            ),
        ).alias("text"),
    )


def child(cpus: int, n_docs: int) -> None:
    import time

    from pyspark.sql import functions as F

    from levsim.extras.dedup import prefix_filtered_jaccard_pairs
    from levsim.session import get_spark

    spark = get_spark(app_name=f"dense-jacc-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_corpus(spark, n_docs).repartition(cpus * 2).localCheckpoint()

    # run 1: plain timed count; run 2: timed WITH localCheckpoint so the
    # exactness check below reuses the materialized pairs instead of
    # recomputing the whole join a third time
    t0 = time.perf_counter()
    n_pairs = prefix_filtered_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, shingle_k=2,
        dense_docs_cap=max(n_docs, 20000),
    ).count()
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    pairs = prefix_filtered_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, shingle_k=2,
        dense_docs_cap=max(n_docs, 20000),
    ).localCheckpoint()
    n_pairs = pairs.count()
    dt2 = time.perf_counter() - t0
    best = min(dt1, dt2)

    # exactness spot-check against the analytic structure: every emitted
    # pair must sit at cyclic offset distance <= 9 with the exact
    # inter/uni/jacc the arc geometry implies
    off = F.pmod(F.col("doc_id") * 2654435761, F.lit(CYCLE))
    o = docs.select("doc_id", off.alias("o"))
    chk = (
        pairs.join(o.select(F.col("doc_id").alias("id_a"), F.col("o").alias("oa")), "id_a")
        .join(o.select(F.col("doc_id").alias("id_b"), F.col("o").alias("ob")), "id_b")
        .withColumn("d", F.least(
            F.pmod(F.col("oa") - F.col("ob"), F.lit(CYCLE)),
            F.pmod(F.col("ob") - F.col("oa"), F.lit(CYCLE)),
        ))
        .withColumn("bad", (F.col("d") > 9)
                    | (F.col("inter") != F.lit(ARC - 1) - F.col("d"))
                    | (F.col("uni") != F.lit(ARC - 1) + F.col("d")))
    )
    n_bad = chk.where("bad").count()
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "pairs": n_pairs, "bad_pairs": n_bad,
        "wall_sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus), str(n_docs)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)
    eff = round(
        (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / 4, 3
    )
    print(json.dumps({"summary": "dense_bitset_jaccard", "n_docs": n_docs,
                      "pairs": results[32]["pairs"],
                      "bad_pairs": max(r["bad_pairs"] for r in results.values()),
                      "eff_8_to_32": eff}))


if __name__ == "__main__":
    main()
