"""Round-7 measurement harness — per-query isolation + stage metrics.

``bench.py`` is the frozen driver contract; this file holds the extra
instrumentation the optimization round used (guide §1): noop-sink
isolation of each bench query's DataFrame (so the timing excludes the
count/collect sink), per-stage wall/CPU/task breakdowns pulled from the
Spark UI REST API, and job labels so the UI is readable.

Usage:
  python bench_extra.py            # noop-isolated timings, one JSON line
  python bench_extra.py --stages   # + per-stage breakdown per query

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.

Numbers from this harness are quoted in OPTIMIZATION_r07.md; the
official round metric remains bench.py's.
"""

from __future__ import annotations

import datetime
import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _stage_breakdown(ui: str, appid: str, known_jobs: set) -> list[dict]:
    jobs = [
        j for j in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{appid}/jobs"))
        if j["jobId"] not in known_jobs
    ]
    sids: set[int] = set()
    for j in jobs:
        sids.update(j["stageIds"])
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{appid}/stages?status=complete"))

    def p(x):
        return (datetime.datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")
                if x else None)

    det = []
    for s in stages:
        if s["stageId"] not in sids:
            continue
        sub, comp = s.get("submissionTime"), s.get("completionTime")
        dur = (p(comp) - p(sub)).total_seconds() if sub and comp else -1.0
        det.append({
            "stage": s["stageId"],
            "wall_s": round(dur, 3),
            "tasks": s["numCompleteTasks"],
            "cpu_s": round(s["executorRunTime"] / 1000.0, 2),
            "t0": sub,
        })
    det.sort(key=lambda d: d["t0"] or "")
    for d in det:
        d.pop("t0")
    return det


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    want_stages = "--stages" in sys.argv

    from pyspark.sql import functions as F

    from levsim.session import get_spark

    spark = get_spark(app_name="levsim-bench-extra",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus) * 2, 8))
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    ui = sc.uiWebUrl
    appid = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    from levsim.blocking import sorted_neighborhood_pairs
    from levsim.clustering import connected_components
    from levsim.consensus import elect_representatives
    from levsim.extras.dedup import (minhash_candidate_pairs,
                                     prefix_filtered_jaccard_pairs,
                                     simhash_candidate_pairs)
    from levsim.extras.simsearch import (brute_force_topk_blocked,
                                         embedding_neardup_pairs)
    from levsim.extras.textstats import with_textstats
    from levsim.metablocking import comparison_edges, prune_edges_wnp
    from levsim.normalize import token_sort_key
    from levsim.prefilter import ratio_length_bound
    from levsim.udfs import lev_ratio_udf, multi_score_udf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        int(cpus) * 2).cache()
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()

    def scored_pairs():
        tau = 0.5
        a = docs.select("lang", "source", F.col("doc_id").alias("id_a"),
                        F.col("text").alias("text_a"))
        b = docs.select("lang", "source", F.col("doc_id").alias("id_b"),
                        F.col("text").alias("text_b"))
        p = a.join(F.broadcast(b), ["lang", "source"]).where(
            F.col("id_a") < F.col("id_b"))
        p = p.withColumn("len_a", F.length("text_a")).withColumn(
            "len_b", F.length("text_b"))
        p = p.where(ratio_length_bound(F.col("len_a"), F.col("len_b"), tau))
        p = p.sortWithinPartitions("id_a")
        scored = multi_score_udf(("ratio", "jaro_winkler"),
                                 ratio_cutoff=tau)("text_a", "text_b")
        return (p.withColumn("_s", scored)
                .withColumn("ratio", F.col("_s.ratio"))
                .withColumn("jw", F.col("_s.jaro_winkler")).drop("_s"))

    def q2_df():
        matched = scored_pairs().where(F.col("ratio") >= 0.62)
        comps = connected_components(matched)
        clustered = (docs.select(F.col("doc_id"),
                                 F.col("text").alias("norm_text"))
                     .join(comps, "doc_id", "left")
                     .withColumn("cluster_id",
                                 F.coalesce("cluster_id", "doc_id")))
        return elect_representatives(clustered, method="setmedian")

    def q3_df():
        cand = minhash_candidate_pairs(docs, "doc_id", "text",
                                       rows_per_band=2, shingle_k=2)
        a = docs.select(F.col("doc_id").alias("id_a"),
                        F.col("text").alias("text_a"),
                        F.length("text").alias("len_a"))
        b = docs.select(F.col("doc_id").alias("id_b"),
                        F.col("text").alias("text_b"),
                        F.length("text").alias("len_b"))
        return (cand.join(a, "id_a").join(b, "id_b")
                .where(ratio_length_bound(F.col("len_a"), F.col("len_b"), 0.6))
                .withColumn("ratio",
                            lev_ratio_udf(score_cutoff=0.6)("text_a", "text_b"))
                .where(F.col("ratio") >= 0.6))

    def q10_df():
        blocks = (
            docs.select(F.concat(F.lit("ls:"), "lang", F.lit(":"),
                                 "source").alias("bk"), "doc_id")
            .unionByName(docs.select(
                F.concat(F.lit("ln:"),
                         F.expr("cast(length(text) div 64 as string)")
                         ).alias("bk"), "doc_id"))
            .unionByName(docs.select(
                F.concat(F.lit("pf:"), F.substring("text", 1, 12)
                         ).alias("bk"), "doc_id"))
        )
        edges = comparison_edges(blocks, id_col="doc_id", key_col="bk",
                                 max_block_size=64)
        return prune_edges_wnp(edges, weight_col="arcs_ppm")

    queries = {
        "q1_er_scoring": scored_pairs,
        "q2_er_pipeline": q2_df,
        "q3_minhash_dedup": q3_df,
        "q4_cosine_topk": lambda: brute_force_topk_blocked(
            emb, emb.where(F.col("vec_id") < 50).select(
                F.col("vec_id").alias("query_id"), "embedding"), k=10),
        "q5_textstats": lambda: with_textstats(docs, "text").where(
            F.col("quality") > 0.5),
        "q6_simhash_dedup": lambda: simhash_candidate_pairs(
            docs, "doc_id", "text", max_hamming=3),
        "q7_embedding_neardup": lambda: embedding_neardup_pairs(
            emb, threshold=0.9, method="lsh", n_planes=48, bands=6),
        "q8_prefix_jaccard": lambda: prefix_filtered_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, shingle_k=2),
        "q9_sorted_neighborhood": lambda: sorted_neighborhood_pairs(
            docs.select("doc_id", F.substring(token_sort_key(F.col("text")),
                                              1, 16).alias("sk")),
            "doc_id", "sk", window=6),
        "q10_meta_blocking": q10_df,
    }

    # warm the kernel compile + worker pool outside all timings
    warm = docs.limit(64).select(
        multi_score_udf(("ratio", "jaro_winkler"))("text", "text").alias("_w"))
    warm.agg(F.count("_w.ratio"), F.count("_w.jaro_winkler")).collect()

    def scrub():
        gc.collect()
        sc._jvm.System.gc()

    out: dict = {}
    for name, fn in queries.items():
        obs = []
        stages = None
        for i in range(3):
            known = {j["jobId"] for j in json.load(urllib.request.urlopen(
                f"{ui}/api/v1/applications/{appid}/jobs"))}
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            obs.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
            if want_stages and i == 2:
                stages = _stage_breakdown(ui, appid, known)
            scrub()
        out[name] = {"samples": obs, "median": sorted(obs)[1]}
        if stages is not None:
            out[name]["stages"] = stages

    print(json.dumps({"metric": "noop_isolated_seconds", "sf": sf_dir,
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
