"""spark-submit entry point for the ER pipeline (north rule:
``spark-submit --py-files levsim.zip scripts/run_pipeline.py``).

Modes:
  --synthesize N   generate a deterministic synthetic pages corpus of N
                   entities (seed 42) as the input snapshot
  --input PATH     read an existing pages parquet (url, warc_ts, html,
                   text, lang)
  --workdir DIR    snapshot/lineage/metrics root (default ./er_work)
  --tau X          match threshold (default 0.87)
  --evaluate       compute pairwise F1 against ground truth (synthetic only)

Build the py-files archive with:
  (cd /root/repo && zip -qr levsim.zip levsim)
Then:
  spark-submit --master <cluster> --py-files levsim.zip scripts/run_pipeline.py \
      --synthesize 1000 --workdir /tmp/er --evaluate
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthesize", type=int, default=0)
    ap.add_argument("--input", type=str, default=None)
    ap.add_argument("--workdir", type=str, default="./er_work")
    ap.add_argument("--tau", type=float, default=0.87)
    ap.add_argument("--consensus", type=str, default="setmedian",
                    choices=["setmedian", "quickmedian", "median"])
    ap.add_argument("--evaluate", action="store_true")
    ap.add_argument("--snm-window", type=int, default=0,
                    help="enable the sorted-neighborhood candidate pass (0 = off)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from levsim import evaluate, tables
    from levsim.pipeline import ERConfig, ERPipeline

    # Apply the house engine configs (AQE + partition coalescing + skew-join
    # splitting, Arrow batching, UTC) on TOP of whatever spark-submit set —
    # round-6 profiling showed the raw builder.getOrCreate() here ran the
    # whole stress WITHOUT AQE, which is not the tuned production posture.
    builder = SparkSession.builder.appName("levsim-er")
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthesize:
        pages = tables.generate_pages(spark, n_entities=args.synthesize, seed=42)
        input_id = f"synthetic_{args.synthesize}_42"
    elif args.input:
        pages = spark.read.parquet(args.input)
        input_id = args.input
    else:
        ap.error("one of --synthesize or --input is required")
        return

    cfg = ERConfig(tau=args.tau, consensus_method=args.consensus,
                   snm_window=args.snm_window or None)
    pipe = ERPipeline(spark, args.workdir, cfg)
    run = pipe.run(pages, pages_snapshot_id=input_id)

    report = {
        "run_id": pipe.run_id,
        "stages": [
            {"stage": s.stage, "snapshot": s.snapshot_id, "rows": s.rows,
             "wall_sec": round(s.wall_sec, 2), "skipped": s.skipped}
            for s in run.stages
        ],
        "n_clusters": run.representatives.count(),
    }
    if args.evaluate and args.synthesize:
        predicted = evaluate.pairs_from_clusters(run.clusters, id_col="url")
        truth = evaluate.truth_pairs_from_entities(pages, id_col="url")
        report["pair_f1"] = evaluate.pair_f1(predicted, truth)
        # cluster-level metric (round 5): B-cubed weights every RECORD
        # equally where pairwise F1 weights clusters quadratically
        from pyspark.sql import functions as F

        assigned = run.clusters.select("url", "cluster_id").join(
            pages.select("url", "entity_id"), "url")
        report["bcubed"] = evaluate.bcubed(assigned, id_col="url")
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
