"""Per-stage Spark-metric profiling of the ER pipeline (round-5 VERDICT
next #2): run the pipeline at a given entity count and report, for each
pipeline stage (via the er_<stage> job groups set in pipeline._stage), the
aggregate Spark task metrics the UI REST API exposes — executor run time,
JVM GC time, shuffle read/write bytes, memory/disk spill, input bytes and
task count.  The point: name the mechanism behind the 2M-page superlinear
wall growth (candidates 9.0x wall for 4.5x pairs, consensus 6.0x for 4.5x
clusters) instead of guessing.

Usage (quiet host; ~1.5 min at 100k entities, ~12 min at 450k):
  python scripts/profile_pipeline.py --entities 100000 \
      --workdir /tmp/er_prof_100k --json docs/profile_100k.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
        return json.loads(r.read().decode())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, required=True)
    ap.add_argument("--workdir", type=str, required=True)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--driver-mem", type=str, default="24g")
    ap.add_argument("--shuffle-partitions", type=str, default=None,
                    help="override spark.sql.shuffle.partitions (default 2*cores)")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--snm-window", type=int, default=0)
    ap.add_argument("--aqe", choices=["on", "off"], default="off",
                    help="adaptive query execution (production sessions run "
                         "with AQE on; off isolates static-plan behavior)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    width = args.shuffle_partitions or str(2 * args.cores)
    spark = (
        SparkSession.builder.appName("levsim-profile")
        .master(f"local[{args.cores}]")
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.shuffle.partitions", width)
        .config("spark.sql.adaptive.enabled", "true" if args.aqe == "on" else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled",
                "true" if args.aqe == "on" else "false")
        .config("spark.sql.adaptive.skewJoin.enabled",
                "true" if args.aqe == "on" else "false")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from levsim import tables
    from levsim.pipeline import ERConfig, ERPipeline

    pages = tables.generate_pages(spark, n_entities=args.entities, seed=42)
    cfg = ERConfig(snm_window=args.snm_window or None)
    pipe = ERPipeline(spark, args.workdir, cfg)
    run = pipe.run(pages, pages_snapshot_id=f"synthetic_{args.entities}_42")

    base = spark.sparkContext.uiWebUrl
    app = rest(base, "applications")[0]["id"]
    jobs = rest(base, f"applications/{app}/jobs?status=succeeded")
    stage_meta = {s["stageId"]: s for s in rest(base, f"applications/{app}/stages")}

    per_group: dict[str, dict] = {}
    for j in jobs:
        grp = j.get("jobGroup") or "ungrouped"
        acc = per_group.setdefault(grp, {
            "executor_run_s": 0.0, "gc_s": 0.0, "shuffle_read_mb": 0.0,
            "shuffle_write_mb": 0.0, "mem_spill_mb": 0.0, "disk_spill_mb": 0.0,
            "input_mb": 0.0, "output_mb": 0.0, "tasks": 0, "n_spark_stages": 0,
        })
        for sid in j.get("stageIds", []):
            s = stage_meta.get(sid)
            if not s or s.get("status") == "SKIPPED":
                continue
            acc["executor_run_s"] += s.get("executorRunTime", 0) / 1000.0
            acc["gc_s"] += s.get("jvmGcTime", 0) / 1000.0
            acc["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
            acc["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
            acc["mem_spill_mb"] += s.get("memoryBytesSpilled", 0) / 1e6
            acc["disk_spill_mb"] += s.get("diskBytesSpilled", 0) / 1e6
            acc["input_mb"] += s.get("inputBytes", 0) / 1e6
            acc["output_mb"] += s.get("outputBytes", 0) / 1e6
            acc["tasks"] += s.get("numCompleteTasks", 0)
            acc["n_spark_stages"] += 1

    report = {
        "entities": args.entities,
        "pages": pages.count(),
        "cores": args.cores,
        "shuffle_partitions": width,
        "pipeline_stages": [
            {"stage": s.stage, "rows": s.rows, "wall_sec": round(s.wall_sec, 2),
             "skipped": s.skipped,
             "spark": {k: (round(v, 2) if isinstance(v, float) else v)
                        for k, v in per_group.get(f"er_{s.stage}", {}).items()}}
            for s in run.stages
        ],
    }
    print(json.dumps(report, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
