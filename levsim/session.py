"""SparkSession construction with the engine's scale-oriented defaults.

Tuned for the task's execution model: AQE on (runtime shuffle coalescing +
skew-join splitting, required by the north rule), Arrow batching for the
pandas-UDF scoring stage, and shuffle partitioning sized by cores locally —
on a real cluster override via ``LEVSIM_SHUFFLE_PARTITIONS`` (rule of thumb:
2-3x total executor cores, or rely on AQE coalescing from a high initial
value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "levsim",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_size: int = 10_000,
) -> SparkSession:
    master = master or os.environ.get("LEVSIM_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("LEVSIM_SHUFFLE_PARTITIONS", "64"))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_size))
        .config("spark.driver.memory", os.environ.get("LEVSIM_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return b.getOrCreate()
