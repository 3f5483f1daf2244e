"""Structured Streaming front-end: incremental pages ingest.

The north rule's pipeline is batch with snapshot-level resume (SURVEY.md §2b
"not applicable" note), but a web-scale deployment lands crawl data
continuously.  This module provides the incremental on-ramp: a file-source
stream over arriving pages, normalized and blocking-keyed EXACTLY like the
batch path (same column expressions, same UDFs — keys are content hashes,
so stream and batch agree byte-for-byte), appended to a keyed staging table
that the batch pipeline snapshots from.

- exactly-once per file via the checkpointed file source;
- watermarked dropDuplicates on url (late re-crawls within the watermark
  are deduped; beyond it, the batch exact-dedup pass catches them);
- trigger(availableNow=True) gives catch-up-then-stop semantics for
  cron-style incremental runs — the streaming analog of snapshot resume.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import blocking, normalize
from .tables import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: Optional[int] = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(input_dir)


def keyed_pages_stream(pages: DataFrame, watermark: str = "1 hour",
                       n_perm: int = 64, rows_per_band: int = 4,
                       shingle_k: int = 3) -> DataFrame:
    """pages stream -> (url, warc_ts, block_pass, block_key) stream, deduped
    on url within the watermark."""
    p = normalize.with_normalized(pages, text_col="text", url_col="url")
    p = p.withWatermark("warc_ts", watermark).dropDuplicates(["url"])
    keys = blocking.add_block_keys(
        p, id_col="url", text_col="norm_text", host_col="host",
        n_perm=n_perm, rows_per_band=rows_per_band, shingle_k=shingle_k,
    )
    # re-attach event time for downstream windowing (doc_id here is the url)
    return keys.join(p.select(F.col("url").alias("doc_id"), "warc_ts"), "doc_id")


def run_incremental(spark: SparkSession, input_dir: str, output_dir: str,
                    checkpoint_dir: str, watermark: str = "1 hour"):
    """Catch-up ingest: process all files not yet seen by the checkpoint,
    append keyed rows to output_dir, then stop (availableNow)."""
    pages = read_pages_stream(spark, input_dir)
    keyed = keyed_pages_stream(pages, watermark=watermark)
    q = (
        keyed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
