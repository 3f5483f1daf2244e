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


# ---------------------------------------------------------------------------
# Custom stateful operator: incremental candidate-pair emission
# (applyInPandasWithState — the streaming analog of candidates.candidate_pairs)
# ---------------------------------------------------------------------------


def streaming_candidate_pairs(keyed: DataFrame, max_state_ids: int = 200) -> DataFrame:
    """Streaming (doc_id, block_key) rows -> incremental candidate pairs
    (id_a, id_b, block_key), emitted the moment the LATER member of a pair
    arrives.

    State per block_key: the sorted set of doc ids seen so far, capped at
    ``max_state_ids``.  A key that exceeds the cap stops accumulating and
    stops emitting (streaming stop-key semantics — the same mega-block
    compromise as the batch path's salting/drop: near-useless keys like an
    empty host discriminate nothing, and recall is carried by the content
    passes).  State is therefore O(max_state_ids) per key regardless of
    stream length, and each pair is emitted exactly once per key (the
    checkpointed state dedups re-deliveries; cross-key duplicates are left
    to the consumer's dropDuplicates, exactly like the batch union).

    Union over all micro-batches == the batch candidate set whenever no
    key exceeds the cap (asserted in tests/test_streaming.py)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id_a", StringType()),
            StructField("id_b", StringType()),
            StructField("block_key", StringType()),
        ]
    )
    state_schema = StructType([StructField("ids", ArrayType(StringType()))])

    def fn(key, pdfs, state):
        block_key = key[0]
        seen: list = list(state.get[0]) if state.exists else []
        seen_set = set(seen)
        incoming: list = []
        for pdf in pdfs:
            incoming.extend(pdf["doc_id"].tolist())
        # deterministic order within the micro-batch; drop re-deliveries
        new_ids = sorted({d for d in incoming if d is not None and d not in seen_set})
        ida, idb = [], []
        for nid in new_ids:
            if len(seen) >= max_state_ids:
                break  # stop-key: cap reached, emit nothing further
            for old in seen:
                lo, hi = (old, nid) if old < nid else (nid, old)
                ida.append(lo)
                idb.append(hi)
            seen.append(nid)
            seen_set.add(nid)
        state.update((sorted(seen),))
        if ida:
            yield pd.DataFrame({"id_a": ida, "id_b": idb,
                                "block_key": [block_key] * len(ida)})

    return keyed.groupBy("block_key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_incremental_pairs(spark: SparkSession, input_dir: str, output_dir: str,
                          checkpoint_dir: str, watermark: str = "1 hour",
                          max_state_ids: int = 200):
    """Catch-up candidate-pair emission: ingest new page files, key them
    with the SAME expressions as the batch path, and emit the new candidate
    pairs each page unlocks (stateful, exactly-once per file)."""
    pages = read_pages_stream(spark, input_dir)
    keyed = keyed_pages_stream(pages, watermark=watermark)
    pairs = streaming_candidate_pairs(
        keyed.select("doc_id", "block_key"), max_state_ids=max_state_ids
    )
    q = (
        pairs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


# ---------------------------------------------------------------------------
# Custom stateful operator: event-time sessionization with timeout
# (the streaming analog of the batch lag+cumsum sessionizer in
# __spark_entry__.q_event_sessions — same 30-min-gap semantics)
# ---------------------------------------------------------------------------


def streaming_sessions(events: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts", gap_seconds: int = 1800,
                       watermark: str = "0 seconds") -> DataFrame:
    """Streaming gap-based sessionization via applyInPandasWithState with
    EVENT-TIME timeout: per-user state holds the open session (start, end,
    n_events, all epoch seconds); a session is emitted when a same-user
    event arrives past the gap (intra-stream close) or when the watermark
    passes session_end + gap (timeout close — no further event can belong
    to it, since later-than-watermark events are dropped upstream).

    State is O(1) per active user and is removed on close — the bounded-
    state contract for an unbounded stream.  Emission is append-mode exact
    for event-time-ordered arrivals per user; out-of-order arrivals within
    the watermark merge correctly into the open session, while arrivals
    for an already-closed session (allowed by a lagging watermark) open a
    new session — the standard Spark sessionization trade-off."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", LongType()),
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start", LongType()),
            StructField("end", LongType()),
            StructField("n", LongType()),
        ]
    )

    def fn(key, pdfs, state):
        user = key[0]

        def emit(rows):
            return pd.DataFrame(
                {"user_id": [user] * len(rows),
                 "session_start": [r[0] for r in rows],
                 "session_end": [r[1] for r in rows],
                 "n_events": [r[2] for r in rows]}
            )

        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield emit([(s, e, n)])
            return
        ts: list = []
        for pdf in pdfs:
            ts.extend((pdf[ts_col].astype("int64") // 10**9).tolist())
        ts.sort()
        cur = tuple(state.get) if state.exists else None
        closed = []
        for t in ts:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap_seconds:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (t, t, 1)
        wm_sec = state.getCurrentWatermarkMs() // 1000
        if cur is not None and cur[1] + gap_seconds <= wm_sec:
            closed.append(cur)      # already unreachable by future events
            cur = None
        if cur is not None:
            state.update(cur)
            # fire once no in-watermark event can extend the session
            state.setTimeoutTimestamp((cur[1] + gap_seconds) * 1000)
        elif state.exists:
            state.remove()
        if closed:
            yield emit(closed)

    ev = events.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias(ts_col)
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def run_incremental_sessions(spark: SparkSession, input_dir: str, output_dir: str,
                             checkpoint_dir: str, schema, gap_seconds: int = 1800,
                             watermark: str = "0 seconds"):
    """Catch-up sessionization over an events file stream (one file per
    micro-batch so the event-time watermark advances between batches)."""
    events = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", 1).load(input_dir)
    )
    sessions = streaming_sessions(events, gap_seconds=gap_seconds,
                                  watermark=watermark)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def keyed_neardup_stream(pages: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         n_perm: int = 64, rows_per_band: int = 4,
                         shingle_k: int = 3) -> DataFrame:
    """Streaming near-dup keying (round 5): each incoming doc fans out to
    its MinHash LSH band keys — the SAME band expressions as the batch
    dedup path (blocking.minhash_band_udf), prefixed with the band index
    so cross-band collisions cannot alias.  Feeding this into
    :func:`streaming_candidate_pairs` gives incremental NEAR-DUP candidate
    pairs with O(cap) state per band bucket: the streaming analog of
    dedup.minhash_candidate_pairs, by composition rather than a new
    stateful operator (asserted stream == batch in tests)."""
    from . import blocking

    bands = blocking.minhash_band_udf(n_perm=n_perm,
                                      rows_per_band=rows_per_band,
                                      shingle_k=shingle_k)
    return pages.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.posexplode(bands(F.col(text_col))).alias("band_i", "bkey"),
    ).select(
        "doc_id",
        F.concat_ws(":", F.lit("mh"), F.col("band_i"), F.col("bkey")).alias("block_key"),
    )


def run_incremental_neardup(spark: SparkSession, input_dir: str,
                            output_dir: str, checkpoint_dir: str,
                            max_state_ids: int = 200, **band_kw):
    """Catch-up near-dup candidate emission over a pages directory: new
    files are banded and run through the stateful pair emitter; each
    near-dup candidate pair appears exactly once per band bucket.  The
    verify/threshold stage stays a batch pass over the emitted pairs
    (scoring needs both texts — an id-keyed batch join, not stream state)."""
    pages = read_pages_stream(spark, input_dir)
    keyed = keyed_neardup_stream(pages, **band_kw)
    pairs = streaming_candidate_pairs(keyed, max_state_ids=max_state_ids)
    q = (
        pairs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
