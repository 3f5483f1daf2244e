"""Incremental (Structured Streaming) ingest: exactly-once per file,
stream/batch key agreement, catch-up-then-stop resume semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from levsim import blocking, normalize, streaming, tables


@pytest.fixture()
def staged_pages(spark, tmp_path):
    pdf = tables.generate_pages_pdf(n_entities=20, seed=7)
    df = spark.createDataFrame(pdf.drop(columns=["entity_id"]))
    in_dir = tmp_path / "incoming"
    first = df.where(F.col("url").rlike("/p/[0-9]/"))  # entities 0-9
    second = df.subtract(first)
    in_dir.mkdir()
    first.coalesce(1).write.mode("append").parquet(str(in_dir))
    return spark, str(in_dir), str(tmp_path / "out"), str(tmp_path / "ckpt"), df, second


def test_incremental_ingest_and_resume(staged_pages):
    spark, in_dir, out_dir, ckpt, full_df, second = staged_pages
    streaming.run_incremental(spark, in_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    n1 = got1.select("doc_id").distinct().count()
    assert n1 > 0

    # second batch of files arrives; catch-up processes ONLY the new ones
    second.coalesce(1).write.mode("append").parquet(in_dir)
    streaming.run_incremental(spark, in_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    n2 = got2.select("doc_id").distinct().count()
    assert n2 == full_df.select("url").distinct().count()
    # no duplicated work for the first batch (exactly-once per file)
    per_doc_1 = got1.groupBy("doc_id", "block_pass", "block_key").count()
    assert per_doc_1.where(F.col("count") > 1).count() == 0


def test_stream_batch_key_agreement(staged_pages):
    spark, in_dir, out_dir, ckpt, full_df, second = staged_pages
    streaming.run_incremental(spark, in_dir, out_dir, ckpt)
    streamed = spark.read.parquet(out_dir).select("doc_id", "block_pass", "block_key")
    batch_keys = blocking.add_block_keys(
        normalize.with_normalized(
            full_df.join(streamed.select("doc_id").distinct(),
                         full_df.url == F.col("doc_id")).drop("doc_id"),
            text_col="text", url_col="url",
        ),
        id_col="url",
    ).select("doc_id", "block_pass", "block_key")
    # content-hash keys: stream and batch must agree exactly
    assert streamed.subtract(batch_keys).count() == 0
    assert batch_keys.subtract(streamed).count() == 0


def test_streaming_candidate_pairs_stateful(staged_pages):
    """applyInPandasWithState incremental blocking: the union of pairs
    emitted across two catch-up runs must equal the BATCH candidate set on
    the full corpus (every pair emitted exactly once per key when the
    later member arrives; state survives the restart via the checkpoint)."""
    from levsim import candidates

    spark, in_dir, _, _, full_df, second = staged_pages
    out_dir = in_dir + "_pairs_out"
    ckpt = in_dir + "_pairs_ckpt"

    streaming.run_incremental_pairs(spark, in_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    n1 = got1.select("id_a", "id_b").distinct().count()
    assert n1 > 0

    second.coalesce(1).write.mode("append").parquet(in_dir)
    streaming.run_incremental_pairs(spark, in_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir)

    # per-key exactly-once: no (pair, key) row duplicated across restarts
    dup = got.groupBy("id_a", "id_b", "block_key").count().where(F.col("count") > 1)
    assert dup.count() == 0

    # batch equivalence on the same keyed rows (cap never reached here)
    keyed_batch = blocking.add_block_keys(
        normalize.with_normalized(full_df, text_col="text", url_col="url"),
        id_col="url",
    )
    want = candidates.candidate_pairs(keyed_batch, max_block_size=10**6,
                                      keep_pass_provenance=False)
    sgot = got.select("id_a", "id_b").distinct()
    assert sgot.subtract(want).count() == 0
    assert want.subtract(sgot).count() == 0
    # second run emitted strictly new pairs (the new docs' pairs)
    assert sgot.count() > n1


def test_streaming_sessions_event_time_timeout(spark, tmp_path):
    """Event-time sessionization (applyInPandasWithState, EventTimeTimeout):
    sessions close either when a same-user event arrives past the gap or
    when the watermark passes session_end + gap; state survives a restart
    via the checkpoint.  Deterministic file-per-micro-batch script."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
    ])
    in_dir, out_dir, ckpt = str(tmp_path / "ev"), str(tmp_path / "out"), str(tmp_path / "ck")

    B = 100000  # base offset: an event at exactly the initial watermark (0)
                # is dropped as late, so keep every timestamp past it

    def write_file(name, rows):
        pdf = pd.DataFrame(
            [(i, pd.Timestamp(B + t, unit="s"), u) for i, (t, u) in enumerate(rows)],
            columns=["event_id", "ts", "user_id"],
        )
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").parquet(
            in_dir + "/" + name)

    # micro-batch 1: user1 opens a session (2 events), user2 one event
    write_file("f1", [(0, 1), (600, 1), (100, 2)])
    # micro-batch 2: user1 event past the 1800s gap -> session 1 closes
    # intra-stream, session 2 opens
    write_file("f2", [(5000, 1)])
    # micro-batch 3: far-future event advances the watermark past user2's
    # timeout (1900s) -> user2's session fires on this batch
    write_file("f3", [(200000, 99)])

    streaming.run_incremental_sessions(
        spark, in_dir + "/*", out_dir, ckpt, schema)
    got1 = {(r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out_dir).collect()}
    # user2's timeout (B+1900) and user1's second-session timeout (B+6800)
    # both fire within run 1: the final no-data batch evaluates timeouts
    # against the f3-advanced watermark (B+200000)
    assert got1 == {(1, B + 0, B + 600, 2), (2, B + 100, B + 100, 1),
                    (1, B + 5000, B + 5000, 1)}

    # restart: f4 advances the watermark past user99's timeout (B+201800);
    # state and watermark are reloaded from the checkpoint
    write_file("f4", [(300000, 98)])
    write_file("f5", [(400000, 97)])
    streaming.run_incremental_sessions(
        spark, in_dir + "/*", out_dir, ckpt, schema)
    got2 = {(r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out_dir).collect()}
    assert got2 == got1 | {(99, B + 200000, B + 200000, 1),
                           (98, B + 300000, B + 300000, 1)}  # f5's no-data
    # batch fires 98's timeout too; only user97 stays open in state


def test_streaming_textstats_and_pii(spark, tmp_path):
    """The stateless curation extras (textstats projection, PII redaction,
    repetition counts) compose directly with Structured Streaming —
    stream output == batch output on the same files."""
    from levsim.extras.textstats import ngram_repetition_counts, with_textstats
    from levsim.extras.webprep import pii_counts, redact_pii

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [
        (1, "the quick brown fox mail a@b.co"),
        (2, "x y x y x y"),
        (3, ""),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(str(in_dir))

    def curate(df):
        out = with_textstats(df, "text")
        out = out.withColumn("rep", ngram_repetition_counts(F.col("text"), 2))
        return out.withColumn("redacted", redact_pii(F.col("text"))) \
                  .withColumn("pii", pii_counts(F.col("text")))

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(str(in_dir))
    )
    q = (
        curate(stream).writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    want = {r.doc_id: r for r in curate(
        spark.read.parquet(str(in_dir))).collect()}
    assert set(got) == {1, 2, 3}
    for i in got:
        assert got[i].asDict() == want[i].asDict(), i
    assert got[1].pii.n_emails == 1 and "<EMAIL>" in got[1].redacted
    assert got[2].rep.top_count == 3  # 'x y' bigram repeats


def test_streaming_neardup_equals_batch_minhash(staged_pages):
    """Round 5: streaming near-dup BY COMPOSITION — minhash band keys
    (the batch path's own band UDF) feeding the stateful pair emitter must
    reproduce the batch minhash candidate set across two catch-up runs,
    with per-band-bucket exactly-once across the checkpoint restart."""
    from levsim.extras.dedup import minhash_candidate_pairs

    spark, in_dir, _, _, full_df, second = staged_pages
    out_dir = in_dir + "_nd_out"
    ckpt = in_dir + "_nd_ckpt"

    kw = dict(id_col="url", text_col="text", n_perm=32, rows_per_band=4,
              shingle_k=3)
    streaming.run_incremental_neardup(spark, in_dir, out_dir, ckpt, **kw)
    n1 = spark.read.parquet(out_dir).select("id_a", "id_b").distinct().count()

    second.coalesce(1).write.mode("append").parquet(in_dir)
    streaming.run_incremental_neardup(spark, in_dir, out_dir, ckpt, **kw)
    got = spark.read.parquet(out_dir)
    # exactly-once per (pair, band bucket) across the restart
    assert got.groupBy("id_a", "id_b", "block_key").count() \
              .where(F.col("count") > 1).count() == 0
    sgot = got.select("id_a", "id_b").distinct()

    want = minhash_candidate_pairs(
        full_df, id_col="url", text_col="text", n_perm=32, rows_per_band=4,
        shingle_k=3, max_block_size=10**6,
    ).select(F.col("id_a").cast("string").alias("id_a"),
             F.col("id_b").cast("string").alias("id_b")).distinct()
    assert sgot.subtract(want).count() == 0
    assert want.subtract(sgot).count() == 0
    assert sgot.count() >= n1 > 0
