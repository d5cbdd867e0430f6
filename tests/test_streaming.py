"""Streaming operators: prove stream results == the equivalent batch
computation on the same events data (unified-API equivalence), plus the
custom stateful operator and multimodal stubs."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_pipeline_agent_spark.plans.registry import events_table
from data_pipeline_agent_spark.streaming.stateful import user_lifetime_stats
from data_pipeline_agent_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark, tmp_path_factory):
    """Events as micro-batchable parquet (micros timestamps) + the batch DF."""
    df = events_table(spark, SF).select("event_id", "ts", "user_id", "event_type", "value")
    outdir = str(tmp_path_factory.mktemp("events_stream"))
    # two files -> two micro-batches under maxFilesPerTrigger=1
    df.where("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(outdir)
    df.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(outdir)
    return df, outdir


def _run_stream(spark, stream_df, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _sig(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark, events_batch):
    batch_df, outdir = events_batch
    schema = batch_df.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(outdir)
    )
    got = _run_stream(spark, tumbling_counts(stream), "t_tumbling", "append")
    # append mode only emits windows the watermark has closed: the window
    # holding max(ts) never finalizes (nothing later advances the
    # watermark), so compare the finalized prefix only
    cutoff = batch_df.agg(F.max("ts")).first()[0]
    want = tumbling_counts(batch_df).where(
        F.col("window_end") <= F.lit(cutoff) - F.expr("INTERVAL 10 MINUTES")
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    got_closed = got.where(
        F.col("window_end") <= F.lit(cutoff) - F.expr("INTERVAL 10 MINUTES")
    )
    assert _sig(got_closed, cols) == _sig(want, cols)
    assert got.count() > 0


def test_sliding_stream_equals_batch(spark, events_batch):
    batch_df, outdir = events_batch
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(outdir)
    )
    got = _run_stream(spark, sliding_counts(stream), "t_sliding", "append")
    cutoff = batch_df.agg(F.max("ts")).first()[0]
    closed = F.col("window_end") <= F.lit(cutoff) - F.expr("INTERVAL 10 MINUTES")
    want = sliding_counts(batch_df).where(closed)
    cols = ["window_start", "window_end", "n_events"]
    assert _sig(got.where(closed), cols) == _sig(want, cols)


def test_session_stream_counts(spark, events_batch):
    batch_df, outdir = events_batch
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "2")  # one batch: sessions finalize once
        .parquet(outdir)
    )
    got = _run_stream(spark, session_counts(stream), "t_session", "append")
    # append mode emits only CLOSED sessions: session_end (last event +
    # 30min gap) <= final watermark (max ts - 10min delay). Compare event
    # totals against the batch window-function sessionization restricted
    # the same way.
    from data_pipeline_agent_spark.plans.registry import REGISTRY

    cutoff = batch_df.agg(F.max("ts")).first()[0]
    batch_sessions = REGISTRY["events_sessionize"].spark(spark, SF)
    want = batch_sessions.where(
        F.col("session_end") + F.expr("INTERVAL 30 MINUTES")
        <= F.lit(cutoff) - F.expr("INTERVAL 10 MINUTES")
    )
    assert got.agg(F.sum("n_events")).first()[0] == want.agg(F.sum("n_events")).first()[0]
    assert got.where("n_events <= 0").count() == 0


def test_stateful_user_lifetime(spark, events_batch):
    batch_df, outdir = events_batch
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(outdir)
    ).select("user_id", "ts", "value")
    got = _run_stream(spark, user_lifetime_stats(stream), "t_state", "update")
    # memory sink in update mode appends each update; take the max per user
    final = got.groupBy("user_id").agg(F.max("lifetime_events").alias("n"))
    want = batch_df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert _sig(final, ["user_id", "n"]) == _sig(want, ["user_id", "n"])


def test_multimodal_image_features(spark):
    from data_pipeline_agent_spark.operators.multimodal import (
        frame_sample,
        image_features,
    )

    rows = [(i, "image", bytes([i]) * (64 * (i + 1)), "png", 8, 8) for i in range(10)]
    df = spark.createDataFrame(
        rows,
        "media_id long, media_type string, content binary, meta_format string, meta_width long, meta_height long",
    )
    feats = image_features(df, fake=True)
    out = feats.collect()
    assert len(out) == 10
    assert all(len(r.feature) == 16 for r in out)
    # determinism: same content -> same feature
    again = {r.media_id: r.feature for r in image_features(df, fake=True).collect()}
    assert all(again[r.media_id] == r.feature for r in out)
    # real path must cleanly signal the missing decoder
    with pytest.raises(Exception, match="PIL|NotImplemented"):
        image_features(df, fake=False).collect()
    frames = frame_sample(df, every_n=5, fake=True)
    assert frames.count() > 10  # multiple frames per video


def test_mm_frame_sample_guard_fails_loud_past_oracle_byte_bound(spark):
    """r8 (verdict task 6): the registered mm_frame_sample query's oracle
    rebuilds the frame-index suffix with single-byte chr(), valid only for
    frame_idx < 128. A blob big enough to cross that (>= 8256 bytes at
    64-byte frames) must fail LOUD with the fix named — never go red on a
    silent oracle hash mismatch. The guard lives inside the consumed f0
    column, so column pruning can't drop it."""
    from data_pipeline_agent_spark.operators.multimodal import frame_sample
    from data_pipeline_agent_spark.plans.queries_multimodal import (
        _feature_contract_cols,
        _guarded_f0,
    )

    big = spark.createDataFrame(
        [(1, "video", b"x" * 9000, "mp4", 8, 8)],
        "media_id long, media_type string, content binary, meta_format string, meta_width long, meta_height long",
    )
    frames = frame_sample(big, every_n=2, fake=True)
    guarded = frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        _guarded_f0(),
        *_feature_contract_cols(),
    )
    with pytest.raises(Exception, match="oracle contract violated"):
        guarded.collect()
    # below the bound the same select is clean
    small = spark.createDataFrame(
        [(1, "video", b"x" * 640, "mp4", 8, 8)],
        "media_id long, media_type string, content binary, meta_format string, meta_width long, meta_height long",
    )
    ok = frame_sample(small, every_n=2, fake=True).select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        _guarded_f0(),
        *_feature_contract_cols(),
    )
    assert ok.count() == 5


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append mode + 10-min watermark: a row arriving AFTER its window's
    state was finalized and evicted must be dropped (bounded state is what
    makes unbounded streams survivable; data later than the watermark is
    the price). The window is closed by an intermediate batch first —
    Spark only drops rows whose window state is already gone, so the late
    row needs to trail the eviction by a full micro-batch."""
    import datetime as dt
    import glob
    import os as _os
    import time as _time

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    outdir = str(tmp_path / "late_stream")
    batches = [
        [(1, t(10, 30), 1, "A", 1.0), (2, t(11, 59), 1, "A", 1.0)],  # open 10:00+11:00
        [(4, t(13, 30), 1, "A", 1.0)],  # advances watermark past 11:00, evicts 10:00
        [(3, t(10, 40), 1, "A", 100.0)],  # very late: window long closed -> dropped
    ]
    prev = []
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(outdir)
        new = set(glob.glob(f"{outdir}/part-*.parquet")) - set(prev)
        # file source orders micro-batches by mtime: force strict ordering
        past = _time.time() - 3600 * (len(batches) - i)
        for f in new:
            _os.utime(f, (past, past))
        prev = glob.glob(f"{outdir}/part-*.parquet")

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(outdir)
    )
    q = (
        tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName("t_watermark_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
    by_start = {r["window_start"]: r for r in spark.table("t_watermark_late").collect()}
    w10 = by_start[dt.datetime(2024, 1, 1, 10, 0)]
    # only the on-time 10:30 row; the late 10:40 row (value=100) is absent
    assert w10["n_events"] == 1
    assert w10["total_value"] == 1.0


def test_streaming_dedup(spark, tmp_path):
    """Duplicate ids across micro-batches collapse to first arrival."""
    import datetime as dt

    from data_pipeline_agent_spark.streaming.windows import dedup_stream

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    outdir = str(tmp_path / "dedup_stream")
    b1 = spark.createDataFrame(
        [(1, t(10, 0), 1, "A", 1.0), (2, t(10, 1), 1, "A", 2.0)], schema
    )
    b2 = spark.createDataFrame(
        [(1, t(10, 2), 1, "A", 99.0), (3, t(10, 3), 1, "A", 3.0)], schema  # dup id=1
    )
    b1.coalesce(1).write.mode("append").parquet(outdir)
    b2.coalesce(1).write.mode("append").parquet(outdir)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(outdir)
    )
    got = _run_stream(spark, dedup_stream(stream), "t_dedup_stream", "append")
    rows = {r["event_id"]: r["value"] for r in got.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] in (1.0, 99.0)  # exactly one survivor for the dup id
    assert got.count() == 3


def test_interval_join_stream_equals_batch(spark, events_batch):
    """Stream-stream interval join (view -> purchase within 30 min) emits
    the same pairs as the identical batch plan. Inner joins with closed
    time bounds emit as matches arrive; pairs whose right side falls
    within the watermark horizon of the stream's end may still be
    buffered, so compare the watermark-closed prefix."""
    from data_pipeline_agent_spark.streaming.joins import followup_within

    batch_df, outdir = events_batch
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(outdir)
    )
    got = _run_stream(
        spark,
        followup_within(stream, horizon="30 minutes", delay="10 minutes"),
        "t_interval_join",
        "append",
    )
    cutoff = batch_df.agg(F.max("ts")).first()[0]
    closed = F.col("next_ts") <= F.lit(cutoff) - F.expr(
        "INTERVAL 40 MINUTES"  # horizon + watermark delay
    )
    want = followup_within(batch_df, horizon="30 minutes", delay="10 minutes")
    cols = ["user_id", "first_ts", "next_ts", "gap_seconds", "next_value"]
    assert _sig(got.where(closed), cols) == _sig(want.where(closed), cols)
    assert want.count() > 0  # the fixture actually exercises the join


def test_streaming_funnel_equals_batch_funnel(spark, tmp_path):
    """The stateful funnel's final per-user stage must reproduce the
    oracle-checked batch funnel counts: users with stage >= k equals the
    batch query's n_users for step k. Single file -> single micro-batch,
    so in-batch event-time sorting gives exact parity."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.plans import REGISTRY
    from data_pipeline_agent_spark.plans.registry import events_table
    from data_pipeline_agent_spark.streaming.funnel import user_funnel_stage

    outdir = str(tmp_path / "funnel_stream")
    ev = events_table(spark, SF).select("user_id", "ts", "event_type")
    ev.coalesce(1).write.mode("append").parquet(outdir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(outdir)
    )
    out = _run_stream(spark, user_funnel_stage(stream), "funnel_mem", "update")
    stages = {r["user_id"]: r["stage"] for r in out.collect()}

    batch = {
        int(r["step_idx"]): int(r["n_users"])
        for r in REGISTRY["events_funnel_conversion"].spark(spark, SF).collect()
    }
    for k, expected in batch.items():
        got = sum(1 for s in stages.values() if s >= k)
        assert got == expected, (k, got, expected)
    # every user with at least one event is represented in state output
    assert len(stages) == ev.select("user_id").distinct().count()


def test_multimodal_audio_features(spark):
    from data_pipeline_agent_spark.operators.multimodal import audio_features

    rows = [(i, "audio", bytes([i % 7]) * (300 * (i + 1)), "wav", 0, 0) for i in range(6)]
    df = spark.createDataFrame(
        rows,
        "media_id long, media_type string, content binary, meta_format string, meta_width long, meta_height long",
    )
    out = audio_features(df, window_bytes=256, fake=True).collect()
    assert len(out) == 6
    for r in out:
        assert len(r.feature) == 16
        assert r.n_windows == -(-r.n_bytes // 256)  # ceil
    # determinism across runs
    again = {r.media_id: r.feature for r in audio_features(df, fake=True).collect()}
    assert all(again[r.media_id] == r.feature for r in out)
    # gated real path signals the missing decoder
    with pytest.raises(Exception, match="soundfile|NotImplemented"):
        audio_features(df, fake=False).collect()


def test_foreachbatch_sink_exactly_once(spark, events_batch, tmp_path):
    """foreachBatch + per-batch dynamic partition overwrite: (1) all input
    rows land exactly once across micro-batches; (2) re-delivering a
    batch (the crash-recovery case) REPLACES its partition instead of
    duplicating it — the idempotence that upgrades at-least-once delivery
    to exactly-once output."""
    from pyspark.sql import functions as F

    from data_pipeline_agent_spark.streaming.sinks import write_stream_exactly_once

    batch_df, outdir = events_batch
    out = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(outdir)
    )
    q = write_stream_exactly_once(stream, out, chk)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == batch_df.count()
    assert got.select("event_id").distinct().count() == batch_df.count()
    n_batches = got.select("batch_id").distinct().count()
    assert n_batches >= 2  # maxFilesPerTrigger=1 over two files

    # simulate re-delivery of batch 0 with identical data: overwrite must
    # replace, not append
    redelivered = got.where("batch_id = 0").drop("batch_id")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        redelivered.withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(out)
    )
    again = spark.read.parquet(out)
    assert again.count() == batch_df.count(), "re-delivered batch duplicated rows"

    # restart from the same checkpoint with no new input: nothing changes
    q2 = write_stream_exactly_once(
        spark.readStream.schema(batch_df.schema).option("maxFilesPerTrigger", "1").parquet(outdir),
        out,
        chk,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == batch_df.count()


def test_streaming_neardup_equals_batch(spark, tmp_path):
    """r11 streaming MinHash near-dup: a two-micro-batch replay of the
    documents corpus (arrival order = ts order = doc_id order, so the
    stream's first-arrival exemplars equal the batch twin's min(ts, id)
    bucket elections) must reproduce the batch frame row-for-row — and
    the batch frame itself is the oracle-checked
    ``dedup_neardup_arrivals`` registry query."""
    from data_pipeline_agent_spark.streaming.neardup import (
        minhash_neardup_batch,
        minhash_neardup_stream,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            "text",
            F.timestamp_seconds(F.col("doc_id") + F.lit(1_000_000_000)).alias(
                "ts"
            ),
        )
    )
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    outdir = str(tmp_path / "neardup_stream")
    docs.where(F.col("doc_id") <= mid).coalesce(1).write.mode("append").parquet(outdir)
    docs.where(F.col("doc_id") > mid).coalesce(1).write.mode("append").parquet(outdir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(outdir)
    )
    out = _run_stream(
        spark, minhash_neardup_stream(stream), "neardup_mem", "append"
    )
    cols = ["doc_id", "exemplar_id", "band", "n_sig_agree", "est_jaccard"]
    got = _sig(out, cols)
    want = _sig(minhash_neardup_batch(docs), cols)
    assert len(want) > 0, "vacuous: no near-dup arrivals at this SF"
    assert got == want, f"stream != batch: {got[:5]} vs {want[:5]}"
    # cross-batch statefulness must actually fire: at least one reported
    # arrival lives in micro-batch 2 with its exemplar from micro-batch 1
    crossed = [
        r
        for r in out.collect()
        if r["doc_id"] > mid and r["exemplar_id"] <= mid
    ]
    assert crossed, "no pair crossed the micro-batch boundary"
