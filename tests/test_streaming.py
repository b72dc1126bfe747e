"""Structured Streaming semantics: every streaming plan must converge
to its oracle-checked batch equivalent when the stream is drained.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.streaming import windows as sw

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return sw.events_stream(spark, SF_DIR)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, events_stream):
    got = sw.run_stream_to_memory(
        sw.tumbling_hourly(events_stream), "t_tumbling")
    from transcript_analysis_spark.plans import all_queries
    batch = all_queries()["tumbling_hourly_event_stats"].fn(spark, SF_DIR)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    # append mode only emits windows closed by the final watermark
    wm_cut = got.agg(F.max("window_start")).first()[0]
    assert got.count() > 0
    batch_closed = _rows(batch.filter(F.col("window_start") <= wm_cut), cols)
    got_rows = _rows(got, cols)
    assert set(got_rows) <= set(batch_closed)
    # emitted windows must agree exactly with batch values
    batch_map = {r[:2]: r[2:] for r in batch_closed}
    for r in got_rows:
        assert batch_map[r[:2]] == r[2:]


def test_session_stream_subset_of_batch(spark, events_stream):
    got = sw.run_stream_to_memory(
        sw.session_windows(events_stream), "t_sessions")
    from transcript_analysis_spark.plans import all_queries
    batch = all_queries()["session_windows_per_user"].fn(spark, SF_DIR)
    assert got.count() > 0
    # session_window end = last event + gap; compare (user, start, n, sum)
    got_rows = _rows(got, ["user_id", "session_start_sec", "n_events", "sum_value"])
    batch_rows = set(_rows(batch, ["user_id", "session_start_sec",
                                   "n_events", "sum_value"]))
    missing = [r for r in got_rows if r not in batch_rows]
    assert not missing, f"streaming sessions disagree with batch: {missing[:5]}"


def test_incremental_pending_anti_join(spark):
    cand = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    done = spark.createDataFrame([(i,) for i in range(0, 10, 2)], ["id"])
    pending = sw.incremental_pending(cand, done, ["id"])
    assert sorted(r.id for r in pending.collect()) == [1, 3, 5, 7, 9]


def test_foreach_batch_upsert_idempotent(spark, tmp_path):
    target = str(tmp_path / "sink")
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "v"])
    sw.foreach_batch_upsert(df, 0, target, ["k"])
    out = spark.read.parquet(target)
    assert out.count() == 2


def test_streaming_dedup_across_micro_batches(spark, tmp_path):
    """Incremental exact dedup: later micro-batches must not re-append
    documents whose content already reached the target — including
    re-deliveries of an entire earlier batch (at-least-once replay)."""
    target = str(tmp_path / "deduped")
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        ["doc_id", "text"])
    b2 = spark.createDataFrame(
        [(4, "alpha beta"), (5, "epsilon zeta")], ["doc_id", "text"])
    sw.foreach_batch_dedup_append(b1, 0, target)
    out1 = spark.read.parquet(target)
    assert out1.count() == 2  # within-batch dup dropped
    sw.foreach_batch_dedup_append(b2, 1, target)
    out2 = spark.read.parquet(target)
    assert out2.count() == 3  # cross-batch dup dropped, novel doc kept
    assert sorted(r.text for r in out2.collect()) == \
        ["alpha beta", "epsilon zeta", "gamma delta"]
    # at-least-once replay of batch 2 changes nothing (idempotent)
    sw.foreach_batch_dedup_append(b2, 1, target)
    assert spark.read.parquet(target).count() == 3


def test_streaming_dedup_via_writestream(spark, tmp_path):
    """The same sink driven by a real writeStream over a file source."""
    import functools
    src = str(tmp_path / "incoming")
    target = str(tmp_path / "deduped")
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "three four")],
        ["doc_id", "text"])
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
    q = (stream.writeStream.outputMode("append")
         .foreachBatch(functools.partial(
             sw.foreach_batch_dedup_append, target_path=target))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.read.parquet(target).count() == 2


def test_writestream_foreach_batch_end_to_end(spark, tmp_path):
    """True writeStream.foreachBatch path: stream events through the
    idempotent upsert sink and verify the parquet target converges to
    the batch ground truth."""
    import functools
    from transcript_analysis_spark.sources.tables import load_table
    target = str(tmp_path / "sink")
    stream = sw.events_stream(spark, SF_DIR)
    counts = (stream.groupBy("user_id", "event_type")
              .agg(F.count(F.lit(1)).alias("n")))
    q = (counts.writeStream.outputMode("update")
         .foreachBatch(functools.partial(
             sw.foreach_batch_upsert, target_path=target,
             keys=["user_id", "event_type"]))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # dedupe by key keeping the final update (append-mode file sink
    # accumulates updates; latest n per key wins)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("n"))
    final = (spark.read.parquet(target)
             .withColumn("rk", F.row_number().over(w)).filter("rk = 1"))
    truth = (load_table(spark, SF_DIR, "events")
             .groupBy("user_id", "event_type")
             .agg(F.count(F.lit(1)).alias("n")))
    a = sorted((r.user_id, r.event_type, r.n) for r in final.collect())
    b = sorted((r.user_id, r.event_type, r.n) for r in truth.collect())
    assert a == b


def test_checkpoint_restart_recovery_exactly_once(spark, tmp_path):
    """T2 done-criterion (VERDICT r2 #5): kill a checkpointed query,
    RESTART it from the same checkpoint in a fresh SparkSession, and
    prove exactly-once output through the idempotent upsert sink —
    including a forced REPLAY of the last micro-batch (its commit
    marker is deleted, simulating a crash after the sink ran but
    before the checkpoint committed: the at-least-once window the
    reference's task queue closes with ON CONFLICT,
    `island_worker.py:72-99`)."""
    import functools
    import os
    src = str(tmp_path / "incoming")
    target = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run_query(session):
        stream = session.readStream.schema("k LONG, v STRING").parquet(src)
        q = (stream.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(functools.partial(
                 sw.foreach_batch_upsert, target_path=target, keys=["k"]))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    batch1 = [(k, f"b1-{k}") for k in range(50)]
    spark.createDataFrame(batch1, ["k", "v"]).coalesce(1) \
        .write.mode("append").parquet(src)
    run_query(spark)
    got1 = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got1 == dict(batch1)

    # crash window: sink output landed, checkpoint commit did not.
    commits = [f for f in os.listdir(f"{ckpt}/commits")
               if not f.startswith(".")]
    latest = max(commits, key=int)
    os.remove(f"{ckpt}/commits/{latest}")
    crc = f"{ckpt}/commits/.{latest}.crc"  # local-FS checksum sibling
    if os.path.exists(crc):
        os.remove(crc)
    # new data arrives while "down": keys 40-49 updated, 50-59 new
    batch2 = [(k, f"b2-{k}") for k in range(40, 60)]
    spark.createDataFrame(batch2, ["k", "v"]).coalesce(1) \
        .write.mode("append").parquet(src)

    restarted = spark.newSession()  # fresh session, same checkpoint dir
    run_query(restarted)
    out = spark.read.parquet(target).collect()
    got2 = {r.k: r.v for r in out}
    want = dict(batch1) | dict(batch2)
    assert len(out) == len(want), "batch replay duplicated rows"
    assert got2 == want  # replayed batch 1 rewrote identical values;
    #                      batch 2's updates won for overlapping keys


def test_continuous_hourly_rollup_incremental(spark, tmp_path):
    """T3 at the materialized-view level: the serving table must stay
    equal to the full batch rollup as new files (including LATE rows
    for already-rolled-up hours) stream in through one checkpointed
    query, and only touched hour partitions are rewritten."""
    import functools
    from transcript_analysis_spark.sources.tables import load_table
    src = str(tmp_path / "incoming")
    target = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    all_events = (load_table(spark, SF_DIR, "events")
                  .select("event_id", "user_id", "event_type", "ts", "value")
                  .orderBy("event_id").limit(4000).cache())
    # The late slice carries ONLY ONE event type, into hours that
    # already hold several types: partition replacement coarser than
    # the aggregation key would clobber the other types' rows here
    # (round-2 review finding).
    first = all_events.limit(3000)
    second = all_events.subtract(first).filter("event_type = 'click'")
    all_events = first.unionByName(second)

    def run_available():
        stream = (spark.readStream
                  .schema(all_events.schema)
                  .parquet(src))
        q = (sw.hourly_rollup_stream(stream)
             .writeStream.outputMode("update")
             .option("checkpointLocation", ckpt)
             .foreachBatch(functools.partial(
                 sw.foreach_batch_hourly_rollup, target_path=target))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    def rollup_of(df):
        return sorted(
            (r.hour_sec, r.event_type, r.n_events, r.sum_value)
            for r in sw.hourly_rollup_stream(df).collect())

    first.write.mode("overwrite").parquet(src)
    run_available()
    got1 = sorted((r.hour_sec, r.event_type, r.n_events, r.sum_value)
                  for r in spark.read.parquet(target).collect())
    assert got1 == rollup_of(first)
    # append the late slice; the SAME checkpoint processes only it
    second.write.mode("append").parquet(src)
    run_available()
    got2 = sorted((r.hour_sec, r.event_type, r.n_events, r.sum_value)
                  for r in spark.read.parquet(target).collect())
    assert got2 == rollup_of(all_events)


def test_stream_stream_interval_join_matches_batch(spark, events_stream):
    """Stream-stream interval join (purchase <- preceding clicks) must
    converge to the batch inner-join under the same predicate."""
    from transcript_analysis_spark.sources.tables import load_table
    got = sw.run_stream_to_memory(
        sw.purchase_click_interval_join(events_stream), "t_ssjoin")
    batch_events = load_table(spark, SF_DIR, "events")
    exp = sw.purchase_click_interval_join(batch_events)
    cols = ["p_user", "purchase_id", "click_id", "purchase_value"]
    got_rows = _rows(got, cols)
    exp_rows = _rows(exp, cols)
    assert got_rows, "interval join emitted nothing"
    assert got_rows == exp_rows


def test_native_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops re-delivered rows: a source
    with every event duplicated must emit each event_id once."""
    src = str(tmp_path / "dups")
    from transcript_analysis_spark.sources.tables import load_table
    base = (load_table(spark, SF_DIR, "events")
            .select("event_id", "user_id", "event_type", "ts", "value")
            .limit(2000))
    base.unionByName(base).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    got = sw.run_stream_to_memory(
        sw.deduped_event_stream(stream), "t_native_dedup")
    ids = [r.event_id for r in got.collect()]
    assert len(ids) == len(set(ids)) == base.count()


def test_foreach_batch_enrich_sees_dim_updates(spark, tmp_path):
    """A dimension update between micro-batches is visible to the
    next batch — the live-lookup property a stream-static broadcast
    join pinned at stream start cannot provide."""
    from transcript_analysis_spark.streaming.windows import \
        foreach_batch_enrich

    dim_dir = str(tmp_path / "dim")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame([(1, "bronze"), (2, "silver")],
                          "user_id long, tier string") \
        .write.parquet(dim_dir)

    b0 = spark.createDataFrame([(100, 1), (101, 2)],
                               "event_id long, user_id long")
    foreach_batch_enrich(b0, 0, dim_dir, out_dir)

    # dim update lands between batches: user 1 promoted, user 3 added
    spark.createDataFrame([(1, "gold"), (2, "silver"), (3, "bronze")],
                          "user_id long, tier string") \
        .write.mode("overwrite").parquet(dim_dir)

    b1 = spark.createDataFrame([(102, 1), (103, 3)],
                               "event_id long, user_id long")
    foreach_batch_enrich(b1, 1, dim_dir, out_dir)

    rows = {r.event_id: r.tier
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {100: "bronze", 101: "silver",
                    102: "gold", 103: "bronze"}

    # replay batch 1: same content, no duplication
    foreach_batch_enrich(b1, 1, dim_dir, out_dir)
    assert spark.read.parquet(out_dir).count() == 4


def test_stream_stream_outer_join_flushes_unmatched_at_watermark(
        spark, tmp_path):
    """LEFT OUTER stream-stream join: purchases with no preceding
    click are held in state and emitted ONLY once the watermark
    proves no match can arrive — appending far-future sentinel events
    advances both side's watermarks and flushes them; the flushed set
    must equal the batch left join."""
    from transcript_analysis_spark.sources.tables import load_table
    from transcript_analysis_spark.streaming.windows import \
        purchase_click_outer_join

    src = str(tmp_path / "src")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = (load_table(spark, SF_DIR, "events")
            .select("event_id", "user_id", "event_type", "ts", "value")
            .limit(4000).localCheckpoint(eager=True))
    base.write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(base.schema).parquet(src)
        q = (purchase_click_outer_join(stream).writeStream
             .format("parquet").option("path", target)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    run_once()
    # sentinels: far-future click + purchase for two unused users —
    # they advance BOTH watermarks (global watermark = min of sides)
    far = (base.select(F.max("ts").alias("m"))
           .select(F.expr("m + INTERVAL 6 HOURS").alias("ts"))
           .collect()[0].ts)
    spark.createDataFrame(
        [(9_000_001, 9_000_001, "click", far, 0.0),
         (9_000_002, 9_000_002, "purchase", far, 0.0)],
        schema=base.schema).write.mode("append").parquet(src)
    run_once()

    got = sorted(
        (r.p_user, r.purchase_id, r.click_id)
        for r in spark.read.parquet(target).collect()
        if r.purchase_id < 9_000_000)
    exp = sorted(
        (r.p_user, r.purchase_id, r.click_id)
        for r in purchase_click_outer_join(base).collect())
    assert got == exp
    assert any(c is None for _, _, c in got), \
        "expected at least one unmatched (NULL-click) purchase"


def test_foreach_batch_enrich_sizes_estimate_from_dim_width(
        spark, tmp_path, monkeypatch):
    """The cold (batch-0) row-width estimate grows with the joined dim
    schema — the r9 advice item: enriched rows carry the event PLUS
    the dim columns, so the bare store default undershoots."""
    from transcript_analysis_spark.streaming import store_io, windows

    dim_dir = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "bronze", "x", "y")],
        "user_id long, tier string, seg string, region string") \
        .write.parquet(dim_dir)

    seen = {}
    real = store_io.write_batch_partition

    def spy(df, batch_id, out_dir, **kw):
        seen.update(kw)
        real(df, batch_id, out_dir, **kw)

    monkeypatch.setattr(windows, "write_batch_partition", spy,
                        raising=False)
    # foreach_batch_enrich imports the function inside its body, so
    # patch it at the source module
    monkeypatch.setattr(store_io, "write_batch_partition", spy)
    b0 = spark.createDataFrame([(100, 1)],
                               "event_id long, user_id long")
    windows.foreach_batch_enrich(b0, 0, dim_dir,
                                 str(tmp_path / "out"))
    # 4-column dim: default + 3 joined columns x 32 B
    assert seen["avg_row_bytes"] == store_io.DEFAULT_ROW_BYTES + 96
    assert seen["size_aware"] is True
