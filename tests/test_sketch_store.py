"""Incremental CMS maintenance (streaming/sketch_store.py): the
merged streamed sketch must EQUAL the one-pass batch sketch cell for
cell for any micro-batch split, replays must not double-count, and
estimates drawn from the store must match the batch query's."""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_analysis_spark.plans.sketches import (cms_cells,
                                                      tokens_with_hash)
from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming.sketch_store import (
    estimate_from_store,
    foreach_batch_sketch,
    read_sketch,
    run_sketch_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _cells(df):
    return sorted((r.j, r.bucket, r.cnt) for r in df.collect())


def test_streamed_sketch_equals_batch_sketch(spark, tmp_path):
    """Arbitrary 3-way split: summed deltas == one-pass sketch."""
    docs = _docs(spark)
    cms_dir = str(tmp_path / "cms")
    parts = docs.randomSplit([0.2, 0.5, 0.3], seed=11)
    for bid, p in enumerate(parts):
        foreach_batch_sketch(p, bid, cms_dir)
    batch = cms_cells(tokens_with_hash(docs))
    assert _cells(read_sketch(spark, cms_dir)) == _cells(batch)


def test_replay_does_not_double_count(spark, tmp_path):
    docs = _docs(spark)
    cms_dir = str(tmp_path / "cms")
    foreach_batch_sketch(docs, 0, cms_dir)
    once = _cells(read_sketch(spark, cms_dir))
    foreach_batch_sketch(docs, 0, cms_dir)  # crash-retry replay
    assert _cells(read_sketch(spark, cms_dir)) == once


def test_estimates_from_store_match_batch_query(spark, tmp_path):
    """End to end: estimates against the incrementally-built store
    equal the registered batch query's cms_est column."""
    docs = _docs(spark)
    cms_dir = str(tmp_path / "cms")
    for bid, p in enumerate(docs.randomSplit([0.5, 0.5], seed=3)):
        foreach_batch_sketch(p, bid, cms_dir)

    from transcript_analysis_spark.plans import all_queries
    ref = {r.token: r.cms_est
           for r in all_queries()["cms_heavy_hitters"].fn(spark, SF_DIR)
           .collect()}
    cand = (tokens_with_hash(docs).groupBy("w", "h").count()
            .filter(F.col("w").isin(*ref)).select("w", "h"))
    got = {r.w: r.cms_est
           for r in estimate_from_store(
               cand, read_sketch(spark, cms_dir)).collect()}
    assert got == ref


def test_writestream_end_to_end(spark, tmp_path):
    """The AvailableNow driver maintains the store through a real
    readStream -> foreachBatch run."""
    docs = _docs(spark)
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .parquet(src))
    q = run_sketch_stream(stream, str(tmp_path / "cms"),
                          str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    batch = cms_cells(tokens_with_hash(docs))
    assert _cells(read_sketch(spark, str(tmp_path / "cms"))) == _cells(batch)


# --- HLL register store --------------------------------------------------

def _events(spark):
    return load_table(spark, SF_DIR, "events").select("event_type",
                                                      "user_id")


def test_streamed_hll_registers_equal_batch(spark, tmp_path):
    """Max-merged streamed registers == one-pass batch registers for
    an arbitrary 3-way split (sketch union is register-wise max)."""
    from transcript_analysis_spark.plans.sketches import hll_registers
    from transcript_analysis_spark.streaming.sketch_store import (
        foreach_batch_hll, read_hll_registers)
    ev = _events(spark)
    d = str(tmp_path / "hll")
    for bid, p in enumerate(ev.randomSplit([0.3, 0.4, 0.3], seed=5)):
        foreach_batch_hll(p, bid, d)
    got = sorted(map(tuple, read_hll_registers(spark, d).collect()))
    ref = sorted(map(tuple, hll_registers(ev, "event_type",
                                          "user_id").collect()))
    assert got == ref


def test_hll_store_replay_and_estimates(spark, tmp_path):
    """Replaying a batch changes nothing (max is idempotent), and the
    store's estimates equal the registered batch query's."""
    from transcript_analysis_spark.streaming.sketch_store import (
        estimate_distinct_from_store, foreach_batch_hll)
    ev = _events(spark)
    d = str(tmp_path / "hll")
    halves = ev.randomSplit([0.5, 0.5], seed=9)
    for bid, p in enumerate(halves):
        foreach_batch_hll(p, bid, d)
    once = sorted(map(tuple,
                      estimate_distinct_from_store(spark, d).collect()))
    foreach_batch_hll(halves[0], 0, d)  # crash-retry replay
    assert sorted(map(tuple,
                      estimate_distinct_from_store(spark, d).collect())) \
        == once

    from transcript_analysis_spark.plans import all_queries
    ref = {r.event_type: r.hll_est
           for r in all_queries()["hll_distinct_profile"].fn(spark, SF_DIR)
           .collect()}
    assert dict(once) == ref


def test_sketch_stream_checkpoint_resume_across_runs(spark, tmp_path):
    """Two AvailableNow runs against the SAME checkpoint: the second
    run must fold ONLY the newly-arrived files (the checkpoint proves
    batch 1 is done), and the final merged sketch must equal the
    one-pass batch sketch over everything — the resume path the
    replay tests don't exercise."""
    from transcript_analysis_spark.streaming.sketch_store import (
        read_sketch, run_sketch_stream)
    docs = _docs(spark)
    halves = docs.randomSplit([0.5, 0.5], seed=21)
    src = str(tmp_path / "src")
    cms = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    schema = docs.schema

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = run_sketch_stream(stream, cms, ckpt)
        q.awaitTermination(120)

    halves[0].write.mode("overwrite").parquet(src)
    run()
    n_first = spark.read.parquet(cms).count()
    halves[1].write.mode("append").parquet(src)
    run()  # same checkpoint: resumes, folds only the new files

    merged = read_sketch(spark, cms)
    batch = cms_cells(tokens_with_hash(docs))
    assert _cells(merged) == _cells(batch)
    # the first run's cells were not re-folded into a duplicate batch
    per_batch = (spark.read.parquet(cms)
                 .select("batch_id").distinct().count())
    assert per_batch >= 2 and spark.read.parquet(cms).count() > n_first
