"""Incremental islands store (streaming/islands_store.py): streamed
islands equal `islands_flagship`'s batch output row for row under
arbitrary splits AND arbitrary arrival order, replay is a no-op, and
the real writeStream driver produces the same store."""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_analysis_spark.plans.domain import islands_flagship
from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming.islands_store import (
    foreach_batch_islands,
    read_islands,
    run_islands_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_streamed_equals_flagship_any_split_any_order(spark, tmp_path):
    """Three uneven batches delivered OUT of id order must union to
    exactly the registered flagship's output (per-doc math ⇒ order
    cannot matter; this pins it)."""
    idir = str(tmp_path / "islands")
    docs = _docs(spark)
    batches = [docs.filter(F.col("doc_id") % 4 == 3),      # latest ids first
               docs.filter(F.col("doc_id") % 4 < 2),
               docs.filter(F.col("doc_id") % 4 == 2)]
    for bid, b in enumerate(batches):
        foreach_batch_islands(b, bid, idir)
    got = _rows(read_islands(spark, idir))
    want = _rows(islands_flagship(spark, SF_DIR))
    assert got == want
    assert len(got) > 0


def test_replay_is_idempotent(spark, tmp_path):
    idir = str(tmp_path / "islands")
    docs = _docs(spark)
    halves = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    for bid, b in enumerate(halves):
        foreach_batch_islands(b, bid, idir)
    before = _rows(spark.read.parquet(idir))   # batch_id included
    foreach_batch_islands(halves[0], 0, idir)  # crash-redelivery
    after = _rows(spark.read.parquet(idir))
    assert after == before


def test_writestream_driver_equals_flagship(spark, tmp_path):
    """End-to-end through a real AvailableNow foreachBatch stream (one
    parquet file per batch via maxFilesPerTrigger)."""
    src = str(tmp_path / "src")
    idir = str(tmp_path / "islands")
    ckpt = str(tmp_path / "ckpt")
    docs = _docs(spark)
    for i in range(2):
        (docs.filter(F.col("doc_id") % 2 == i).coalesce(1)
         .write.mode("append").parquet(src))
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_islands_stream(stream, idir, ckpt).awaitTermination(120)
    got = _rows(read_islands(spark, idir))
    want = _rows(islands_flagship(spark, SF_DIR))
    assert got == want
