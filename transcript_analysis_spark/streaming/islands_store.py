"""Incremental islands maintenance — the TENTH persisted-store
streaming operator, closing the reference's own №1 incremental
workload.

The reference's islands product is operationally incremental: a task
queue seeds (vid, model) pairs (`setup_island_tables.py:93-152`) and
`island_worker.py:72-99,150-184` claims and processes them forever as
new score rows land — smooth, find_islands, map to word/time ranges,
upsert the islands for just those pairs. This store is the Spark
restatement: per micro-batch of newly-arrived documents, run the
REGISTERED flagship chain (`plans/domain.islands_from_docs` — the
exact operators `islands_flagship` is driver-hash-green on, imported
not reimplemented) over just the batch's docs and land the resulting
island rows as a ``batch_id=N`` partition.

Why batch_id partition overwrite alone is exactly-once here: islands
for a (doc, model) pair are a pure function of that one doc's text —
no cross-doc state, unlike the near-dup band store — so every doc's
islands are final the moment its batch lands, arrival ORDER is
irrelevant (no tombstone channel needed), and a crash-redelivered
batch rewrites its own partition byte-identically (the ivf_store
discipline: idempotent math ⇒ dynamic partition overwrite).

Equivalence contract (tests/test_streaming_islands.py +
tools/pipeline_probe.py at sf0.1): for ANY split of the corpus into
micro-batches, in ANY order, the union of batch partitions equals
`islands_flagship`'s batch output row for row, and replaying an
already-applied batch changes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.domain import islands_from_docs

ISLAND_COLS = ("doc_id", "model_id", "start_index", "end_index",
               "word_start", "word_end", "time_start_sec",
               "time_end_sec", "average_score")


def islands_for_batch(batch_docs: DataFrame) -> DataFrame:
    """Island rows for one micro-batch of (doc_id, text) documents —
    the registered flagship chain over just these docs."""
    return islands_from_docs(batch_docs.select("doc_id", "text"))


def foreach_batch_islands(batch_df: DataFrame, batch_id: int,
                          islands_dir: str) -> None:
    """Compute and land one batch's islands as a batch_id partition
    (dynamic overwrite ⇒ replay-idempotent)."""
    spark = batch_df.sparkSession
    out = (islands_for_batch(batch_df)
           .withColumn("batch_id", F.lit(int(batch_id)))
           .coalesce(1))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (out.write.mode("overwrite").partitionBy("batch_id")
         .parquet(islands_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_islands(spark: SparkSession, islands_dir: str) -> DataFrame:
    """All maintained island rows (flagship columns; batch_id kept for
    store maintenance, dropped here for the product view)."""
    return spark.read.parquet(islands_dir).select(*ISLAND_COLS)


def run_islands_stream(stream_docs: DataFrame, islands_dir: str,
                       checkpoint_dir: str):
    """AvailableNow foreachBatch driver for standalone use (inside the
    composed pipeline the store is driven by
    `pipeline.foreach_batch_corpus_pipeline` instead)."""
    return (stream_docs.writeStream
            .foreachBatch(lambda df, bid: foreach_batch_islands(
                df, bid, islands_dir))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
