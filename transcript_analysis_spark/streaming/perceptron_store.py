"""Online model maintenance over a document stream — the SIXTH
persisted-store streaming operator (after LSH bands, bloom words, CMS
cells, HLL registers, DSIR weights): mini-batch perceptron weights
kept in a VERSIONED table and advanced transactionally per
micro-batch.

Semantics: each micro-batch applies one batch-perceptron step against
the CURRENT committed weights — update = sum(y*x) over the batch's
misclassified rows (margin <= 0), exactly the arithmetic of
`plans/curation.perceptron_classifier_train`, sharing its
`pct_features_frame` so streamed and batch training see identical
integers. Mini-batch updates are order-dependent (standard for online
learning): given the same batch sequence the final weights replay
exactly in pure Python (tested), and a single batch holding the whole
corpus reproduces the batch trainer's epoch-1 weights bit-for-bit
(tested).

Exactly-once WITHOUT idempotent math: a perceptron update is not
idempotent (replaying a batch would double it), so the store records
the last applied ``batch_id`` INSIDE the committed weights row and
`foreach_batch_perceptron` skips any batch at-or-below it — the
transactional batchId-with-state pattern. Lost updates are impossible
even with a concurrent writer: the commit carries the base version it
read (``commit_version(base_version=...)``, sources/versioned.py) and
retries on ``StaleBaseError`` by re-reading and re-deriving — the
optimistic-concurrency gate this round added, exercised here as a
consumer. At 100 TB each step is one broadcast of the 4-number weight
row + one aggregate over the batch — the streaming form of the
trainer's epoch shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.curation import pct_features_frame
from transcript_analysis_spark.sources import versioned

N_FEATURES = 4
MAX_COMMIT_RETRIES = 5


def init_weight_store(spark: SparkSession, root: str) -> int:
    """Commit version 1: zero weights, no batch applied yet."""
    row = spark.createDataFrame(
        [(0, 0, 0, 0, -1, 0)],
        "w0 long, w1 long, w2 long, w3 long, batch_id long, n_seen long")
    return versioned.commit_version(row, root, base_version=None)


def read_weights(spark: SparkSession, root: str):
    """Latest committed weights row (a pyspark Row)."""
    return versioned.read_snapshot(spark, root).collect()[0]


def _step(feats: DataFrame, w) -> tuple[list[int], int, int]:
    """One mini-batch perceptron step against weights row `w`:
    (updates, n_misclassified, n_rows). Aggregates are a single Spark
    job; the 4 totals are the only driver-side data."""
    margin = F.col("y") * sum(
        (F.lit(int(w[f"w{k}"])) * F.col(f"x{k}") for k in range(1, N_FEATURES)),
        F.lit(int(w["w0"])) * F.col("x0"))
    mis = margin <= 0
    agg = feats.agg(
        *[F.sum(F.when(mis, F.col("y") * F.col(f"x{k}")).otherwise(0))
          .cast("long").alias(f"u{k}") for k in range(N_FEATURES)],
        F.sum(F.when(mis, 1).otherwise(0)).cast("long").alias("err"),
        F.count(F.lit(1)).cast("long").alias("n")).collect()[0]
    upd = [int(agg[f"u{k}"] or 0) for k in range(N_FEATURES)]
    return upd, int(agg["err"] or 0), int(agg["n"] or 0)


def foreach_batch_perceptron(batch_df: DataFrame, batch_id: int,
                             root: str) -> bool:
    """Apply one micro-batch to the versioned weight store. Returns
    True if the batch was applied, False if it was a replay (its id is
    already recorded in the committed state) — the exactly-once
    contract for non-idempotent updates."""
    spark = batch_df.sparkSession
    feats = pct_features_frame(batch_df).localCheckpoint(eager=False)
    last_err: Exception | None = None
    for _ in range(MAX_COMMIT_RETRIES + 1):
        base = versioned.latest_version(spark, root)
        if base is None:
            raise FileNotFoundError(
                f"perceptron store not initialized: {root} "
                f"(call init_weight_store first)")
        w = versioned.read_snapshot(spark, root, base).collect()[0]
        if int(w["batch_id"]) >= batch_id:
            return False                     # replayed batch: no-op
        upd, _err, n = _step(feats, w)
        new_row = spark.createDataFrame(
            [tuple(int(w[f"w{k}"]) + upd[k] for k in range(N_FEATURES))
             + (batch_id, int(w["n_seen"]) + n)],
            "w0 long, w1 long, w2 long, w3 long, batch_id long, n_seen long")
        try:
            versioned.commit_version(new_row, root, base_version=base)
            return True
        except versioned.ConcurrentWriterError as exc:
            last_err = exc                   # re-read, re-derive, retry
    raise last_err  # type: ignore[misc]


def run_perceptron_stream(stream_docs: DataFrame, root: str,
                          checkpoint_dir: str):
    """Drive the store from a streaming (doc_id, lang, text, n_chars)
    source with Trigger.AvailableNow (drain-what-exists; rerunnable)."""
    return (stream_docs.writeStream
            .foreachBatch(lambda df, bid:
                          foreach_batch_perceptron(df, bid, root))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
