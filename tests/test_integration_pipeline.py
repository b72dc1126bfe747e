"""End-to-end integration: the islands production loop — compute ->
partitioned write -> incremental pending derivation -> top-up — i.e.
the reference's whole worker fleet (`island_worker.py:187-226`) as
three engine calls.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_analysis_spark.operators import islands as isl
from transcript_analysis_spark.plans.domain import _scored_documents
from transcript_analysis_spark.sources import sinks
from transcript_analysis_spark.streaming.windows import incremental_pending

SF_DIR = "/root/testdata/sf0.001"


def _islands_for(scored):
    sm = isl.smooth_scores(scored, score_col="raw", out_col="smoothed")
    return isl.find_islands(sm, keys=["doc_id", "model_id"],
                            score_col="raw", smoothed_col="smoothed")


def test_islands_incremental_loop(spark, tmp_path):
    out = str(tmp_path / "islands")
    scored = _scored_documents(spark, SF_DIR)

    # round 1: process only models 0-2 (simulates partial fleet progress)
    first = _islands_for(scored.filter(F.col("model_id") <= 2))
    sinks.write_append(first, out, partition_by=["model_id"],
                       sort_by=["doc_id", "start_index"])

    # pending = expected pairs minus pairs already having islands (T1)
    expected = scored.select("doc_id", "model_id").distinct()
    done = spark.read.parquet(out).select("doc_id", "model_id").distinct()
    pending = incremental_pending(expected, done, ["doc_id", "model_id"])
    pending_models = {r.model_id for r in
                      pending.select("model_id").distinct().collect()}
    # every unprocessed model is pending; processed models pending only
    # for docs that produced no islands
    assert {3, 4} <= pending_models

    # round 2: top-up exactly the pending pairs
    second = _islands_for(
        scored.join(pending, ["doc_id", "model_id"], "left_semi"))
    sinks.write_append(second, out, partition_by=["model_id"],
                       sort_by=["doc_id", "start_index"])

    # converged: full recompute equals the incrementally-built table
    full = _islands_for(scored)
    built = spark.read.parquet(out)
    cols = ["doc_id", "model_id", "start_index", "end_index"]
    a = sorted(tuple(r[c] for c in cols) for r in full.select(cols).collect())
    b = sorted(tuple(r[c] for c in cols) for r in built.select(cols).collect())
    assert a == b

    # idempotent replace: re-running one model's partition changes nothing
    redo = _islands_for(scored.filter(F.col("model_id") == 1))
    sinks.replace_partitions(redo, out, partition_by=["model_id"],
                             sort_by=["doc_id", "start_index"])
    again = sorted(tuple(r[c] for c in cols)
                   for r in spark.read.parquet(out).select(cols).collect())
    assert again == a
