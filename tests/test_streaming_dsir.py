"""Incremental DSIR scoring (streaming/dsir_store.py): streamed
per-doc importance must EQUAL the batch query's columns exactly (same
int64-quantized weights on both paths), replaying a micro-batch must
change nothing, and OOV words must contribute zero."""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_analysis_spark.plans.selection import DSIR_TARGET
from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming.dsir_store import (
    build_weight_store,
    foreach_batch_dsir,
    read_scores,
)

SF_DIR = "/root/testdata/sf0.001"

_COLS = ("n_tokens", "importance_e9", "avg_logratio", "target_like")


def _batch_reference(spark):
    from transcript_analysis_spark.plans import all_queries
    q = all_queries()["dsir_importance_weights"]
    return {r["doc_id"]: r for r in q.fn(spark, SF_DIR).collect()}


def test_streamed_scores_equal_batch_query(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "source", "text")
    weights_dir = str(tmp_path / "weights")
    scores_dir = str(tmp_path / "scores")
    vocab = build_weight_store(docs, weights_dir)
    assert vocab > 0

    raw = docs.filter(F.col("source") != DSIR_TARGET)
    halves = raw.randomSplit([0.5, 0.5], seed=11)
    for bid, half in enumerate(halves):
        foreach_batch_dsir(half, bid, weights_dir, scores_dir)

    got = {r["doc_id"]: r for r in read_scores(spark, scores_dir).collect()}
    ref = _batch_reference(spark)
    assert set(got) == set(ref)
    for doc_id, r in got.items():
        for c in _COLS:
            assert r[c] == ref[doc_id][c], (doc_id, c)


def test_replay_is_idempotent(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "source", "text")
    weights_dir = str(tmp_path / "weights")
    scores_dir = str(tmp_path / "scores")
    build_weight_store(docs, weights_dir)
    raw = docs.filter(F.col("source") != DSIR_TARGET)
    halves = raw.randomSplit([0.5, 0.5], seed=11)
    for bid, half in enumerate(halves):
        foreach_batch_dsir(half, bid, weights_dir, scores_dir)
    before = sorted(map(tuple, read_scores(spark, scores_dir).collect()))
    # crash-retry: batch 1 delivered again
    foreach_batch_dsir(halves[1], 1, weights_dir, scores_dir)
    after = sorted(map(tuple, read_scores(spark, scores_dir).collect()))
    assert after == before


def test_oov_words_contribute_zero(spark, tmp_path):
    """A later shard containing words absent from the fitted
    vocabulary: those words add nothing to n_tokens or importance —
    the documented frozen-model contract."""
    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "source", "text")
    weights_dir = str(tmp_path / "weights")
    scores_dir = str(tmp_path / "scores")
    build_weight_store(docs, weights_dir)

    base = (docs.filter(F.col("source") != DSIR_TARGET)
            .orderBy("doc_id").limit(1))
    spiked = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "source",
        F.concat("text", F.lit(" zzqx_unseen zzqx_unseen")).alias("text"))
    foreach_batch_dsir(base.unionByName(spiked), 0, weights_dir, scores_dir)
    rows = {r["doc_id"]: r for r in read_scores(spark, scores_dir).collect()}
    orig_id = base.collect()[0]["doc_id"]
    assert rows[orig_id + 1_000_000]["n_tokens"] == rows[orig_id]["n_tokens"]
    assert rows[orig_id + 1_000_000]["importance_e9"] == \
        rows[orig_id]["importance_e9"]
