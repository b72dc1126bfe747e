"""Streaming perceptron weight store (streaming/perceptron_store.py):
mini-batch training over a versioned table with transactional
exactly-once batch application. The sixth persisted-store streaming
operator, and the first consumer of the optimistic commit protocol."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.sources import versioned
from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming.perceptron_store import (
    foreach_batch_perceptron,
    init_weight_store,
    read_weights,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return (load_table(spark, SF_DIR, "documents")
            .select("doc_id", "lang", "text", "n_chars"))


def _python_replay(spark, batches):
    """Pure-Python mini-batch perceptron over the same splits, using
    the same quantized integer features."""
    from transcript_analysis_spark.plans.curation import PCT_SCALE
    from transcript_analysis_spark.plans.data_pipeline import _STOPWORDS
    S = PCT_SCALE
    w = [0, 0, 0, 0]
    for b in batches:
        upd = [0, 0, 0, 0]
        for r in b.collect():
            words = r.text.split(" ")
            nw = max(len(words), 1)
            nst = sum(1 for t in words if t in _STOPWORDS)
            nlong = sum(1 for t in words if len(t) >= 8)
            y = 1 if r.lang == "en" else -1
            x = [S,
                 (2 * S * nst + nw) // (2 * nw),
                 (2 * S * nlong + nw) // (2 * nw),
                 min((2 * S * r.n_chars + 8 * nw) // (16 * nw), 2 * S)]
            if y * sum(a * b_ for a, b_ in zip(w, x)) <= 0:
                for j in range(4):
                    upd[j] += y * x[j]
        w = [a + u for a, u in zip(w, upd)]
    return w


def test_streamed_weights_replay_exactly_in_python(spark, tmp_path):
    root = str(tmp_path / "wstore")
    init_weight_store(spark, root)
    docs = _docs(spark)
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for bid, b in enumerate(batches):
        assert foreach_batch_perceptron(b, bid, root) is True
    got = read_weights(spark, root)
    expect = _python_replay(spark, batches)
    assert [got.w0, got.w1, got.w2, got.w3] == expect
    assert got.batch_id == 2
    assert got.n_seen == docs.count()


def test_single_batch_equals_batch_trainer_epoch1(spark, tmp_path):
    """The whole corpus in one micro-batch, starting from zeros, must
    reproduce the batch trainer's epoch-1 weights bit-for-bit —
    streamed and batch training share one feature/update definition."""
    from transcript_analysis_spark.plans.curation import (_pct_epoch_frames,
                                                          _pct_features)
    root = str(tmp_path / "wstore")
    init_weight_store(spark, root)
    foreach_batch_perceptron(_docs(spark), 0, root)
    got = read_weights(spark, root)
    e1 = _pct_epoch_frames(spark, _pct_features(spark, SF_DIR))[0].collect()[0]
    assert [got.w0, got.w1, got.w2, got.w3] == \
        [e1.w0, e1.w1, e1.w2, e1.w3]


def test_replay_is_exactly_once(spark, tmp_path):
    """A perceptron update is NOT idempotent, so replay safety must
    come from the transactional batch_id: redelivering an applied
    batch is a recorded no-op."""
    root = str(tmp_path / "wstore")
    init_weight_store(spark, root)
    docs = _docs(spark)
    assert foreach_batch_perceptron(docs, 0, root) is True
    before = read_weights(spark, root)
    assert foreach_batch_perceptron(docs, 0, root) is False   # replay
    after = read_weights(spark, root)
    assert (before.w0, before.w1, before.w2, before.w3, before.n_seen) == \
        (after.w0, after.w1, after.w2, after.w3, after.n_seen)
    # and no extra version was committed for the no-op
    assert versioned.latest_version(spark, root) == 2


def test_concurrent_commit_retries_without_lost_update(spark, tmp_path):
    """Interleaved writer: another commit lands between this batch's
    read and its commit. The store must re-read and re-derive (the
    StaleBaseError retry path), losing neither the interloper's
    n_seen bump nor this batch's update."""
    root = str(tmp_path / "wstore")
    init_weight_store(spark, root)
    docs = _docs(spark)
    foreach_batch_perceptron(docs.filter(F.col("doc_id") % 2 == 0), 0, root)

    # interloper: manually commit a bumped state as if another stream
    # applied batch 1 (valid base = current latest)
    base = versioned.latest_version(spark, root)
    w = read_weights(spark, root)
    bumped = spark.createDataFrame(
        [(w.w0 + 7, w.w1, w.w2, w.w3, 1, w.n_seen + 10)],
        "w0 long, w1 long, w2 long, w3 long, batch_id long, n_seen long")
    versioned.commit_version(bumped, root, base_version=base)

    # our batch 2 must apply on TOP of the interloper's state
    n2 = docs.filter(F.col("doc_id") % 2 == 1)
    assert foreach_batch_perceptron(n2, 2, root) is True
    final = read_weights(spark, root)
    assert final.batch_id == 2
    assert final.n_seen == w.n_seen + 10 + n2.count()


def test_uninitialized_store_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="not initialized"):
        foreach_batch_perceptron(_docs(spark), 0,
                                 str(tmp_path / "missing"))
