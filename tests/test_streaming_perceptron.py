"""Streaming perceptron weight store (streaming/perceptron_store.py):
mini-batch training over a versioned table with transactional
per-stream exactly-once batch application. The sixth persisted-store
streaming operator, and the first consumer of the optimistic commit
protocol (the mid-flight interleave is forced for real below)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.sources import versioned
from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming import perceptron_store as ps
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


def test_replay_is_exactly_once_per_stream(spark, tmp_path):
    """A perceptron update is NOT idempotent, so replay safety must
    come from the per-stream transactional batch watermark:
    redelivering an applied batch is a recorded no-op, while ANOTHER
    stream's batch 0 (its own checkpoint numbering) still applies —
    a single global id would have silently dropped it."""
    root = str(tmp_path / "wstore")
    init_weight_store(spark, root)
    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    assert foreach_batch_perceptron(half_a, 0, root, stream_id="s1") is True
    before = read_weights(spark, root)
    # same stream redelivers batch 0 -> no-op, no extra version
    assert foreach_batch_perceptron(half_a, 0, root, stream_id="s1") is False
    after = read_weights(spark, root)
    assert (before.w0, before.w1, before.w2, before.w3, before.n_seen) == \
        (after.w0, after.w1, after.w2, after.w3, after.n_seen)
    assert versioned.latest_version(spark, root) == 2
    # a DIFFERENT stream's batch 0 must still apply
    assert foreach_batch_perceptron(half_b, 0, root, stream_id="s2") is True
    final = read_weights(spark, root)
    assert final.n_seen == docs.count()
    import json
    assert json.loads(final.applied_json) == {"s1": 0, "s2": 0}


def test_midflight_interleave_forces_stale_retry(spark, tmp_path,
                                                 monkeypatch):
    """Drive the StaleBaseError retry path FOR REAL: an interloper
    commit lands between this batch's snapshot read and its commit
    (injected inside the first commit_version call), so the first
    attempt must be REJECTED and the retry must re-derive against the
    fresh state — losing neither the interloper's rows nor this
    batch's update."""
    root = str(tmp_path / "wstore")
    init_weight_store(spark, root)
    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    foreach_batch_perceptron(half_a, 0, root, stream_id="s1")
    w_after_a = read_weights(spark, root)

    real_commit = versioned.commit_version
    state = {"injected": False, "stale_seen": False}

    def inject_then_commit(df, r, base_version=None, **kw):
        if not state["injected"]:
            state["injected"] = True
            # interloper: stream s2 applies ITS batch on the current
            # state while our caller holds a now-stale snapshot
            foreach_batch_perceptron(half_b, 0, root, stream_id="s2")
        try:
            return real_commit(df, r, base_version=base_version, **kw)
        except versioned.StaleBaseError:
            state["stale_seen"] = True
            raise

    monkeypatch.setattr(ps.versioned, "commit_version", inject_then_commit)
    assert foreach_batch_perceptron(half_a, 1, root, stream_id="s1") is True
    monkeypatch.undo()

    assert state["stale_seen"], "the stale-base rejection never fired"
    final = read_weights(spark, root)
    import json
    assert json.loads(final.applied_json) == {"s1": 1, "s2": 0}
    # nothing lost: everyone's row counts are in
    assert final.n_seen == half_a.count() * 2 + half_b.count()
    # and the retried update was derived against the POST-interloper
    # weights: replay the same order in Python
    expect = _python_replay(spark, [half_a, half_b, half_a])
    assert [final.w0, final.w1, final.w2, final.w3] == expect


def test_uninitialized_store_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="not initialized"):
        foreach_batch_perceptron(_docs(spark), 0,
                                 str(tmp_path / "missing"))
