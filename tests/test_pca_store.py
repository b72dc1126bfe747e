"""Incremental PCA moment store (streaming/pca_store.py): the
trajectory derived from streamed moment deltas must EQUAL the batch
power-iteration query row for row for any micro-batch split, replays
must not double-count, and the store must stay bounded (<= 2145 rows
per batch regardless of batch size)."""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_analysis_spark.plans.sketches import power_iteration_top_pc
from transcript_analysis_spark.streaming.pca_store import (
    batch_moments,
    foreach_batch_pca,
    read_moments,
    run_pca_stream,
    trajectory_from_store,
)

SF_DIR = "/root/testdata/sf0.001"


def _vecs(spark):
    return (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("vec_id", "embedding"))


def _batch_rows(spark):
    return sorted(
        (r.round_id, r.dir_q, r.scale_m)
        for r in power_iteration_top_pc(spark, SF_DIR).collect())


def test_streamed_trajectory_equals_batch_query(spark, tmp_path):
    """Arbitrary 3-way split: moments merged across batches yield the
    EXACT batch trajectory — s = Y^T(Yw) = (Y^T Y)w associativity in
    exact integers."""
    store = str(tmp_path / "pca")
    parts = _vecs(spark).randomSplit([0.2, 0.5, 0.3], seed=11)
    for bid, p in enumerate(parts):
        foreach_batch_pca(p, bid, store)
    assert sorted(trajectory_from_store(spark, store)) == \
        _batch_rows(spark)


def test_split_invariance(spark, tmp_path):
    """A different split (including an empty batch) produces the
    identical merged moments and trajectory."""
    v = _vecs(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for bid, p in enumerate(v.randomSplit([0.9, 0.1], seed=2)):
        foreach_batch_pca(p, bid, a)
    foreach_batch_pca(v, 0, b)
    foreach_batch_pca(v.limit(0), 1, b)  # empty micro-batch
    ma = sorted((r.i, r.j, int(r.s))
                for r in read_moments(spark, a).collect())
    mb = sorted((r.i, r.j, int(r.s))
                for r in read_moments(spark, b).collect())
    assert ma == mb
    assert trajectory_from_store(spark, a) == \
        trajectory_from_store(spark, b)


def test_replay_does_not_double_count(spark, tmp_path):
    store = str(tmp_path / "pca")
    v = _vecs(spark)
    foreach_batch_pca(v, 0, store)
    once = trajectory_from_store(spark, store)
    foreach_batch_pca(v, 0, store)  # crash-retry replay
    assert trajectory_from_store(spark, store) == once


def test_store_stays_bounded(spark, tmp_path):
    """Moment deltas are corpus-size-independent: 1 + 64 + 2080 rows
    for any non-empty batch."""
    m = batch_moments(_vecs(spark))
    assert m.count() == 1 + 64 + 64 * 65 // 2


def test_empty_store_short_circuits(spark, tmp_path):
    store = str(tmp_path / "pca")
    foreach_batch_pca(_vecs(spark).limit(0), 0, store)
    assert trajectory_from_store(spark, store) == []


def test_streaming_driver_end_to_end(spark, tmp_path):
    """run_pca_stream over a rate-limited file stream of the corpus
    reproduces the batch trajectory."""
    src = str(tmp_path / "src")
    _vecs(spark).repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(
        "vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1).parquet(src))
    store = str(tmp_path / "pca")
    q = run_pca_stream(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert sorted(trajectory_from_store(spark, store)) == \
        _batch_rows(spark)
