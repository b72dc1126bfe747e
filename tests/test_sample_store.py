"""Incremental bottom-k holdout sample store
(streaming/sample_store.py): the merged sample must EQUAL the batch
`uniform_hash_sample` query for any micro-batch split (min-k is a
mergeable order statistic), replays must not change the store, and
each delta must stay bounded at k rows regardless of batch size."""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_analysis_spark.plans.scale_ops import (SAMPLE_K,
                                                       uniform_hash_sample)
from transcript_analysis_spark.streaming.sample_store import (
    batch_sample,
    foreach_batch_sample,
    read_sample,
    run_sample_stream,
)

SF_DIR = "/root/testdata/sf0.001"
DOC_SCHEMA = "doc_id bigint, text string, lang string, n_chars bigint"


def _docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text", "lang", "n_chars"))


def _rows(df):
    return sorted((r.doc_id, r.lang, r.n_chars, r.hv)
                  for r in df.collect())


def _batch_rows(spark):
    return _rows(uniform_hash_sample(spark, SF_DIR))


def test_streamed_sample_equals_batch_query(spark, tmp_path):
    """Arbitrary 3-way split: bottom-k over the per-batch bottom-k
    deltas recovers the registered query's sample exactly."""
    store = str(tmp_path / "sample")
    parts = _docs(spark).randomSplit([0.2, 0.5, 0.3], seed=11)
    for bid, p in enumerate(parts):
        foreach_batch_sample(p, bid, store)
    assert _rows(read_sample(spark, store)) == _batch_rows(spark)


def test_split_invariance_including_empty_batch(spark, tmp_path):
    d = _docs(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for bid, p in enumerate(d.randomSplit([0.9, 0.1], seed=2)):
        foreach_batch_sample(p, bid, a)
    foreach_batch_sample(d, 0, b)
    foreach_batch_sample(d.limit(0), 1, b)  # empty micro-batch
    assert _rows(read_sample(spark, a)) == _rows(read_sample(spark, b))


def test_replay_does_not_change_store(spark, tmp_path):
    store = str(tmp_path / "sample")
    d = _docs(spark)
    parts = d.randomSplit([0.5, 0.5], seed=3)
    foreach_batch_sample(parts[0], 0, store)
    foreach_batch_sample(parts[1], 1, store)
    once = _rows(read_sample(spark, store))
    foreach_batch_sample(parts[0], 0, store)  # crash-retry replay
    assert _rows(read_sample(spark, store)) == once


def test_delta_stays_bounded_at_k(spark, tmp_path):
    """A delta is <= k rows for ANY batch size (here the whole
    corpus, which is much larger than k)."""
    d = _docs(spark)
    assert d.count() > SAMPLE_K
    assert batch_sample(d).count() == SAMPLE_K
    store = str(tmp_path / "sample")
    foreach_batch_sample(d, 0, store)
    import glob
    files = glob.glob(f"{store}/batch_id=0/*.parquet")
    assert files
    per_part = spark.read.parquet(f"{store}/batch_id=0")
    assert per_part.count() == SAMPLE_K


def test_sample_stable_under_corpus_growth(spark, tmp_path):
    """Bottom-k semantics: a doc leaves the sample only when k better
    hashes exist — adding a batch can only REPLACE members with
    smaller-hash ones, never reshuffle arbitrarily."""
    store = str(tmp_path / "sample")
    d = _docs(spark)
    first, second = d.randomSplit([0.5, 0.5], seed=7)
    foreach_batch_sample(first, 0, store)
    before = {r[0]: r[3] for r in _rows(read_sample(spark, store))}
    foreach_batch_sample(second, 1, store)
    after = {r[0]: r[3] for r in _rows(read_sample(spark, store))}
    threshold = max(after.values())
    # every evicted member's hash must exceed the new k-th hash
    evicted = {d_id: hv for d_id, hv in before.items()
               if d_id not in after}
    assert all(hv >= threshold for hv in evicted.values())


def test_streaming_driver_end_to_end(spark, tmp_path):
    """run_sample_stream over a file stream of the corpus reproduces
    the batch query's sample."""
    src = str(tmp_path / "src")
    _docs(spark).repartition(3).write.parquet(src)
    stream = (spark.readStream.schema(DOC_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    store = str(tmp_path / "sample")
    q = run_sample_stream(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _rows(read_sample(spark, store)) == _batch_rows(spark)
