"""Incremental streaming decontamination (streaming/decontam.py):
streamed per-doc bloom verdicts must EQUAL the batch prefilter
query's columns exactly (same int64 hash/bit math), the filter must
never miss a true contamination (no false negatives), and replaying a
micro-batch must change nothing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.data_pipeline import EVAL_SOURCES
from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming.decontam import (
    build_bloom_store,
    foreach_batch_decontam,
    probe_bloom,
    run_decontam_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    return (docs.filter(~is_eval).select("doc_id", "text"),
            docs.filter(is_eval).select("doc_id", "text"))


def _batch_reference(spark):
    from transcript_analysis_spark.plans import all_queries
    q = all_queries()["bloom_prefilter_contamination"]
    return {r["doc_id"]: r for r in q.fn(spark, SF_DIR).collect()}


def test_streamed_verdicts_equal_batch_prefilter(spark, tmp_path, corpus):
    train, eval_docs = corpus
    bloom_dir = str(tmp_path / "bloom")
    out_dir = str(tmp_path / "verdicts")
    n_words = build_bloom_store(train, bloom_dir)
    assert 0 < n_words <= 65536

    # stream the eval split in two halves
    halves = eval_docs.randomSplit([0.5, 0.5], seed=7)
    for bid, half in enumerate(halves):
        foreach_batch_decontam(half, bid, bloom_dir, out_dir)

    got = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    ref = _batch_reference(spark)
    assert set(got) == set(ref)
    for doc_id, r in got.items():
        assert r["n_shingles"] == ref[doc_id]["n_shingles"]
        assert r["n_candidates"] == ref[doc_id]["n_candidates"]


def test_no_false_negatives_and_clean_release(spark, tmp_path, corpus):
    """Docs with true train overlap MUST be flagged as candidates;
    docs with zero candidates are provably clean."""
    train, eval_docs = corpus
    bloom_dir = str(tmp_path / "bloom")
    build_bloom_store(train, bloom_dir)
    verdicts = {r["doc_id"]: r["n_candidates"]
                for r in probe_bloom(eval_docs,
                                     spark.read.parquet(bloom_dir))
                .collect()}
    ref = _batch_reference(spark)
    overlapping = {d for d, r in ref.items() if r["n_overlap"] > 0}
    assert overlapping, "corpus should contain true contamination"
    for d in overlapping:
        assert verdicts[d] > 0
    clean = {d for d, c in verdicts.items() if c == 0}
    for d in clean:
        assert ref[d]["n_overlap"] == 0


def test_replay_is_idempotent(spark, tmp_path, corpus):
    train, eval_docs = corpus
    bloom_dir = str(tmp_path / "bloom")
    out_dir = str(tmp_path / "verdicts")
    build_bloom_store(train, bloom_dir)
    foreach_batch_decontam(eval_docs, 0, bloom_dir, out_dir)
    once = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    foreach_batch_decontam(eval_docs, 0, bloom_dir, out_dir)  # replay
    twice = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert once == twice


def test_writestream_end_to_end(spark, tmp_path, corpus):
    train, eval_docs = corpus
    src = str(tmp_path / "incoming")
    bloom_dir = str(tmp_path / "bloom")
    out_dir = str(tmp_path / "verdicts")
    build_bloom_store(train, bloom_dir)
    eval_docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = run_decontam_stream(stream, bloom_dir, out_dir,
                            str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == eval_docs.count()
    assert {"doc_id", "n_shingles", "n_candidates", "batch_id"} <= set(
        got.columns)
