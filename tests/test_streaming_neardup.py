"""Incremental streaming near-dup LSH (streaming/neardup.py): the
streamed pair set must EQUAL the batch LSH query's pairs on the full
corpus, regardless of how the stream is split into micro-batches; and
replaying a micro-batch must change nothing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming.neardup import (
    foreach_batch_neardup,
    neardup_stream,
    read_pairs,
)

SF_DIR = "/root/testdata/sf0.001"

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")


def _batch_pairs(spark):
    from transcript_analysis_spark.plans import all_queries
    q = all_queries()["minhash_lsh_candidate_pairs"]
    return {(r["doc_a"], r["doc_b"])
            for r in q.fn(spark, SF_DIR).collect()}


def _emitted_pairs(spark, pairs_dir):
    return {(r["doc_a"], r["doc_b"]) for r in
            read_pairs(spark, pairs_dir).select("doc_a", "doc_b")
            .distinct().collect()}


@pytest.fixture()
def split_docs(spark, tmp_path):
    """documents split into two single-file micro-batches by doc_id."""
    docs = load_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "docs_stream")
    half = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    for i, part in enumerate([docs.filter(F.col("doc_id") <= half),
                              docs.filter(F.col("doc_id") > half)]):
        stage = f"{d}/stage{i}"
        part.coalesce(1).write.parquet(stage)
        f = [x for x in os.listdir(stage) if x.endswith(".parquet")][0]
        os.rename(f"{stage}/{f}", f"{d}/batch{i}.parquet")
    return d


def test_streamed_pairs_equal_batch_lsh(spark, tmp_path, split_docs):
    bands = str(tmp_path / "bands")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(split_docs))
    q = neardup_stream(stream, bands, pairs, ckpt)
    q.awaitTermination(120)
    assert _emitted_pairs(spark, pairs) == _batch_pairs(spark)
    # every document is banded exactly once (4 bands each)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert spark.read.parquet(bands).count() == 4 * n_docs


def test_replayed_batch_changes_nothing(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    bands = str(tmp_path / "bands")
    pairs = str(tmp_path / "pairs")
    foreach_batch_neardup(docs, 0, bands, pairs)
    before_pairs = _emitted_pairs(spark, pairs)
    before_bands = spark.read.parquet(bands).count()
    # crash-replay: same data, same batch_id
    foreach_batch_neardup(docs, 0, bands, pairs)
    assert _emitted_pairs(spark, pairs) == before_pairs
    assert spark.read.parquet(bands).count() == before_bands


def test_partial_band_append_crash_recovers_all_pairs(spark, tmp_path):
    """Crash window: the previous attempt appended HALF the batch's
    bands and died before writing pairs. The retry must still emit the
    batch's FULL pair set (pairs derive from the whole batch, not the
    unappended remainder) and must not duplicate the stored bands."""
    from transcript_analysis_spark.plans.data_pipeline import minhash_band_keys

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    crashed = str(tmp_path / "crashed_bands")
    pairs = str(tmp_path / "crashed_pairs")
    half = docs.limit(100).select("doc_id")
    (minhash_band_keys(docs).join(half, "doc_id", "left_semi")
     .withColumn("batch_id", F.lit(0))   # the crashed writer's stamp
     .write.parquet(crashed))
    foreach_batch_neardup(docs, 0, crashed, pairs)

    clean_bands = str(tmp_path / "clean_bands")
    clean_pairs = str(tmp_path / "clean_pairs")
    foreach_batch_neardup(docs, 0, clean_bands, clean_pairs)

    assert _emitted_pairs(spark, pairs) == _emitted_pairs(spark, clean_pairs)
    assert (spark.read.parquet(crashed).count()
            == spark.read.parquet(clean_bands).count())


def test_cross_batch_pair_found_when_later_doc_arrives(spark, tmp_path):
    """A duplicate split across batches is caught at the LATER batch
    via the band store, not missed."""
    docs = load_table(spark, SF_DIR, "documents")
    dup = docs.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
        "lang", "source", "n_chars")
    bands = str(tmp_path / "bands")
    pairs = str(tmp_path / "pairs")
    foreach_batch_neardup(docs.limit(1), 0, bands, pairs)
    assert _emitted_pairs(spark, pairs) == set()
    foreach_batch_neardup(dup, 1, bands, pairs)
    emitted = _emitted_pairs(spark, pairs)
    orig = docs.limit(1).first()["doc_id"]
    assert (orig, orig + 1_000_000) in emitted
