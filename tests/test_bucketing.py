"""Bucketed co-located joins (X12): the write-once shuffle that makes
every downstream equi-join exchange-free — the core join strategy for
the 9,511-models × 73k-transcripts scoring matrix at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.sources import bucketing

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scores = docs.select("doc_id",
                         (F.col("n_chars") % 97).alias("score"))
    bucketing.write_bucketed(docs, "b_docs", ["doc_id"], n_buckets=8,
                             sort_keys=["doc_id"],
                             path=str(tmp_path / "b_docs"))
    bucketing.write_bucketed(scores, "b_scores", ["doc_id"], n_buckets=8,
                             sort_keys=["doc_id"],
                             path=str(tmp_path / "b_scores"))
    yield docs
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    joined = bucketing.cobucketed_join(spark, "b_docs", "b_scores",
                                       on=["doc_id"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, (
        "co-bucketed equi-join must not shuffle either side:\n" + plan)


def test_cobucketed_join_results_match_plain_join(spark, bucketed_pair):
    docs = bucketed_pair
    scores = docs.select("doc_id", (F.col("n_chars") % 97).alias("score"))
    expected = {(r.doc_id, r.score)
                for r in docs.join(scores, "doc_id")
                .select("doc_id", "score").collect()}
    got = {(r.doc_id, r.score)
           for r in bucketing.cobucketed_join(spark, "b_docs", "b_scores",
                                              on=["doc_id"])
           .select("doc_id", "score").collect()}
    assert got == expected


def test_bucketed_scan_prunes_and_pushes(spark, bucketed_pair):
    df = bucketing.read_bucketed(spark, "b_docs") \
        .filter("doc_id = 42").select("doc_id", "n_chars")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan
