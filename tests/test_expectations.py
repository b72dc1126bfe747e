"""Data-quality expectations: single-pass violation counting and
write gating."""

from __future__ import annotations

import pytest

from transcript_analysis_spark.functions import expectations as ex

SF_DIR = "/root/testdata/sf0.001"


def test_clean_table_passes_all(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    report = ex.check(docs, [
        ex.non_null("doc_id"),
        ex.unique("doc_id"),
        ex.in_range("n_chars", 0, 10_000_000),
        ex.accepted_values("lang", ["en", "de", "es", "fr", "zh"]),
        ex.matches("source", r"^src\d+$"),
    ], raise_on_failure=True)
    assert all(v == 0 for v in report.values())


def test_violations_counted_and_raised(spark):
    df = spark.createDataFrame(
        [(1, "en", 5), (1, "xx", -2), (None, "en", 3)],
        ["id", "lang", "n"])
    report = ex.check(df, [
        ex.non_null("id"),
        ex.unique("id"),
        ex.in_range("n", 0, 100),
        ex.accepted_values("lang", ["en", "de"]),
    ])
    assert report["non_null(id)"] == 1
    # 3 rows, 2 distinct (1, 1, NULL -> {1, NULL}): one extra row
    assert report["unique(id)"] == 1
    assert report["in_range(n, 0, 100)"] == 1
    assert report["accepted_values(lang)"] == 1
    with pytest.raises(ValueError, match="non_null"):
        ex.check(df, [ex.non_null("id")], raise_on_failure=True)


def test_single_pass_plan(spark):
    """All expectations must compile into ONE aggregate over the
    input — no per-expectation scans."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    agg = docs.agg(*[e.violations.alias(f"e{i}") for i, e in enumerate([
        ex.non_null("doc_id"), ex.in_range("n_chars", 0, 10)])])
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
