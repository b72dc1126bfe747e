"""Bucketed tables — co-located joins without a shuffle (SURVEY §4
X12's CLUSTER analog taken to its Spark conclusion).

At 100 TB the dominant cost of the scoring/dedup joins is the
exchange: every `join` on doc_id re-shuffles the full corpus. Spark's
answer is bucketing: write both sides `bucketBy(N, key)` once, and
every subsequent equi-join on that key reads matching buckets
pair-wise — `.explain` shows SortMergeJoin with NO Exchange on either
side. The write-side shuffle is paid once, then amortized over every
downstream join (scoring runs per model; the reference re-reads the
same transcripts 9,511 times — `BASELINE.md`).

Bucketed tables must live in the session catalog (`saveAsTable`);
plain `.parquet(path)` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, keys: list[str],
                   n_buckets: int = 32,
                   sort_keys: list[str] | None = None,
                   path: str | None = None) -> None:
    """One-time bucketed write: the amortized shuffle. `sort_keys`
    additionally sorts within buckets so downstream sort-merge joins
    skip their sort as well. `path` makes it an external table (data
    outside the warehouse dir)."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, *keys))
    if sort_keys:
        w = w.sortBy(*sort_keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table with its bucket metadata (bucket-aware
    scans require the catalog path, not the raw files)."""
    return spark.table(table_name)


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    on: list[str], how: str = "inner") -> DataFrame:
    """Equi-join of two tables bucketed on the join key with equal
    bucket counts: Catalyst plans it exchange-free (asserted in
    tests/test_bucketing.py). Broadcast is disabled for the join so
    the bucket path is actually exercised even on small test data."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    # hint: prefer merge join so AQE doesn't broadcast the small test
    # side and hide the bucket co-location being demonstrated
    return left.hint("merge").join(right.hint("merge"), on, how)
