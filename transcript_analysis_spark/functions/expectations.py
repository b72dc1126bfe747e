"""Data-quality expectations — declarative checks a pipeline runs
against a DataFrame before publishing it (the dbt-test / Delta
constraint pattern, engine-side).

Each expectation compiles to ONE aggregate over the input (all
expectations for a table evaluate in a single pass — no per-check
scans), returns violation counts, and `check()` raises with every
failed expectation named. Designed for gating sink writes:

    report = check(df, [non_null("doc_id"), unique("doc_id"),
                        in_range("n_chars", 0, 10_000_000)],
                   raise_on_failure=True)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    violations: Column  # aggregate expression counting violating rows


def non_null(col: str) -> Expectation:
    return Expectation(
        f"non_null({col})",
        F.count(F.when(F.col(col).isNull(), 1)))


def unique(*cols: str) -> Expectation:
    """Rows beyond the first per key are violations (0 = key is
    unique). count(*) - count(distinct key) counts them in the same
    single pass as the other expectations."""
    key = F.struct(*[F.col(c) for c in cols])
    return Expectation(
        f"unique({', '.join(cols)})",
        F.count(F.lit(1)) - F.countDistinct(key))


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range({col}, {lo}, {hi})",
        F.count(F.when(F.col(col).isNotNull()
                       & ((F.col(col) < lo) | (F.col(col) > hi)), 1)))


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches({col}, {pattern})",
        F.count(F.when(F.col(col).isNotNull()
                       & ~F.col(col).rlike(pattern), 1)))


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(
        f"accepted_values({col})",
        F.count(F.when(F.col(col).isNotNull()
                       & ~F.col(col).isin(values), 1)))


def check(df: DataFrame, expectations: list[Expectation],
          raise_on_failure: bool = False) -> dict[str, int]:
    """Evaluate all expectations in ONE aggregation pass. Returns
    {expectation name: violation count}; raises ValueError naming
    every failed expectation when `raise_on_failure`."""
    row = df.agg(*[e.violations.cast("long").alias(f"e{i}")
                   for i, e in enumerate(expectations)]).first()
    report = {e.name: row[f"e{i}"] for i, e in enumerate(expectations)}
    failed = {k: v for k, v in report.items() if v}
    if failed and raise_on_failure:
        raise ValueError(f"data-quality expectations failed: {failed}")
    return report
