"""Driver contract for the spark-graft builder (PySpark target).

Everything is delegated to the query registry
(`transcript_analysis_spark/plans/registry.py`): each implemented
operator from SURVEY.md §2 registers a Spark callable plus (when
SQL-expressible) a DuckDB oracle. This file just adapts the registry
to the driver's three-function interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transcript_analysis_spark.plans import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The islands pipeline (SURVEY §7.5): Gaussian smooth -> gaps-and-
    islands -> word ranges -> segment time ranges -> average score.
    """
    q = all_queries()["islands_flagship"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
