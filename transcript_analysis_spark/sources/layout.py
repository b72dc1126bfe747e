"""Z-order (Morton curve) write layout.

At 100 TB the cheapest query is the one whose files you never open:
parquet footers carry per-column min/max, and a scan with a predicate
skips files whose stats exclude it. Sorting by one column makes ONE
predicate prunable; interleaving the bits of two columns (a Z-order /
Morton curve, the technique behind Delta Lake OPTIMIZE ZORDER BY)
makes BOTH prunable at once — each output file covers a small square
of the (a, b) key space instead of a thin full-width stripe.

``zorder_write`` computes the Z-value with the exact int64 expression
shared with the ``zorder_locality_stats`` query
(plans/scale_ops.py:spark_zvalue), range-partitions on it so each
output file holds one contiguous Z-run, and drops the helper column
on write. tests/test_layout.py reads the parquet footers back and
asserts the per-file min/max spans of BOTH dimensions shrink versus a
round-robin layout of the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.scale_ops import spark_zvalue

_ZCOL = "__zorder_key"


def with_zorder_key(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Append the 32-bit Morton code of (low 16 bits of col_a, low 16
    bits of col_b) as ``__zorder_key``. Both columns must be
    non-negative integers (mod-fold wider domains first)."""
    return df.withColumn(_ZCOL, F.expr(spark_zvalue(col_a, col_b)))


def zorder_write(df: DataFrame, col_a: str, col_b: str, path: str,
                 n_files: int = 16) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of (col_a, col_b). `repartitionByRange` samples the
    Z-value distribution, so files are balanced even when the key
    space is skewed; `sortWithinPartitions` tightens row-group stats
    inside each file."""
    keyed = with_zorder_key(df, col_a, col_b)
    (keyed.repartitionByRange(n_files, _ZCOL)
     .sortWithinPartitions(_ZCOL)
     .drop(_ZCOL)
     .write.mode("overwrite").parquet(path))


def range_sorted_write(df: DataFrame, order_cols: list[str], path: str,
                       n_files: int = 16) -> None:
    """Totally-ordered export: `repartitionByRange` samples the key
    distribution and assigns each output file one contiguous,
    non-overlapping key range; `sortWithinPartitions` orders rows
    inside each file. The result reads back globally sorted by file
    index — without ever running a single-task global sort — and
    parquet footer min/max stats on the leading key are DISJOINT
    across files, so a point/range predicate opens at most the files
    whose range it intersects.

    This is the curriculum-order / time-ordered shard export: a
    trainer streaming files in name order sees documents in
    difficulty/time order, and each file is independently a sorted
    run. One-column counterpart of ``zorder_write`` (which trades
    total order on one key for simultaneous locality on two)."""
    (df.repartitionByRange(n_files, *[F.col(c) for c in order_cols])
     .sortWithinPartitions(*order_cols)
     .write.mode("overwrite").parquet(path))
