"""As-of join — a custom operator Spark lacks natively (brief §custom
operators; PySpark guide "as-of / range join").

`asof_join(left, right)`: for every left row, attach the most recent
right row with the same key and right.ts <= left.ts.

Implementation: union-then-window, not merge_asof-per-group:
tag both sides, union, and take `last_value(right payload) IGNORE
NULLS` over (key ORDER BY ts, side) — one shuffle on the key, fully
JVM-side, no Python, no per-group pandas. This composes with any
payload width and inherits AQE skew handling on the key column.

Equality-timestamp semantics: a right row AT the same instant as the
left row IS visible (<=, matching DuckDB's ASOF JOIN and
pd.merge_asof defaults) — the right side sorts before the left side
at equal ts via the side tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              key: str, ts: str,
              payload_cols: list[str],
              how: str = "left") -> DataFrame:
    """Attach to each `left` row the latest `right` payload with the
    same `key` and right.ts <= left.ts. Payload columns are null when
    no right row precedes. `how='inner'` drops unmatched left rows."""
    lhs = left.withColumn("__side", F.lit(1))
    for c in payload_cols:
        lhs = lhs.withColumn(f"__p_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        key, ts,
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols]
    ).withColumn("__side", F.lit(0))
    left_cols = [c for c in left.columns]
    unioned = lhs.select(
        *left_cols, "__side", *[f"__p_{c}" for c in payload_cols]
    ).unionByName(
        rhs.select(
            *[F.col(c) if c in (key, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_cols],
            "__side", *[f"__p_{c}" for c in payload_cols]),
        allowMissingColumns=False)
    # right rows (side 0) sort before left rows (side 1) at equal ts,
    # so an equal-instant right row is visible to the left row
    w = (Window.partitionBy(key).orderBy(ts, "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = unioned.select(
        *left_cols, "__side",
        *[F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
          for c in payload_cols])
    out = filled.filter(F.col("__side") == 1).drop("__side")
    for c in payload_cols:
        out = out.withColumnRenamed(f"__f_{c}", f"asof_{c}")
    if how == "inner":
        out = out.dropna(subset=[f"asof_{payload_cols[0]}"])
    return out
