"""As-of join — a custom operator Spark lacks natively (brief §custom
operators; PySpark guide "as-of / range join").

`asof_join(left, right)`: for every left row, attach the nearest
right row with the same key — the most recent at-or-before row
(`direction="backward"`, default) or the earliest at-or-after row
(`direction="forward"`), optionally bounded by `tolerance`
(pd.merge_asof semantics, verified against it in tests).

Implementation: union-then-window, not merge_asof-per-group:
tag both sides, union, and take the last/first non-null right payload
over (key ORDER BY ts, side) — one shuffle on the key, fully
JVM-side, no Python, no per-group pandas. This composes with any
payload width and inherits AQE skew handling on the key column.

Equality-timestamp semantics: a right row AT the same instant as the
left row IS visible in both directions (matching DuckDB's ASOF JOIN
and pd.merge_asof defaults) — enforced by the side tag's sort
position at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def asof_join(left: DataFrame, right: DataFrame,
              key: str, ts: str,
              payload_cols: list[str],
              how: str = "left",
              direction: str = "backward",
              tolerance=None) -> DataFrame:
    """Attach to each `left` row the nearest `right` payload with the
    same `key` (backward: right.ts <= left.ts; forward: right.ts >=
    left.ts). Payload columns are null when no right row qualifies —
    including when the nearest one is further than `tolerance`
    (seconds for timestamp `ts`, plain difference for numeric `ts`).
    `how='inner'` drops unmatched left rows."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    carry = [*payload_cols]
    # The right row travels as ONE struct so the window picks it
    # ATOMICALLY: per-column last/first(ignorenulls) would skip a NULL
    # payload cell and splice in an older row's value — wrong both for
    # tolerance (value from row A validated against row B's ts) and
    # for row integrity (columns mixed across right rows).
    row_struct = F.struct(F.col(ts).alias("rts"),
                          *[F.col(c).alias(c) for c in carry])
    lhs = (left
           .withColumn("__side", F.lit(1 if direction == "backward" else 0))
           .withColumn("__p_row", F.lit(None).cast(
               right.select(row_struct.alias("s")).schema["s"].dataType)))
    rhs = (right.select(key, ts, row_struct.alias("__p_row"))
           .withColumn("__side", F.lit(0 if direction == "backward" else 1)))
    left_cols = [c for c in left.columns]
    unioned = lhs.select(
        *left_cols, "__side", "__p_row"
    ).unionByName(
        rhs.select(
            *[F.col(c) if c in (key, ts)
              else F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_cols],
            "__side", "__p_row"),
        allowMissingColumns=False)
    # Sort-position contract: the qualifying right row at an EQUAL ts
    # must fall inside the left row's window in both directions —
    # backward scans preceding rows (right tagged 0, sorts first);
    # forward scans following rows (right tagged 1, sorts last).
    if direction == "backward":
        w = (Window.partitionBy(key).orderBy(ts, "__side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        picked = F.last("__p_row", ignorenulls=True).over(w)
        left_tag = 1
    else:
        w = (Window.partitionBy(key).orderBy(ts, "__side")
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        picked = F.first("__p_row", ignorenulls=True).over(w)
        left_tag = 0
    filled = unioned.select(*left_cols, "__side", picked.alias("__f_row"))
    out = filled.filter(F.col("__side") == left_tag).drop("__side")
    if tolerance is not None:
        # fractional-second deltas for time-typed columns — NTZ
        # included: the parquet loader yields TIMESTAMP_NTZ, so
        # matching only TimestampType left this branch dead for every
        # real table and tolerance threw DATATYPE_MISMATCH (found by
        # tools/diff_fuzz.py --mode asof, r11). unix_timestamp is not
        # used because it truncates to whole seconds and misjudges
        # sub-second gaps.
        if isinstance(right.schema[ts].dataType,
                      (TimestampType, TimestampNTZType, DateType)):
            # NTZ/date cannot cast to double directly — go through
            # TIMESTAMP first (session tz is pinned UTC, and a
            # difference of two same-typed instants is tz-invariant)
            def _secs(c):
                return c.cast("timestamp").cast("double")
            delta = F.abs(_secs(F.col(ts)) - _secs(F.col("__f_row.rts")))
        else:
            delta = F.abs(F.col(ts) - F.col("__f_row.rts"))
        out = out.withColumn(
            "__f_row", F.when(delta <= F.lit(tolerance), F.col("__f_row")))
    if how == "inner":
        # Matched-ness is the struct itself, NOT any payload column: a
        # qualifying right row whose first payload cell is legitimately
        # NULL is still a match (consistent with the atomic-row
        # semantics above).
        out = out.filter(F.col("__f_row").isNotNull())
    for c in carry:
        out = out.withColumn(f"asof_{c}", F.col(f"__f_row.{c}"))
    return out.drop("__f_row")
