"""Shared persisted-store write discipline.

Every batch_id-partitioned store lands its micro-batch the same way:
stamp the batch id, coalesce small outputs, write with DYNAMIC
partition overwrite (so a crash-redelivered batch rewrites exactly its
own partition), restoring the session's overwrite mode afterwards.
One implementation here; pipeline.py and islands_store.py both call
it (the review caught three hand-rolled copies drifting apart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_batch_partition(df: DataFrame, batch_id: int, out_dir: str,
                          coalesce: int | None = None) -> None:
    spark = df.sparkSession
    out = df.withColumn("batch_id", F.lit(int(batch_id)))
    if coalesce:
        out = out.coalesce(coalesce)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (out.write.mode("overwrite").partitionBy("batch_id")
         .parquet(out_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
