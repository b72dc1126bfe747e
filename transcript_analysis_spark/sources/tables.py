"""Parquet table loaders for the synthetic corpus.

The driver corpus (TESTDATA.md) is one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``. Reads are plain
``spark.read.parquet`` so Catalyst gets full predicate pushdown /
column pruning; at cluster scale the same call reads a partitioned
directory tree unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs every query depends on, set defensively because
    the driver's verify harness may run queries under its own
    SparkSession (not session.py's):

    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS). Spark
      <= 4.0 cannot read that natively (the scan throws
      PARQUET_TYPE_ILLEGAL without this flag, and with it surfaces
      LongType nanos, converted below). Spark 4.1+ ignores the flag
      and reads nanos directly as TIMESTAMP_NTZ (truncated to micros)
      — callers must treat ts as NTZ: `unix_timestamp(ts)` works,
      numeric casts like `cast(ts as long)` do NOT.
    - UTC session timezone: date_format/unix_timestamp outputs must
      match the DuckDB oracle's UTC-naive timestamps.

    Both are runtime-settable SQL confs; setting them repeatedly is
    free.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), surfaced as long nanos
        # via spark.sql.legacy.parquet.nanosAsLong; expose a proper
        # microsecond timestamp column (floor-truncated, UTC).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def fanout(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to engage every core.

    The driver corpus ships one small parquet file per table, which
    Spark scans as a single partition — any compute-heavy per-row work
    (array smoothing, shingling, scoring) would run on one core. At
    production scale the scan has thousands of splits and this is a
    no-op decision; for single-file inputs the tiny shuffle (the raw
    rows) buys full parallelism for everything downstream.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql plans)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def describe_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog introspection — the reference's `inspect_schema.py:33-87`
    (per-table columns, row counts, physical layout) over the corpus
    catalog.

    Row counts and file layout come from the parquet FOOTERS
    (pyarrow.dataset driver-side metadata walk): exact and free — no
    Spark job, no scan, the same trick a catalog service uses. That is
    deliberate: at 100 TB a `count(*)` fleet-scan per table to answer
    a metadata question is the wrong plan; footer row-group counts are
    already exact. The result is a bounded (one row per table) local
    frame — catalog metadata, not data.
    """
    import pyarrow.dataset as pads

    rows = []
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        ds = pads.dataset(os.path.join(sf_dir, f"{name}.parquet"),
                          format="parquet")
        n_rows, n_files, n_bytes = 0, 0, 0
        for frag in ds.get_fragments():
            md = frag.metadata          # parquet footer
            n_rows += md.num_rows
            n_files += 1
            # size via the dataset's OWN filesystem (works for
            # hdfs/s3 URIs, not just local paths — r8 advice item)
            n_bytes += ds.filesystem.get_file_info(frag.path).size
        rows.append((
            name,
            len(df.columns),
            ", ".join(f"{f.name}:{f.dataType.simpleString()}"
                      for f in df.schema.fields),
            n_rows, n_files, n_bytes,
        ))
    schema = ("table_name string, n_columns int, columns string, "
              "row_count long, n_files int, total_bytes long")
    return spark.createDataFrame(sorted(rows), schema)
