"""SparkSession factory with scale-appropriate defaults.

The engine targets a large multi-executor cluster; tests run on
``local[N]``. Every setting here is chosen to behave identically in
both shapes:

- AQE on (runtime coalesce + skew-join splitting survive a 100x
  scale-up where static partition counts would not).
- Arrow on (vectorized pandas UDF / toPandas path).
- UTC session timezone (parity with parquet/DuckDB UTC-naive
  timestamps — see pitfalls in the PySpark docs).
- shuffle partitions sized by env for local runs; on a real cluster
  AQE coalesces the 2x-overprovisioned default down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "transcript-analysis-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(cpus)))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Shuffled-hash over sort-merge when the per-partition build
        # side fits (guide: joins §3.1 / config §9): skips both sort
        # passes. r13 interleaved A/B at sf0.1: pagerank −11%, bloom
        # −28%, corpus_release_prep −13% (min-of-5, same-sitting
        # alternation). Scale-safe: the planner still requires its
        # build-side size conditions, AQE skew-split stays on, and
        # SMJ remains available via SPARK_PREFER_SMJ=true for
        # memory-constrained deployments.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_PREFER_SMJ", "false"))
        # Let AQE rewrite runtime sort-merge joins to shuffled-hash
        # when every post-shuffle partition's build side fits in 64 MB
        # (default 0 = never; guide §3.1). Catches the joins whose
        # STATIC size estimates overshoot (post-aggregation tables):
        # r13 interleaved A/B at sf0.1 read pagerank −21%,
        # ngram_model_score −32%, mllib_lsh −9% on min-of-5. 64 MB
        # per-partition is conservative against executor memory at
        # cluster scale; override via SPARK_AQE_SHJ_THRESHOLD.
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_AQE_SHJ_THRESHOLD", "67108864"))
        # Keep broadcast autodetection on; 10MB default is fine for the
        # dims here (region/nation/kernel tables are tiny).
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS); read as long and
        # convert in the loader (Spark has no nanos timestamp type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
