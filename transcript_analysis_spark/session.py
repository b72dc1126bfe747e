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
        # The r13 SHJ-preference pair (preferSortMergeJoin=false +
        # adaptive.maxShuffledHashJoinLocalMapThreshold=64m) was
        # REMOVED in r14: post-execution AQE final plans for every
        # query the r13 A/B cited (pagerank, ngram, mllib_lsh, bloom,
        # corpus_release_prep, training_data_prep) contain ZERO
        # ShuffledHashJoin and are node-for-node identical with and
        # without the confs (plans/r14/*), and a null A/B (identical
        # builders in both arms) reproduced the r13 "wins" as a
        # first-position harness artifact (tools/ab_bench.py r14
        # note). Defaults also remove the documented risk of a
        # non-spilling SHJ build side OOMing on a size underestimate
        # at cluster scale (r13 ADVICE item 1).
        # Whole-stage-codegen compiled-class cache (default 100
        # entries). A null A/B in r14 found a deterministic +45%
        # penalty on a heavy query whenever a DIFFERENT heavy query
        # ran in between (ngram after bloom: 4.7 s vs 3.2 s after
        # itself) — the two queries' ~30+ codegen units thrash the
        # 100-entry cache and every miss pays a driver-side Janino
        # recompile before the stage launches (guide §7.3: plan/
        # compile time as the bottleneck). 3000 entries holds the
        # whole 191-query registry's codegen units; memory is bounded
        # (compiled classes, tens of KB each). Measured: eliminates
        # the alternation penalty (2.7-3.2 s after bloom); NEUTRAL on
        # the bench itself, which runs each query in its own block
        # (mini-suite totals 32.06 vs 31.93 — within noise). The win
        # is for the production shape: a query server alternating
        # many distinct queries.
        .config("spark.sql.codegen.cache.maxEntries",
                os.environ.get("SPARK_CODEGEN_CACHE_ENTRIES", "3000"))
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
