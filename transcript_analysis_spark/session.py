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
        # Whole-stage-codegen cache: left at Spark's default (100
        # compiled classes) after a DELIBERATE r14 experiment. A null
        # A/B found a +45% recompile penalty when two heavy queries
        # alternate (their ~30+ codegen units thrash the cache; each
        # miss is a driver-side Janino compile), and raising the cache
        # to 3000 eliminates it — but a process-level A/B then showed
        # the raised cache costing up to +36% on CPU-bound queries
        # run block-at-a-time (minhash 1.04 -> 1.41 s min-of-5;
        # retained generated classes pressure the JIT code cache), and
        # the bench runs every query in its own block, so the default
        # wins there. The alternation finding is documented in
        # OPTIMIZATION_r14.md; the measurement-fairness problem it
        # caused is fixed in tools/ab_bench.py (counterbalanced arm
        # order), not by this conf.
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
