"""Training-shard export — the last sink of the prep pipeline.

Packed sequences (plans/scale_ops.py sequence packing) become
fixed-size shards a training job can stream independently: each shard
is one parquet partition directory holding a contiguous run of
sequences for one language, plus a MANIFEST the trainer (or an
auditor) can trust without scanning the data — per-shard document /
sequence / token counts and an order-independent content fingerprint,
with corpus totals.

Scale shape: the shard id derives arithmetically from (lang, seq_no)
— no extra shuffle beyond the partitioned write itself — and the
manifest is one aggregation over the same frame. Shard boundaries
respect sequence boundaries by construction (a sequence maps to
exactly one shard), so a trainer can consume shards in any order or
in parallel without splitting a training sequence.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# leading underscore: Spark's file index treats _-prefixed files as
# metadata (like _SUCCESS), so the manifest can live beside the data
# without breaking spark.read.parquet on the directory
MANIFEST_NAME = "_MANIFEST.json"

# order-independent per-row fingerprint folded with bit_xor: stable
# under any partitioning / write order, exact in both engines
_ROW_FP = ("(doc_id * 1000003 + seq_no * 101 + seq_offset * 31"
           " + n_tokens) % 9223372036854775783")


def _per_shard_stats(df: DataFrame) -> DataFrame:
    return (df.groupBy("lang", "shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("seq_no").alias("n_seqs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.expr(f"bit_xor({_ROW_FP})").alias("fingerprint")))


def export_training_shards(packed: DataFrame, path: str,
                           seqs_per_shard: int = 50) -> dict:
    """Write a packed-sequence frame (lang, doc_id, n_tokens, seq_no,
    seq_offset) as `lang=<l>/shard=<k>/` parquet partitions with
    ``seqs_per_shard`` sequences per shard, and a manifest beside
    them. Returns the manifest dict.

    The manifest is aggregated from a RE-READ of the written files, so
    it attests to the bytes on disk, not to a second execution of the
    (possibly expensive) upstream plan. Manifest I/O uses driver-local
    file APIs: `path` must be a driver-visible filesystem (for object
    stores, route the manifest through the Hadoop FileSystem API)."""
    sharded = packed.withColumn(
        "shard", F.expr(f"seq_no div {seqs_per_shard}").cast("long"))
    (sharded.repartition("lang", "shard")
     .write.mode("overwrite").partitionBy("lang", "shard").parquet(path))

    spark = packed.sparkSession
    written = spark.read.parquet(path).withColumn(
        "shard", F.col("shard").cast("long"))
    per_shard = _per_shard_stats(written).orderBy("lang", "shard")
    shards = [r.asDict() for r in per_shard.collect()]
    manifest = {
        "seqs_per_shard": seqs_per_shard,
        "n_shards": len(shards),
        "total_docs": sum(s["n_docs"] for s in shards),
        "total_seqs": sum(s["n_seqs"] for s in shards),
        "total_tokens": sum(s["n_tokens"] for s in shards),
        "shards": shards,
    }
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return manifest


def verify_shards(spark: SparkSession, path: str) -> dict:
    """Recompute every manifest entry from the shard data and compare
    — the audit a trainer runs before burning compute on a corpus.
    Returns the manifest on success; raises ValueError naming the
    first divergent shard otherwise."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    df = spark.read.parquet(path).withColumn(
        "shard", F.col("shard").cast("long"))
    got = {(r["lang"], r["shard"]): r.asDict()
           for r in _per_shard_stats(df).collect()}
    if len(got) != manifest["n_shards"]:
        raise ValueError(f"shard count mismatch: data has {len(got)}, "
                         f"manifest says {manifest['n_shards']}")
    # the corpus totals must equal the sum of the (verified) shard
    # entries — a tampered total with intact shards is still a lie
    for field in ("n_docs", "n_seqs", "n_tokens"):
        total_key = f"total_{field.split('_')[1]}"
        expect = sum(s[field] for s in manifest["shards"])
        if manifest[total_key] != expect:
            raise ValueError(
                f"{total_key} mismatch: manifest {manifest[total_key]}"
                f" != sum of shard entries {expect}")
    for s in manifest["shards"]:
        key = (s["lang"], s["shard"])
        actual = got.get(key)
        if actual is None:
            raise ValueError(f"manifest shard {key} missing from data")
        for field in ("n_docs", "n_seqs", "n_tokens", "fingerprint"):
            if actual[field] != s[field]:
                raise ValueError(
                    f"shard {key} {field} mismatch: data {actual[field]}"
                    f" != manifest {s[field]}")
    return manifest
