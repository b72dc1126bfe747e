"""Training-shard export (sources/shards.py): manifest integrity,
sequence-boundary discipline, and tamper detection."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.sources.shards import (
    MANIFEST_NAME,
    export_training_shards,
    verify_shards,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def packed(spark):
    from transcript_analysis_spark.plans import all_queries
    return all_queries()["sequence_packing_sharded"].fn(spark, SF_DIR)


def test_export_manifest_matches_data(spark, tmp_path, packed):
    path = str(tmp_path / "shards")
    manifest = export_training_shards(packed, path, seqs_per_shard=10)
    assert manifest["total_docs"] == packed.count()
    assert manifest["total_tokens"] == (
        packed.agg(F.sum("n_tokens")).first()[0])
    # audit pass reproduces every entry
    assert verify_shards(spark, path)["n_shards"] == manifest["n_shards"]


def test_shards_never_split_a_sequence(spark, tmp_path, packed):
    path = str(tmp_path / "shards")
    export_training_shards(packed, path, seqs_per_shard=10)
    df = spark.read.parquet(path)
    # every (lang, seq_no) lives in exactly one shard
    spread = (df.groupBy("lang", "seq_no")
              .agg(F.countDistinct("shard").alias("n"))
              .filter("n > 1").count())
    assert spread == 0
    # and shard directories exist on disk as lang=/shard= partitions
    assert glob.glob(os.path.join(path, "lang=*", "shard=*"))


def test_verify_detects_total_tampering(spark, tmp_path, packed):
    """Editing only a corpus total (shard entries intact) must fail
    the audit too."""
    path = str(tmp_path / "shards")
    export_training_shards(packed, path, seqs_per_shard=10)
    mpath = os.path.join(path, MANIFEST_NAME)
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["total_tokens"] += 1
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="total_tokens mismatch"):
        verify_shards(spark, path)


def test_verify_detects_tampering(spark, tmp_path, packed):
    path = str(tmp_path / "shards")
    export_training_shards(packed, path, seqs_per_shard=10)
    mpath = os.path.join(path, MANIFEST_NAME)
    with open(mpath) as f:
        manifest = json.load(f)
    # tamper CONSISTENTLY (shard entry + total) so the internal
    # totals cross-check passes and the data comparison must catch it
    manifest["shards"][0]["n_tokens"] += 1
    manifest["total_tokens"] += 1
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="n_tokens mismatch"):
        verify_shards(spark, path)
