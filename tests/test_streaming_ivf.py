"""Incremental IVF index store (streaming/ivf_store.py): streamed
assignments equal the batch assignment exactly, replay is idempotent,
and search over the maintained store reproduces the registered
`ivf_topk_probe` row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming.ivf_store import (
    assign_against_store,
    build_centroid_store,
    foreach_batch_ivf,
    read_assignments,
    search_store,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_streamed_assignments_equal_batch(spark, tmp_path):
    cdir = str(tmp_path / "cents")
    adir = str(tmp_path / "assign")
    emb = _emb(spark)
    n_cents = build_centroid_store(emb, cdir)
    assert n_cents > 1
    batches = [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    for bid, b in enumerate(batches):
        foreach_batch_ivf(b, bid, cdir, adir)
    streamed = {r.vec_id: (r.cent_id, r.cos9)
                for r in read_assignments(spark, adir).collect()}
    cents = spark.read.parquet(cdir)
    batch = {r.vec_id: (r.cent_id, r.cos9)
             for r in assign_against_store(emb, cents).collect()}
    assert streamed == batch
    assert len(streamed) == emb.count()


def test_replay_is_idempotent(spark, tmp_path):
    cdir = str(tmp_path / "cents")
    adir = str(tmp_path / "assign")
    emb = _emb(spark)
    build_centroid_store(emb, cdir)
    halves = [emb.filter(F.col("vec_id") % 2 == i) for i in range(2)]
    for bid, b in enumerate(halves):
        foreach_batch_ivf(b, bid, cdir, adir)
    before = sorted(map(tuple, read_assignments(spark, adir).collect()))
    foreach_batch_ivf(halves[1], 1, cdir, adir)     # crash-redelivery
    after = sorted(map(tuple, read_assignments(spark, adir).collect()))
    assert after == before


def test_search_store_equals_registered_probe(spark, tmp_path):
    """The maintained index must answer the registered query's answer:
    same nprobe routing, same 6dp cosine top-k, row for row."""
    from transcript_analysis_spark.plans import all_queries
    cdir = str(tmp_path / "cents")
    adir = str(tmp_path / "assign")
    emb = _emb(spark)
    build_centroid_store(emb, cdir)
    for bid, b in enumerate(
            [emb.filter(F.col("vec_id") % 2 == i) for i in range(2)]):
        foreach_batch_ivf(b, bid, cdir, adir)
    got = [(r.vec_id, r.label, r.cosine)
           for r in search_store(spark, cdir, adir, emb).collect()]
    ref = [(r.vec_id, r.label, r.cosine)
           for r in all_queries()["ivf_topk_probe"].fn(spark, SF_DIR)
           .collect()]
    assert got == ref
