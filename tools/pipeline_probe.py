"""Bench-scale probe of the composed ten-store streaming pipeline.

The pipeline's correctness contracts are pinned at sf0.001 in
tests/test_streaming_pipeline.py; this probe drives the SAME
foreach_batch chain at bench scale (sf0.1 by default, 50k docs) in N
id-ordered micro-batches, times every batch, and re-verifies the two
headline equivalences at that scale:

  1. streamed kept-set == the batch composite of the three gates over
     the union of batches;
  2. the merged holdout sample == one batch bottom-k pass over the
     kept union;
  3. streamed islands == the registered flagship over the full corpus
     (the tenth store, new r8, exercised at 100x its test scale);
  4. (new r9) latest-wins re-score: a doc subset re-delivered with
     REVISED text in a later, out-of-order batch — the latest view
     must equal the flagship over the FINAL texts, before and after
     the upsert-correct compaction;
  5. (new r10) crash-redelivery of a superseded batch BELOW the
     already-compacted watermark: latest view unchanged, repeat
     compaction drops the resurfaced generation and re-converges.

Usage: PYTHONPATH=/root/repo python tools/pipeline_probe.py \
           [sf_dir] [n_batches]
Prints one JSON line; run results are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if "--selfcheck" in sys.argv[1:]:
        # Clean-shell import canary (r12 verdict item 2), no JVM.
        from transcript_analysis_spark.streaming import pipeline as pl
        from transcript_analysis_spark.streaming import sample_store
        print(f"selfcheck OK: {pl.__name__} and "
              f"{sample_store.__name__} importable")
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from transcript_analysis_spark.session import get_spark
    from transcript_analysis_spark.sources.tables import load_table
    from transcript_analysis_spark.streaming import pipeline as pl
    from transcript_analysis_spark.streaming.sample_store import (
        batch_sample, read_sample)

    spark = get_spark("pipeline_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb_path = f"{sf_dir}/embeddings.parquet"
    n_docs = docs.count()

    with tempfile.TemporaryDirectory(prefix="pipeline_probe_") as root:
        stores = pl.PipelineStores.under(root)
        cat = os.path.join(root, "catalog")
        bench = docs.filter(F.col("doc_id") % 17 == 3)
        t0 = time.monotonic()
        pl.init_pipeline_stores(spark, stores, bench, docs,
                                spark.read.parquet(emb_path))
        init_s = round(time.monotonic() - t0, 3)

        # id-ordered equal-width ranges (keep-first finality)
        hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        step = -(-hi // n_batches)
        batch_secs = []
        kept_total = 0
        for b in range(n_batches):
            part = docs.filter((F.col("doc_id") >= b * step)
                               & (F.col("doc_id") < (b + 1) * step))
            t0 = time.monotonic()
            rep = pl.foreach_batch_corpus_pipeline(part, b, stores,
                                                   emb_path, cat)
            batch_secs.append(round(time.monotonic() - t0, 3))
            kept_total += rep["kept"]

        # equivalence 1: kept == batch composite
        t0 = time.monotonic()
        streamed = {r.doc_id for r in
                    pl.read_kept(spark, stores.kept_dir).collect()}
        composite = {r.doc_id for r in pl.batch_composite_kept(
            docs, spark.read.parquet(stores.bloom_dir),
            spark.read.parquet(stores.dsir_weights_dir)).collect()}
        kept_ok = streamed == composite

        # equivalence 2: merged sample == batch bottom-k on kept union
        kept_ids = pl.read_kept(spark, stores.kept_dir).select("doc_id")
        kept_docs = docs.join(kept_ids, "doc_id", "left_semi")
        batch_s = sorted((r.doc_id, r.hv)
                         for r in batch_sample(kept_docs).collect())
        stream_s = sorted((r.doc_id, r.hv) for r in
                          read_sample(spark, stores.sample_dir).collect())
        sample_ok = batch_s == stream_s

        # equivalence 2b (new r8): streamed islands == the registered
        # flagship over the full corpus (the tenth store, exercised at
        # bench scale)
        from transcript_analysis_spark.plans.domain import (
            islands_from_docs)
        from transcript_analysis_spark.streaming.islands_store import (
            read_islands)
        stream_i = sorted(map(tuple, read_islands(
            spark, stores.islands_dir).collect()))
        batch_i = sorted(map(tuple, islands_from_docs(
            docs.select("doc_id", "text")).collect()))
        islands_ok = stream_i == batch_i and len(stream_i) > 0

        # equivalence 3: with every batch published, the catalog-
        # consistent view equals the raw finalized kept-set, and the
        # watermark-safe compaction leaves it untouched
        wm_ok = pl.snapshot_watermark(spark, cat) == n_batches - 1
        cons = {r.doc_id for r in pl.read_kept_consistent(
            spark, stores, cat).collect()}
        final = {r.doc_id for r in pl.read_kept_final(
            spark, stores.kept_dir, stores.tombstones_dir).collect()}
        consistent_ok = wm_ok and cons == final
        pl.compact_pipeline_stores(spark, stores, cat)
        after = {r.doc_id for r in pl.read_kept_consistent(
            spark, stores, cat).collect()}
        compaction_ok = after == cons
        verify_s = round(time.monotonic() - t0, 3)

        # equivalence 4 (new r9): latest-wins re-score under
        # out-of-order delivery — re-deliver ~1/13 of the corpus with
        # REVISED text in a later batch, assert the latest view equals
        # the flagship over the final texts, then compact the islands
        # store and re-assert (the upsert-correct compaction must drop
        # the superseded generations and nothing else).
        from transcript_analysis_spark.streaming.islands_store import (
            compact_islands_store, foreach_batch_islands,
            read_islands_latest)
        t0 = time.monotonic()
        revised = (docs.filter(F.col("doc_id") % 13 == 5)
                   .select("doc_id",
                           F.concat(F.col("text"),
                                    F.lit(" probe revision tail"))
                           .alias("text")))
        foreach_batch_islands(revised, n_batches, stores.islands_dir)
        final_texts = (docs.select("doc_id", "text")
                       .join(revised.select("doc_id"), "doc_id",
                             "left_anti")
                       .unionByName(revised))
        want = sorted(map(tuple,
                          islands_from_docs(final_texts).collect()))
        got = sorted(map(tuple, read_islands_latest(
            spark, stores.islands_dir).collect()))
        rescore_ok = got == want and len(want) > 0
        dropped = compact_islands_store(spark, stores.islands_dir,
                                        through=n_batches)
        got2 = sorted(map(tuple, read_islands_latest(
            spark, stores.islands_dir).collect()))
        rescore_compact_ok = got2 == want
        rescore_s = round(time.monotonic() - t0, 3)

        # equivalence 5 (new r10): crash-redelivery BELOW the
        # already-compacted watermark — replay batch 0 with its
        # ORIGINAL texts (at-least-once delivery after a compaction,
        # the reference's island_worker.py:72-99 tolerance). The
        # superseded generation resurfaces in the raw store, but the
        # latest view must be unchanged and a repeat compaction must
        # drop the resurfaced rows and re-converge to a fixed point.
        t0 = time.monotonic()
        raw_before = spark.read.parquet(stores.islands_dir).count()
        foreach_batch_islands(
            docs.filter(F.col("doc_id") < step).select("doc_id", "text"),
            0, stores.islands_dir)
        replay_latest_ok = sorted(map(tuple, read_islands_latest(
            spark, stores.islands_dir).collect())) == want
        redropped = compact_islands_store(spark, stores.islands_dir,
                                          through=n_batches)
        replay_compact_ok = (
            sorted(map(tuple, read_islands_latest(
                spark, stores.islands_dir).collect())) == want
            and spark.read.parquet(stores.islands_dir).count()
            == raw_before)
        replay_s = round(time.monotonic() - t0, 3)

    out = {"sf_dir": sf_dir, "n_docs": n_docs, "n_batches": n_batches,
           "init_sec": init_s, "batch_secs": batch_secs,
           "total_stream_sec": round(sum(batch_secs), 3),
           "verify_sec": verify_s, "kept": kept_total,
           "kept_equals_composite": kept_ok,
           "sample_equals_batch": sample_ok,
           "islands_equal_flagship": islands_ok,
           "n_islands": len(stream_i),
           "consistent_equals_final": consistent_ok,
           "compaction_lossless": compaction_ok,
           "rescore_sec": rescore_s,
           "rescore_latest_equals_flagship": rescore_ok,
           "rescore_compaction_lossless": rescore_compact_ok,
           "rescore_rows_dropped": sum(dropped.values()),
           "replay_sec": replay_s,
           "replay_below_watermark_latest_ok": replay_latest_ok,
           "replay_recompaction_converges": replay_compact_ok,
           "replay_rows_redropped": sum(redropped.values())}
    print(json.dumps(out))
    return 0 if (kept_ok and sample_ok and islands_ok and consistent_ok
                 and compaction_ok and rescore_ok
                 and rescore_compact_ok and replay_latest_ok
                 and replay_compact_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
