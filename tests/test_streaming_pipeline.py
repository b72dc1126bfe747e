"""The composed seven-store streaming pipeline (streaming/pipeline.py):
>= 3 micro-batches through the full chain with a MID-STREAM replay,
then the streamed kept-set proven equal to the batch composite over
the union of batches and every store proven replay-inert (r6 verdict
item 5 done-criterion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.sources.tables import load_table
from transcript_analysis_spark.streaming import islands_store
from transcript_analysis_spark.streaming import pipeline as pl
from transcript_analysis_spark.streaming.perceptron_store import read_weights
from transcript_analysis_spark.streaming.sketch_store import (
    read_hll_registers, read_sketch)

SF_DIR = "/root/testdata/sf0.001"


def _store_state(spark, stores):
    """Deterministic snapshot of every store's contents."""
    def rows(path, *cols):
        try:
            df = spark.read.parquet(path)
        except Exception:
            return None
        return sorted(map(tuple, df.select(*cols).collect()))

    w = read_weights(spark, stores.perceptron_root)
    return {
        "bands": rows(stores.bands_dir, "doc_id", "band", "key"),
        "pairs": rows(stores.pairs_dir, "doc_a", "doc_b", "batch_id"),
        "decontam": rows(stores.decontam_dir, "doc_id", "n_shingles",
                         "n_candidates", "batch_id"),
        "dsir": rows(stores.dsir_scores_dir, "doc_id", "importance_e9",
                     "batch_id"),
        "kept": rows(stores.kept_dir, "doc_id", "batch_id"),
        "cms": sorted(map(tuple, read_sketch(spark, stores.cms_dir)
                          .collect())),
        "hll": sorted(map(tuple,
                          read_hll_registers(spark, stores.hll_dir,
                                             "source").collect())),
        "assign": rows(stores.assign_dir, "vec_id", "cent_id",
                       "batch_id"),
        "pca": rows(stores.pca_dir, "i", "j", "s", "batch_id"),
        "sample": rows(stores.sample_dir, "doc_id", "hv", "batch_id"),
        "islands": rows(stores.islands_dir, "doc_id", "model_id",
                        "start_index", "end_index", "batch_id"),
        "deliveries": rows(
            islands_store.deliveries_dir_of(stores.islands_dir),
            "doc_id", "batch_id"),
        "tombstones": rows(stores.tombstones_dir, "doc_id", "batch_id"),
        "weights": tuple(w),
    }


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    """Init stores, drive 3 id-ordered micro-batches with a replay of
    batch 1 between batches 1 and 2; return everything the assertions
    need."""
    root = str(tmp_path_factory.mktemp("pipe"))
    stores = pl.PipelineStores.under(root)
    docs = load_table(spark, SF_DIR, "documents")
    emb_path = f"{SF_DIR}/embeddings.parquet"

    # benchmark/eval docs (bloom training): a fixed slice of the
    # corpus, so those exact docs MUST be dropped as contaminated
    bench = docs.filter(F.col("doc_id") % 17 == 3)
    init = pl.init_pipeline_stores(spark, stores, bench, docs,
                                   spark.read.parquet(emb_path))
    assert init["bloom_words"] > 0 and init["dsir_vocab"] > 0
    assert init["perceptron_version"] == 1 and init["ivf_centroids"] > 0

    # three disjoint id-ordered micro-batches (keep-first finality
    # needs smaller ids to arrive no later than their partners)
    batches = [docs.filter(F.col("doc_id") < 170),
               docs.filter((F.col("doc_id") >= 170)
                           & (F.col("doc_id") < 340)),
               docs.filter(F.col("doc_id") >= 340)]

    reports = [pl.foreach_batch_corpus_pipeline(batches[0], 0, stores,
                                                emb_path),
               pl.foreach_batch_corpus_pipeline(batches[1], 1, stores,
                                                emb_path)]
    mid_state = _store_state(spark, stores)
    # MID-STREAM REPLAY: batch 1 redelivered (crash-retry) before 2
    replay = pl.foreach_batch_corpus_pipeline(batches[1], 1, stores,
                                              emb_path)
    replay_state = _store_state(spark, stores)
    reports.append(pl.foreach_batch_corpus_pipeline(batches[2], 2, stores,
                                                    emb_path))
    return {"stores": stores, "docs": docs, "emb_path": emb_path,
            "reports": reports, "replay": replay,
            "mid_state": mid_state, "replay_state": replay_state}


def test_replay_changes_nothing_in_any_store(pipeline_run):
    """The redelivered micro-batch is a no-op across ALL nine stores
    — including the non-idempotent perceptron (watermark skip)."""
    assert pipeline_run["replay"]["perceptron_applied"] is False
    assert pipeline_run["mid_state"] == pipeline_run["replay_state"]


def test_every_batch_processed_and_gates_bite(spark, pipeline_run):
    reports = pipeline_run["reports"]
    assert [r["batch_id"] for r in reports] == [0, 1, 2]
    total_in = sum(r["in"] for r in reports)
    total_kept = sum(r["kept"] for r in reports)
    assert total_in == pipeline_run["docs"].count()
    # the gates actually dropped something, and kept something
    assert 0 < total_kept < total_in
    # the bloom-trained (benchmark) docs were all dropped
    kept_ids = {r.doc_id for r in
                pl.read_kept(spark, pipeline_run["stores"].kept_dir)
                .collect()}
    bench_ids = {r.doc_id for r in pipeline_run["docs"]
                 .filter(F.col("doc_id") % 17 == 3).collect()}
    assert not (kept_ids & bench_ids), "contaminated docs survived"


def test_streamed_kept_set_equals_batch_composite(spark, pipeline_run):
    """The headline equivalence: union of streamed kept partitions ==
    the same three gates applied to the union of all batches as one
    batch plan."""
    stores = pipeline_run["stores"]
    streamed = {r.doc_id for r in
                pl.read_kept(spark, stores.kept_dir).collect()}
    composite = {r.doc_id for r in pl.batch_composite_kept(
        pipeline_run["docs"],
        spark.read.parquet(stores.bloom_dir),
        spark.read.parquet(stores.dsir_weights_dir)).collect()}
    assert streamed == composite


def test_profile_stores_equal_batch_over_kept_union(spark, pipeline_run):
    """CMS cells, HLL registers, and IVF assignments across batches
    equal one batch pass over the kept union — the mergeable-store
    algebra survives the composition."""
    from transcript_analysis_spark.plans.sketches import (cms_cells,
                                                          hll_registers,
                                                          tokens_with_hash)
    from transcript_analysis_spark.streaming.ivf_store import (
        assign_against_store, read_assignments)
    stores = pipeline_run["stores"]
    kept_ids = pl.read_kept(spark, stores.kept_dir).select("doc_id")
    kept_docs = pipeline_run["docs"].join(kept_ids, "doc_id", "left_semi")

    streamed_cms = {(r.j, r.bucket): r.cnt for r in
                    read_sketch(spark, stores.cms_dir).collect()}
    batch_cms = {(r.j, r.bucket): r.cnt for r in
                 cms_cells(tokens_with_hash(kept_docs))
                 .collect()}
    assert streamed_cms == batch_cms

    streamed_hll = {(r.source, r.j): r.m for r in
                    read_hll_registers(spark, stores.hll_dir, "source")
                    .collect()}
    batch_hll = {(r.source, r.j): r.m for r in
                 hll_registers(kept_docs, "source", "doc_id").collect()}
    assert streamed_hll == batch_hll

    emb = spark.read.parquet(pipeline_run["emb_path"])
    kept_emb = emb.join(kept_ids.select(F.col("doc_id").alias("vec_id")),
                        "vec_id", "left_semi")
    streamed_assign = {(r.vec_id, r.cent_id) for r in
                       read_assignments(spark, stores.assign_dir)
                       .collect()}
    cents = spark.read.parquet(stores.centroid_dir)
    batch_assign = {(r.vec_id, r.cent_id) for r in
                    assign_against_store(kept_emb, cents).collect()}
    assert streamed_assign == batch_assign


def test_pca_trajectory_equals_batch_over_kept_union(spark, pipeline_run,
                                                     tmp_path):
    """The pipeline's PCA moment store, accumulated across batches on
    the kept vectors, yields the same power-iteration trajectory as a
    single batch pass over the kept union."""
    from transcript_analysis_spark.streaming.pca_store import (
        foreach_batch_pca, trajectory_from_store)
    stores = pipeline_run["stores"]
    kept_ids = pl.read_kept(spark, stores.kept_dir).select("doc_id")
    emb = spark.read.parquet(pipeline_run["emb_path"])
    kept_emb = emb.join(kept_ids.select(F.col("doc_id").alias("vec_id")),
                        "vec_id", "left_semi")
    ref = str(tmp_path / "pca_ref")
    foreach_batch_pca(kept_emb, 0, ref)
    streamed = trajectory_from_store(spark, stores.pca_dir)
    assert streamed and streamed == trajectory_from_store(spark, ref)


def test_holdout_sample_equals_batch_over_kept_union(spark,
                                                     pipeline_run):
    """The pipeline's merged bottom-k sample equals one batch
    bottom-k pass over the kept union (min-k mergeability)."""
    from transcript_analysis_spark.streaming.sample_store import (
        batch_sample, read_sample)
    stores = pipeline_run["stores"]
    kept_ids = pl.read_kept(spark, stores.kept_dir).select("doc_id")
    kept_docs = pipeline_run["docs"].join(kept_ids, "doc_id",
                                          "left_semi")
    batch = sorted((r.doc_id, r.hv)
                   for r in batch_sample(kept_docs).collect())
    streamed = sorted((r.doc_id, r.hv)
                      for r in read_sample(spark,
                                           stores.sample_dir).collect())
    assert streamed == batch


def test_pipeline_islands_equal_flagship_chain(spark, pipeline_run):
    """The tenth store through the COMPOSED pipeline (stage 0, the
    pre-gate arriving docs): union of batch partitions == the
    registered flagship chain over all documents, and the latest-wins
    view agrees (single delivery per doc ⇒ identical)."""
    from transcript_analysis_spark.plans.domain import islands_from_docs
    stores = pipeline_run["stores"]
    docs = pipeline_run["docs"]
    want = sorted(map(tuple, islands_from_docs(
        docs.select("doc_id", "text")).collect()))
    got = sorted(map(tuple, islands_store.read_islands(
        spark, stores.islands_dir).collect()))
    assert got == want and len(got) > 0
    latest = sorted(map(tuple, islands_store.read_islands_latest(
        spark, stores.islands_dir).collect()))
    assert latest == want


def test_ordered_run_produces_no_tombstones(spark, pipeline_run):
    """With id-ordered arrival every keep-first verdict is final at
    arrival — the retraction channel must stay silent and the
    finalized kept-set must equal the raw one."""
    stores = pipeline_run["stores"]
    assert pl.read_tombstones(spark, stores.tombstones_dir).count() == 0
    raw = {r.doc_id for r in
           pl.read_kept(spark, stores.kept_dir).collect()}
    final = {r.doc_id for r in
             pl.read_kept_final(spark, stores.kept_dir,
                                stores.tombstones_dir).collect()}
    assert raw == final


@pytest.fixture(scope="module")
def pipeline_run_ooo(spark, tmp_path_factory):
    """The same corpus arriving in REVERSE id order — keep-first
    verdicts now go stale (a doc's smaller-id partner arrives after
    it) and the tombstone channel must repair them. Includes a
    mid-stream replay of batch 1 and a post-hoc replay of batch 0
    after everything has landed (the hardest case: the replayed batch
    rebuilds its partitions while later pairs and tombstones exist)."""
    root = str(tmp_path_factory.mktemp("pipe_ooo"))
    stores = pl.PipelineStores.under(root)
    docs = load_table(spark, SF_DIR, "documents")
    emb_path = f"{SF_DIR}/embeddings.parquet"
    bench = docs.filter(F.col("doc_id") % 17 == 3)
    pl.init_pipeline_stores(spark, stores, bench, docs,
                            spark.read.parquet(emb_path))
    batches = [docs.filter(F.col("doc_id") >= 340),
               docs.filter((F.col("doc_id") >= 170)
                           & (F.col("doc_id") < 340)),
               docs.filter(F.col("doc_id") < 170)]
    pl.foreach_batch_corpus_pipeline(batches[0], 0, stores, emb_path)
    pl.foreach_batch_corpus_pipeline(batches[1], 1, stores, emb_path)
    mid_state = _store_state(spark, stores)
    pl.foreach_batch_corpus_pipeline(batches[1], 1, stores, emb_path)
    replay_state = _store_state(spark, stores)
    pl.foreach_batch_corpus_pipeline(batches[2], 2, stores, emb_path)
    done_state = _store_state(spark, stores)
    # replay the FIRST batch after the whole stream has landed
    pl.foreach_batch_corpus_pipeline(batches[0], 0, stores, emb_path)
    late_replay_state = _store_state(spark, stores)
    return {"stores": stores, "docs": docs,
            "mid_state": mid_state, "replay_state": replay_state,
            "done_state": done_state,
            "late_replay_state": late_replay_state}


def test_ooo_kept_final_equals_composite(spark, pipeline_run_ooo):
    """The headline out-of-order contract: kept minus tombstones ==
    the batch composite, and the channel actually fired (raw kept
    strictly larger than final)."""
    stores = pipeline_run_ooo["stores"]
    raw = {r.doc_id for r in
           pl.read_kept(spark, stores.kept_dir).collect()}
    final = {r.doc_id for r in
             pl.read_kept_final(spark, stores.kept_dir,
                                stores.tombstones_dir).collect()}
    composite = {r.doc_id for r in pl.batch_composite_kept(
        pipeline_run_ooo["docs"],
        spark.read.parquet(stores.bloom_dir),
        spark.read.parquet(stores.dsir_weights_dir)).collect()}
    assert final == composite
    assert raw > final, "no stale verdict was ever retracted — fixture vacuous"
    tombs = {r.doc_id for r in
             pl.read_tombstones(spark, stores.tombstones_dir).collect()}
    assert tombs == raw - final


def test_ooo_replays_are_byte_stable(pipeline_run_ooo):
    """Replaying an applied batch — mid-stream or after the whole
    stream — changes nothing in ANY store, tombstones included: the
    arrival-time gate sees only pairs known as of that batch, so late
    knowledge cannot rewrite history."""
    assert (pipeline_run_ooo["mid_state"]
            == pipeline_run_ooo["replay_state"])
    assert (pipeline_run_ooo["done_state"]
            == pipeline_run_ooo["late_replay_state"])


def test_perceptron_saw_exactly_the_kept_docs_once(spark, pipeline_run):
    """Exactly-once training input: n_seen equals the kept-union size
    (each doc once, despite the replay), watermark at the last batch."""
    import json
    stores = pipeline_run["stores"]
    w = read_weights(spark, stores.perceptron_root)
    n_kept = pl.read_kept(spark, stores.kept_dir).count()
    assert w["n_seen"] == n_kept
    assert json.loads(w["applied_json"]) == {"corpus_pipeline": 2}


def test_consistent_snapshot_hides_inflight_batch(spark, tmp_path):
    """The catalog manifest makes the nine stores read as ONE
    snapshot: a batch whose partitions have landed but whose manifest
    has not flipped (crash before publish) is invisible to consistent
    readers, while raw per-store reads already see it; replaying the
    batch WITH publish advances the watermark monotonically."""
    from transcript_analysis_spark.sources.catalog import latest_catalog
    from transcript_analysis_spark.streaming.sample_store import read_sample

    root = str(tmp_path / "pipe")
    cat = str(tmp_path / "cat")
    stores = pl.PipelineStores.under(root)
    docs = load_table(spark, SF_DIR, "documents")
    emb_path = f"{SF_DIR}/embeddings.parquet"
    bench = docs.filter(F.col("doc_id") % 17 == 3)
    pl.init_pipeline_stores(spark, stores, bench, docs,
                            spark.read.parquet(emb_path))

    b0 = docs.filter(F.col("doc_id") < 250)
    b1 = docs.filter(F.col("doc_id") >= 250)
    pl.foreach_batch_corpus_pipeline(b0, 0, stores, emb_path, cat)
    assert pl.snapshot_watermark(spark, cat) == 0

    # batch 1 lands all stores but CRASHES before its publish
    pl.foreach_batch_corpus_pipeline(b1, 1, stores, emb_path,
                                     catalog_root=None)
    raw = {r.doc_id for r in pl.read_kept(spark, stores.kept_dir)
           .collect()}
    cons = {r.doc_id for r in
            pl.read_kept_consistent(spark, stores, cat).collect()}
    assert cons < raw                        # in-flight batch hidden
    assert max(r.batch_id for r in
               pl.read_kept(spark, stores.kept_dir).collect()) == 1
    assert pl.snapshot_watermark(spark, cat) == 0
    # the sketch view is truncated to the SAME watermark as the kept
    # view — no mixed-batch reads anywhere
    cms_cons = pl.read_store_consistent(spark, stores.cms_dir, cat)
    assert cms_cons.agg(F.max("batch_id")).collect()[0][0] == 0

    # crash-retry replays batch 1 with its publish this time
    pl.foreach_batch_corpus_pipeline(b1, 1, stores, emb_path, cat)
    assert pl.snapshot_watermark(spark, cat) == 1
    assert {r.doc_id for r in
            pl.read_kept_consistent(spark, stores, cat).collect()} == raw

    # republishing an older batch never moves readers backwards
    pl.publish_snapshot(spark, stores, cat, 0)
    assert pl.snapshot_watermark(spark, cat) == 1
    assert latest_catalog(spark, cat) >= 3

    # the sample store reads consistently through the same helper
    assert read_sample(
        spark, stores.sample_dir).count() >= pl.read_store_consistent(
        spark, stores.sample_dir, cat).limit(1).count()


def test_store_compaction_is_lossless_and_replay_safe(spark, tmp_path):
    """Compacting every batch partition at or below watermark-1 into
    one stamped partition changes NOTHING any reader or replayer can
    observe: consistent views identical, merged store reads identical,
    and a crash-retry replay of the newest published batch is still a
    byte-level no-op against the compacted store."""
    import glob

    from transcript_analysis_spark.streaming.sample_store import read_sample
    from transcript_analysis_spark.streaming.sketch_store import read_sketch

    root = str(tmp_path / "pipe")
    cat = str(tmp_path / "cat")
    stores = pl.PipelineStores.under(root)
    docs = load_table(spark, SF_DIR, "documents")
    emb_path = f"{SF_DIR}/embeddings.parquet"
    bench = docs.filter(F.col("doc_id") % 17 == 3)
    pl.init_pipeline_stores(spark, stores, bench, docs,
                            spark.read.parquet(emb_path))

    batches = [docs.filter(F.col("doc_id") < 170),
               docs.filter((F.col("doc_id") >= 170)
                           & (F.col("doc_id") < 340)),
               docs.filter(F.col("doc_id") >= 340)]
    for b, part in enumerate(batches):
        pl.foreach_batch_corpus_pipeline(part, b, stores, emb_path, cat)
    assert pl.snapshot_watermark(spark, cat) == 2

    def views():
        return {
            "kept": sorted(r.doc_id for r in pl.read_kept_consistent(
                spark, stores, cat).collect()),
            "sample": sorted((r.doc_id, r.hv) for r in read_sample(
                spark, stores.sample_dir).collect()),
            "cms": sorted(map(tuple, read_sketch(
                spark, stores.cms_dir).collect())),
            # latest-wins product view: the delegated upsert-correct
            # compaction must leave it untouched (the generic collapse
            # provably would not, for multi-delivery histories)
            "islands": sorted(map(tuple, islands_store.read_islands_latest(
                spark, stores.islands_dir).collect())),
        }

    before = views()
    n_parts_before = len(glob.glob(f"{stores.kept_dir}/batch_id=*"))
    compacted = pl.compact_pipeline_stores(spark, stores, cat)
    assert compacted, "nothing compacted"
    assert stores.kept_dir in compacted
    assert views() == before
    # partitions 0 and 1 collapsed into one stamped batch_id=1
    parts = sorted(int(p.rsplit("=", 1)[1]) for p in
                   glob.glob(f"{stores.kept_dir}/batch_id=*"))
    assert parts == [1, 2] and n_parts_before == 3

    # the newest published batch replays as a no-op on the compacted
    # store (crash after publish, before the checkpoint commit)
    pre = _store_state(spark, stores)
    rep = pl.foreach_batch_corpus_pipeline(batches[2], 2, stores,
                                           emb_path, cat)
    assert rep["perceptron_applied"] is False
    assert _store_state(spark, stores) == pre
    assert views() == before
