"""The TranscriptEngine facade: every reference entry point reachable
from one object, returning live DataFrames."""

from __future__ import annotations

import pytest

from transcript_analysis_spark.api import TranscriptEngine

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    return TranscriptEngine(spark, SF_DIR)


def test_scoring_via_imported_model(engine, spark, tmp_path):
    from transcript_analysis_spark.operators.scoring import NGramModel
    from transcript_analysis_spark.sources import model_import as mi
    texts = [r.text for r in engine._docs().limit(5).collect()]
    model = NGramModel.train([t.split(" ") for t in texts])
    blob = str(tmp_path / "m.pkl")
    mi.export_model_pickle(model, blob)
    table = engine.import_model(blob, model_id=1,
                                out_path=str(tmp_path / "m.parquet"))
    scored = engine.score_documents(table)
    row = scored.limit(1).collect()[0]
    assert isinstance(row.score, list) and row.score
    # broadcast path agrees
    b = engine.score_documents_broadcast(model)
    assert {r.doc_id: r.score for r in scored.collect()} == \
           {r.doc_id: r.score for r in b.select("doc_id", "score").collect()}


def test_islands_and_survey_and_chunks(engine):
    isl = engine.find_islands()
    assert isl.count() > 0 and "average_score" in isl.columns
    survey = engine.run_survey(n_questions=4)
    assert survey.count() > 0 and "score_econ" in survey.columns
    chunks = engine.chunk_and_embed()
    assert chunks.count() > 0 and "chunk_index" in chunks.columns
    rag = engine.chunk_and_embed(question="what is a filter?", top_k=2)
    assert rag.groupBy("doc_id").count().agg({"count": "max"}) \
              .first()[0] <= 2


def test_dedup_quality_sql(engine):
    assert engine.dedup("exact").count() > 0
    with pytest.raises(ValueError):
        engine.dedup("nope")
    assert engine.quality().count() > 0
    assert engine.decontaminate().count() >= 0
    n = engine.sql("SELECT COUNT(*) AS n FROM documents").first().n
    assert n == 500


def test_dashboard_from_engine(engine):
    svc = engine.dashboard(ttl_sec=300)
    rows, hit = svc.run("corpus_counts")
    assert rows and not hit
    _, hit2 = svc.run("corpus_counts")
    assert hit2


def test_named_query_passthrough(engine):
    assert engine.query("status_histogram").count() > 0


def test_quality_signal_facade(engine):
    sig = engine.quality_signals()
    assert sig.count() > 0 and "repetitive" in sig.columns
    trained = engine.train_filter()
    assert trained.count() == 4 and "weight" in trained.columns
    cls = engine.classify_quality()
    assert cls.count() > 0 and "keep" in cls.columns
    buckets = engine.corpus_buckets()
    assert {r.bucket for r in buckets.collect()} == {1, 2, 3}
    prep = engine.prepare_training_data()
    assert prep.count() > 0 and "n_tokens_est" in prep.columns


def test_ingest_channel_facade(engine):
    from transcript_analysis_spark.sources.ingest import FakeTubeTransport
    t = FakeTubeTransport(videos_per_channel=6, lines_per_video=3)
    first = engine.ingest_channel(
        t, "UCfacade",
        transport_factory=lambda: FakeTubeTransport(
            videos_per_channel=6, lines_per_video=3))
    assert first.count() == 18
    # re-crawl against what was already ingested -> nothing new
    again = engine.ingest_channel(
        FakeTubeTransport(videos_per_channel=6, lines_per_video=3),
        "UCfacade",
        transport_factory=lambda: FakeTubeTransport(
            videos_per_channel=6, lines_per_video=3),
        existing_segments=first.select("vid_id", "start"))
    assert again.count() == 0


def test_round5_prep_facade(engine):
    from transcript_analysis_spark.plans.scale_ops import SAMPLE_K
    bloom = engine.decontaminate_bloom()
    assert bloom.count() > 0 and "n_false_positives" in bloom.columns
    packed = engine.pack_sequences()
    assert packed.count() > 0 and "seq_no" in packed.columns
    assert engine.pack_sequences(sharded=False).count() == packed.count()
    vocab = engine.build_vocab()
    enc = engine.encode_corpus()
    assert vocab.count() > 0 and enc.count() > 0
    assert engine.rank_bm25().count() > 0
    assert engine.sample_fixed().count() == SAMPLE_K


def test_export_shards_facade(engine, tmp_path):
    from transcript_analysis_spark.sources.shards import verify_shards
    path = str(tmp_path / "shards")
    manifest = engine.export_shards(path, seqs_per_shard=10)
    assert manifest["total_docs"] > 0
    assert verify_shards(engine.spark, path)["n_shards"] == manifest["n_shards"]


def test_round6_curation_facade(engine):
    assert engine.anonymize().count() > 0
    assert engine.dup_coverage().count() > 0
    assert engine.dedup_keep_list().count() > 0
    assert engine.perplexity_filter().count() > 0
    assert engine.quantize_embeddings().count() > 0
    merges = engine.learn_bpe(n_merges=3)
    assert len(merges) == 3 and all(m["merged"] == m["left"] + m["right"]
                                    for m in merges)
    enc = engine.encode_bpe(merges)
    assert enc.count() > 0
    assert {"n_words", "n_subword_tokens", "n_merged_tokens"} <= set(
        enc.columns)


def test_warehouse_sketch_graph_facade(engine):
    assert engine.rollup().count() > 0
    assert engine.pivot_priorities().count() > 0
    assert engine.snapshot_diff().count() > 0
    assert engine.equi_depth_histogram().count() == 10
    assert engine.diagnose_skew().count() == 1
    assert engine.heavy_hitters().count() > 0
    assert engine.phrase_search().count() >= 0
    assert engine.kmeans().count() > 0
    assert engine.semantic_dedup().count() > 0
    pr = engine.pagerank()
    assert {"node_id", "pagerank_fp"} == set(pr.columns)
    assert pr.count() > 0


def test_final_round_facade(engine):
    assert engine.basket_affinity().count() == 20
    assert engine.quantile_sketch().count() == 3
    card = engine.dataset_card().collect()
    assert len(card) == 1 and card[0].n_docs > 0
    assert engine.dedup_cluster_sizes().count() > 0
    assert engine.rfm_segments().count() > 0
    assert engine.zipf_fit().collect()[0].zipf_slope < 0


def test_selection_tier_facade(engine):
    assert engine.dsir_weights().columns[-1] == "target_like"
    mmr = engine.diverse_topk().collect()
    assert len(mmr) > 0
    assert engine.match_event_paths().count() > 0
    assert engine.session_paths().count() > 0
    pit = engine.point_in_time_join()
    assert "state_at_purchase" in pit.columns
    tri = engine.triangle_census().collect()[0]
    assert tri.n_triangles >= 0
    assert engine.containment_pairs().count() > 0
    assert engine.collocations().count() > 0
    assert engine.minhash_accuracy().count() > 0
    assert engine.apply_changes().count() > 0
    plan_cols = set(engine.selection_plan().columns)
    assert {"decision", "selected", "split"} <= plan_cols
    assert engine.rank_normalize().count() > 0
    assert engine.langid_eval().count() > 0


def test_explain_facade(engine):
    out = engine.explain("brand_revenue")
    assert "broadcast hash join" in out        # audit note
    assert "BroadcastHashJoin" in out          # raw plan


def test_serve_dashboard_http_endpoint(engine):
    import json
    import urllib.request
    srv = engine.serve_dashboard(ttl_sec=300)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/query/corpus_counts",
                timeout=60) as r:
            out = json.loads(r.read())
        assert out["n_rows"] >= 1 and not out["cached"]
    finally:
        srv.shutdown()


def test_round7_eval_facade(engine):
    """The round-7 audit tier is reachable through the fluent API."""
    k = engine.filter_agreement().collect()
    assert len(k) == 1 and -1.0 <= k[0].kappa <= 1.0
    cal = engine.filter_calibration().collect()
    assert cal and all(0.0 <= r.pos_rate <= 1.0 for r in cal)
    nd = engine.rank_quality().collect()
    assert len(nd) == 1 and 0.0 < nd[0].ndcg10 <= 1.0
    assert engine.dedup("simhash_pairs").count() >= 0
    pc = engine.top_principal_component()
    assert pc.count() > 0
    ep = engine.order_epochs()
    assert ep.select("epoch").distinct().count() == 2
    fu = engine.release_funnel().collect()
    assert fu and all(0.0 <= r.split_share <= 1.0 for r in fu)
    sb = engine.split_bias_test().collect()
    assert len(sb) == 1 and sb[0].chi2 >= 0


def test_catalog_introspection_facade(engine):
    """describe_catalog (footer metadata, no scan) must agree with the
    oracle-checked catalog_row_counts plan table for table, and the
    dashboard serves the counts query like any registered query."""
    desc = {r.table_name: r for r in engine.describe_catalog().collect()}
    counts = {r.table_name: r.row_count
              for r in engine.catalog_counts().collect()}
    assert set(desc) == set(counts) and len(desc) == 10
    for t, row in desc.items():
        assert row.row_count == counts[t]
        assert row.n_columns >= 2 and row.n_files >= 1
        assert row.total_bytes > 0
        assert f"{row.columns}".count(":") >= row.n_columns

    from transcript_analysis_spark.serving.dashboard import DashboardService
    svc = DashboardService(engine.spark, engine.sf_dir, ttl_sec=300)
    rows, hit = svc.run("catalog_row_counts")
    assert not hit and {r.table_name for r in rows} == set(desc)
    rows2, hit2 = svc.run("catalog_row_counts")
    assert hit2 and rows2 == rows


def test_gopher_rules_facade(engine):
    """Rule semantics pinned on the corpus: keep == AND of the four
    rules, and the gate is non-degenerate (both verdicts occur)."""
    rows = engine.gopher_rules().collect()
    assert rows and all(
        r.keep == (r.r_word_count and r.r_mean_word_len
                   and r.r_alpha_ratio and r.r_stopwords) for r in rows)
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)
    for r in rows:
        assert r.r_word_count == (50 <= r.n_words <= 100000)
        assert r.r_stopwords == (r.n_stop_kinds >= 2)


def test_island_audit_loop_facade(engine, tmp_path):
    """The roadmap's audit loop end-to-end: sample is deterministic
    across calls, judgments persist idempotently (re-recording a
    verdict overwrites, not duplicates), and the precision report's
    overall row equals judged reality."""
    from pyspark.sql import functions as F

    s1 = engine.audit_islands().collect()
    s2 = engine.audit_islands().collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    assert len(s1) == 25
    assert all(r.island_text and r.word_start <= r.word_end for r in s1)

    path = str(tmp_path / "judgments")
    verdicts = engine.audit_islands().select(
        "doc_id", "model_id", "start_index",
        (F.col("average_score") >= 0.5).alias("is_real"))
    engine.record_island_judgments(verdicts, path)
    engine.record_island_judgments(verdicts, path)      # idempotent
    rep = {(r.model_id): r for r in
           engine.island_precision_report(path).collect()}
    overall = rep[None]
    assert overall.n_judged == 25
    truth = sum(1 for r in s1 if r.average_score >= 0.5)
    assert overall.n_real == truth
    assert sum(v.n_judged for k, v in rep.items() if k is not None) == 25

    # tuning table: stricter configs cover monotonically fewer
    # positions (island COUNT is not monotone — lower thresholds
    # merge adjacent islands — but total span is: superset flags +
    # weaker keep rule)
    tun = {(r.threshold, r.min_len): r.total_span
           for r in engine.island_tuning().collect()}
    assert tun[(0.5, 6)] >= tun[(0.6, 8)] >= tun[(0.7, 10)] >= tun[(0.8, 12)]
    assert tun[(0.8, 12)] > 0


def test_recommend_island_threshold_judged_decision(engine, tmp_path):
    """The tuning loop's final decision: per-config judged precision
    from recorded verdicts, exactly one chosen config, and the choice
    obeys the documented rule (max judged precision among configs
    covering >= 50% of the widest span; judged beats unjudged;
    strictest on ties)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "judgments")
    verdicts = engine.audit_islands().select(
        "doc_id", "model_id", "start_index",
        (F.col("average_score") >= 0.5).alias("is_real"))
    engine.record_island_judgments(verdicts, path)

    rows = engine.recommend_island_threshold(path).collect()
    assert len(rows) == 4
    assert sum(1 for r in rows if r.chosen) == 1
    chosen = next(r for r in rows if r.chosen)

    # the decision rule, re-derived from the returned table itself
    def rank_key(r):
        return (r.coverage >= 0.5, r.n_judged > 0, r.judged_precision,
                r.threshold, r.min_len)
    expect = max(rows, key=rank_key)
    assert (chosen.threshold, chosen.min_len) == \
        (expect.threshold, expect.min_len)

    # judged counts are consistent: every precision is n_real/n_judged
    for r in rows:
        if r.n_judged:
            assert abs(r.judged_precision - r.n_real / r.n_judged) < 1e-3
        else:
            assert r.judged_precision == 0.0
    # the flagship-config islands contain all 25 judged sample islands
    assert any(r.n_judged == 25 for r in rows)


def test_island_threshold_recommendation_scaffold(engine):
    """The registered data-only scaffold: one recommended row, always
    qualifying on coverage, and the pick maximizes mean island score
    among qualifying configs (strictest on ties)."""
    rows = engine.query("island_threshold_recommendation").collect()
    assert len(rows) == 4
    assert sum(1 for r in rows if r.recommended) == 1
    rec = next(r for r in rows if r.recommended)
    assert rec.coverage >= 0.5
    best = max((r for r in rows if r.coverage >= 0.5),
               key=lambda r: (r.mean_score_e6, r.threshold, r.min_len))
    assert (rec.threshold, rec.min_len) == (best.threshold, best.min_len)
    # the widest config's coverage is exactly 1
    assert max(r.coverage for r in rows) == 1.0


def test_island_judged_recommendation_matches_facade_on_fixture(engine):
    """The r10 registered judged-precision query and the api facade
    must be the SAME decision path (one shared core): feeding the
    facade a judgment store holding exactly the registered query's
    deterministic fixture rows reproduces the registered output row
    for row — so the driver hash-checking the query checks the
    facade's whole logic except the parquet read."""
    import tempfile

    from pyspark.sql import functions as F

    from transcript_analysis_spark.plans.domain import (
        _JUDGED_FIXTURE_CONFIG, _JUDGED_FIXTURE_REAL_BAR,
        sweep_islands_multi)

    got = sorted(map(tuple, engine.query(
        "island_judged_recommendation").collect()))
    assert len(got) == 4
    assert sum(1 for r in got if r[-1]) == 1        # exactly one chosen

    t, m = _JUDGED_FIXTURE_CONFIG
    fixture = (
        sweep_islands_multi(engine.spark, engine.sf_dir)
        .filter((F.col("threshold") == float(t))
                & (F.col("min_len") == int(m)))
        .filter((F.col("doc_id") * 31 + F.col("model_id") * 7
                 + F.col("start_index")) % 3 == 0)
        .select("doc_id", "model_id", "start_index",
                (F.col("average_score")
                 >= float(_JUDGED_FIXTURE_REAL_BAR)).alias("is_real")))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/judgments"
        engine.record_island_judgments(fixture, path)
        want = sorted(map(tuple,
                          engine.recommend_island_threshold(path)
                          .collect()))
    assert got == want
