"""Skew utilities + the 8values composite pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.operators import eightvalues as ev
from transcript_analysis_spark.operators.skew import salted_aggregate, salted_join

SF_DIR = "/root/testdata/sf0.001"


# --- skew ---------------------------------------------------------------

def _skewed_df(spark):
    # 90% of rows share one hot key
    hot = spark.range(9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {(r.k): (r.n, r.total, r.lo, r.hi) for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                 F.sum("v").alias("total"),
                                 F.min("v").alias("lo"),
                                 F.max("v").alias("hi")).collect()}
    salted = {(r.k): (r.n, r.total, r.lo, r.hi) for r in
              salted_aggregate(df, ["k"],
                               {"n": "count(*)", "total": "sum(v)",
                                "lo": "min(v)", "hi": "max(v)"}).collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = _skewed_df(spark)
    right = spark.range(60).select((F.col("id") + 1).alias("k"),
                                   (F.col("id") * 10).alias("w"))
    plain = sorted((r.k, r.v, r.w) for r in left.join(right, "k").collect())
    salted = sorted((r.k, r.v, r.w)
                    for r in salted_join(left, right, "k").collect())
    assert salted == plain


def test_salted_aggregate_rejects_non_algebraic(spark):
    with pytest.raises(ValueError):
        salted_aggregate(_skewed_df(spark), ["k"], {"a": "avg(v)"})


def test_auto_salted_aggregate_dispatch_and_equivalence(spark):
    """Stats-driven dispatch: skewed input takes the two-phase salted
    path, flat input the plain path — both exact."""
    from transcript_analysis_spark.operators.skew import (
        auto_salted_aggregate, key_skew_stats, recommend_salt_buckets)
    aggs = {"n": "count(*)", "total": "sum(v)"}

    skewed = _skewed_df(spark)
    assert recommend_salt_buckets(key_skew_stats(skewed, ["k"])) >= 2
    plain = {r.k: (r.n, r.total) for r in
             skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                     F.sum("v").alias("total")).collect()}
    auto = {r.k: (r.n, r.total) for r in
            auto_salted_aggregate(skewed, ["k"], aggs).collect()}
    assert auto == plain

    flat = spark.range(5000).select((F.col("id") % 100).alias("k"),
                                    F.col("id").alias("v"))
    assert recommend_salt_buckets(key_skew_stats(flat, ["k"])) == 1
    flat_plain = {r.k: (r.n, r.total) for r in
                  flat.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                        F.sum("v").alias("total")).collect()}
    flat_auto = {r.k: (r.n, r.total) for r in
                 auto_salted_aggregate(flat, ["k"], aggs).collect()}
    assert flat_auto == flat_plain


def test_recommend_salt_buckets_ceils_and_floors_at_two():
    from transcript_analysis_spark.operators.skew import (
        recommend_salt_buckets)
    assert recommend_salt_buckets({"skew_ratio": 4.0}) == 1   # at target
    assert recommend_salt_buckets({"skew_ratio": 4.5}) == 2   # just past
    assert recommend_salt_buckets({"skew_ratio": 7.9}) == 2
    assert recommend_salt_buckets({"skew_ratio": 9.0}) == 3   # ceil(2.25)
    assert recommend_salt_buckets({"skew_ratio": 1000.0}) == 64  # capped


# --- 8values composite --------------------------------------------------

def test_seed_runs_anti_join(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    runs = ev.seed_runs(docs, ["baseline", "probe"])
    assert runs.count() == 20
    done = runs.limit(5).select("run_id")
    remaining = ev.seed_runs(docs, ["baseline", "probe"], done=done)
    assert remaining.count() == 15


def test_rag_top_chunks_bounded_and_ranked(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(15)
    top = ev.rag_top_chunks(docs, "what is a filter?", top_k=3)
    rows = top.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.sim)
    assert all(len(v) <= 3 for v in by_doc.values())
    assert len(by_doc) == 15


def test_rag_top_chunks_no_key_collision_beyond_1000_chunks(spark):
    """Round-1 judge finding: a packed numeric chunk key
    (doc_id*1000+chunk_index) aliases keys once a document exceeds
    1000 chunks. A ~1100-chunk synthetic transcript must surface
    distinct chunk_index values above 1000 with no cross-doc bleed."""
    # ~40k words x >=1 token each / 220-token budget >> 1000 chunks
    big_text = " ".join(f"word{i}" for i in range(45000))
    docs = spark.createDataFrame(
        [(7, big_text), (8, "short doc two words")], ["doc_id", "text"])
    from transcript_analysis_spark.operators.chunking import \
        token_bounded_chunks
    n_chunks = (token_bounded_chunks(docs)
                .filter("doc_id = 7").count())
    assert n_chunks > 1000, f"setup: only {n_chunks} chunks"
    top = ev.rag_top_chunks(docs, "what is a filter?", top_k=5).collect()
    assert {r.doc_id for r in top} == {7, 8}
    idx7 = [r.chunk_index for r in top if r.doc_id == 7]
    assert len(idx7) == 5 and len(set(idx7)) == 5


def test_full_survey_scores_in_range(spark):
    out = ev.run_survey(spark, SF_DIR, n_questions=8).limit(200).collect()
    assert out
    for r in out:
        for ax in ("econ", "dipl", "govt", "scty"):
            v = getattr(r, f"score_{ax}")
            assert 0.0 <= v <= 100.0


def test_survey_deterministic(spark):
    a = sorted((r.run_id, r.score_econ) for r in
               ev.run_survey(spark, SF_DIR, n_questions=4).limit(50).collect())
    b = sorted((r.run_id, r.score_econ) for r in
               ev.run_survey(spark, SF_DIR, n_questions=4).limit(50).collect())
    assert a == b


def test_build_succinct_probes(spark):
    qs = spark.createDataFrame(
        [(0, "Taxes SHOULD rise")], ["question_id", "question_text"])
    r = ev.build_succinct_probes(qs).first()
    assert r.probe_for == "I strongly believe that taxes should rise"
    assert r.probe_against == "I strongly oppose the idea that taxes should rise"


def test_skew_stats_and_salt_recommendation(spark):
    from transcript_analysis_spark.operators.skew import (
        key_skew_stats, recommend_salt_buckets)
    # uniform key -> no salting recommended
    uniform = spark.range(1000).selectExpr("id % 10 as k", "id as v")
    s_uniform = key_skew_stats(uniform, ["k"])
    assert s_uniform["n_keys"] == 10
    assert recommend_salt_buckets(s_uniform) == 1
    # one hot key holding ~90% of rows -> salting recommended
    skewed = spark.range(1000).selectExpr(
        "case when id < 900 then 0 else id % 10 end as k", "id as v")
    s_skewed = key_skew_stats(skewed, ["k"])
    assert s_skewed["skew_ratio"] > 10
    rec = recommend_salt_buckets(s_skewed)
    assert 1 < rec <= 64
    # the recommendation feeds the salted aggregate and stays correct
    from transcript_analysis_spark.operators.skew import salted_aggregate
    got = {(r.k): (r.n, r.total) for r in salted_aggregate(
        skewed, ["k"], {"n": "count(*)", "total": "sum(v)"},
        salt_buckets=rec).collect()}
    exp = {(r.k): (r.n, r.total) for r in
           skewed.groupBy("k").agg(
               F.count(F.lit(1)).alias("n"),
               F.sum("v").alias("total")).collect()}
    assert got == exp


def test_parse_answer_source_rungs(spark):
    """answer_source labels the parse rung: JSON object, bare digit,
    or the Neutral(3) default (the refusal case)."""
    from transcript_analysis_spark.operators.eightvalues import parse_answers
    rows = [("a", '{"answer": 4} something'),
            ("b", "I pick 2 obviously"),
            ("c", "I refuse to answer that")]
    out = {r[0]: r for r in parse_answers(
        spark.createDataFrame(rows, ["run_id", "llm_out"])
    ).select("run_id", "answer", "answer_source").collect()}
    assert (out["a"].answer, out["a"].answer_source) == (4, "json")
    assert (out["b"].answer, out["b"].answer_source) == (2, "digit")
    assert (out["c"].answer, out["c"].answer_source) == (3, "default")


def test_calibration_report_roadmap_readout(spark):
    """ROADMAP W3: per model — baseline lean, probe swing (for minus
    against), refusal rate. Crafted frame: 'steerable' swings +2 with
    no refusals; 'stuck' reads the same both ways and refuses half."""
    from transcript_analysis_spark.operators.eightvalues import (
        calibration_report)
    rows = [
        # model, mode, answer, answer_source
        ("steerable", "baseline", 3, "json"),
        ("steerable", "baseline", 4, "json"),
        ("steerable", "probe_for", 5, "json"),
        ("steerable", "probe_for", 5, "digit"),
        ("steerable", "probe_against", 3, "json"),
        ("steerable", "probe_against", 3, "json"),
        ("stuck", "baseline", 3, "default"),
        ("stuck", "probe_for", 3, "json"),
        ("stuck", "probe_against", 3, "default"),
        ("stuck", "probe_against", 3, "json"),
    ]
    df = spark.createDataFrame(
        rows, ["model", "mode", "answer", "answer_source"])
    rep = {r.model: r for r in calibration_report(df).collect()}
    s = rep["steerable"]
    assert (s.baseline_lean, s.mean_for, s.mean_against) == (3.5, 5.0, 3.0)
    assert s.probe_swing == 2.0 and s.refusal_rate == 0.0
    t = rep["stuck"]
    assert t.probe_swing == 0.0 and t.baseline_lean == 3.0
    assert t.refusal_rate == 0.5 and t.n_answers == 4 and t.n_refused == 2
