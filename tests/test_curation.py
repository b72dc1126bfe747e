"""Curation operators (plans/curation.py): invariants and plan gates
for PII k-anonymity, duplicate-span coverage, canonical selection, and
int8 quantization. Value-level correctness is oracle-checked by
tools/check_correctness.py; these pin the properties the oracle
comparison cannot see."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(spark, name):
    from transcript_analysis_spark.plans import all_queries
    return all_queries()[name].fn(spark, SF_DIR)


# --- pii_k_anonymity ------------------------------------------------------

def test_k_anonymity_holds_for_released_groups(spark):
    """The defining property: every non-suppressed quasi-identifier
    combination that survives release is shared by >= k rows, no
    digits survive masking, and suppressed rows carry only
    sentinels."""
    from transcript_analysis_spark.plans.curation import (
        K_ANON, SUPPRESSED_INT, SUPPRESSED_STR)
    rows = _q(spark, "pii_k_anonymity").collect()
    assert len(rows) > 0
    released: dict[tuple, int] = {}
    for r in rows:
        assert not any(ch.isdigit() for ch in r["name_masked"])
        assert r["name_token"].startswith("cust-")
        if r["suppressed"]:
            assert r["nation_out"] == SUPPRESSED_INT
            assert r["segment_out"] == SUPPRESSED_STR
            assert r["bal_bucket_out"] == SUPPRESSED_INT
            assert r["group_size"] < K_ANON
        else:
            assert r["group_size"] >= K_ANON
            key = (r["nation_out"], r["segment_out"], r["bal_bucket_out"])
            released[key] = released.get(key, 0) + 1
    for key, n in released.items():
        assert n >= K_ANON, f"released group {key} has only {n} rows"


def test_k_anonymity_pseudonyms_are_stable_and_distinct(spark):
    """The pseudonym must be (a) deterministic across runs — joinable
    between corpus releases — and (b) collision-free on this corpus
    (distinct customers keep distinct tokens)."""
    a = {r["c_custkey"]: r["name_token"]
         for r in _q(spark, "pii_k_anonymity").collect()}
    b = {r["c_custkey"]: r["name_token"]
         for r in _q(spark, "pii_k_anonymity").collect()}
    assert a == b
    assert len(set(a.values())) == len(a)


def test_k_anonymity_group_stats_broadcast(spark):
    """The group-size table must reach the fact rows via broadcast —
    the fact table is never shuffled for suppression."""
    plan = plan_of(_q(spark, "pii_k_anonymity"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- duplicate_ngram_coverage --------------------------------------------

def test_dup_coverage_bounds_and_position_count(spark):
    """Coverage is a fraction of positional 3-grams: n_positions =
    max(word_count - 2, 0) per doc, dup positions never exceed
    positions, and the fraction matches the counts."""
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .collect()}
    rows = _q(spark, "duplicate_ngram_coverage").collect()
    assert len(rows) > 0
    for r in rows:
        expect = max(len(docs[r["doc_id"]].split(" ")) - 2, 0)
        assert r["n_positions"] == expect
        assert 0 <= r["n_dup_positions"] <= r["n_positions"]
        assert 0.0 <= r["dup_fraction"] <= 1.0


def test_dup_coverage_flags_an_injected_duplicate(spark, tmp_path):
    """A corpus of two identical docs + one with a unique vocabulary:
    the copies are 100% covered, the unique doc 0%."""
    from transcript_analysis_spark.plans.curation import (
        duplicate_ngram_coverage)
    base = "alpha beta gamma delta epsilon zeta"
    uniq = "one two three four five six"
    spark.createDataFrame(
        [(1, base, "en", "s", len(base)),
         (2, base, "en", "s", len(base)),
         (3, uniq, "en", "s", len(uniq))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in
           duplicate_ngram_coverage(spark, str(tmp_path)).collect()}
    assert out[1]["dup_fraction"] == 1.0
    assert out[2]["dup_fraction"] == 1.0
    assert out[3]["dup_fraction"] == 0.0


def test_dup_coverage_no_cartesian_jvm_side(spark):
    plan = plan_of(_q(spark, "duplicate_ngram_coverage"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# --- dedup_keep_best ------------------------------------------------------

def test_keep_best_partitions_every_component_member(spark):
    """Every component keeps exactly one doc, counts add up, and the
    kept doc is a real member that maximizes (n_chars, -doc_id)."""
    comps = {r["component_id"]: r
             for r in _q(spark, "neardup_components").collect()}
    kept = {r["component_id"]: r
            for r in _q(spark, "dedup_keep_best").collect()}
    assert set(kept) == set(comps)
    for cid, r in kept.items():
        assert r["n_members"] == comps[cid]["n_members"]
        assert r["n_discarded"] == r["n_members"] - 1
        assert r["kept_doc_id"] >= cid  # label is the component min


def test_keep_best_prefers_longest_then_smallest_id(spark, tmp_path):
    """Three near-identical docs; the longest must win, and among
    equal lengths the smallest doc_id."""
    from transcript_analysis_spark.plans.curation import dedup_keep_best
    text = "spark batch shuffle join agg window " * 6
    spark.createDataFrame(
        [(10, text + "tail", "en", "s", len(text) + 4),
         (11, text, "en", "s", len(text)),
         (12, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    rows = dedup_keep_best(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_members"] == 3 and r["kept_doc_id"] == 10
    # remove the longest: tie between 11 and 12 -> smallest id wins
    spark.createDataFrame(
        [(11, text, "en", "s", len(text)),
         (12, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/tie/documents.parquet")
    rows = dedup_keep_best(spark, f"{tmp_path}/tie").collect()
    assert len(rows) == 1 and rows[0]["kept_doc_id"] == 11


def test_keep_best_selection_is_aggregate_not_window(spark):
    """The winner comes from a struct-max hash aggregate — there must
    be no window exchange/sort for the selection step."""
    plan = plan_of(_q(spark, "dedup_keep_best"))
    assert "Window" not in plan


# --- embedding_int8_quantize ---------------------------------------------

def test_quantize_reconstruction_error_bounded(spark):
    """Symmetric int8 quantization bounds the per-element error by
    scale/254 (half a quantization step) plus truncation: error
    <= scale/127. The fixed-point outputs must respect that bound."""
    rows = _q(spark, "embedding_int8_quantize").collect()
    assert len(rows) > 0
    for r in rows:
        scale = r["scale_e6"] / 1e6
        err = r["mean_abs_err_e9"] / 1e9
        assert r["dim"] == 64
        assert 0 <= r["n_saturated"] <= r["dim"]
        # at least the max element saturates to +-127 after trunc only
        # when exactly representable; bound err by one full step
        assert err <= scale / 127.0 + 1e-9
        assert scale >= 0.0


def test_quantize_roundtrip_against_numpy(spark):
    """Recompute the quantization in numpy for a sample of vectors and
    match the engine's fixed-point outputs exactly."""
    import math

    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .limit(20).collect())
    got = {r["vec_id"]: r for r in _q(spark, "embedding_int8_quantize")
           .collect()}
    for e in emb:
        v = [float(x) for x in e["embedding"]]
        scale = max((abs(x) for x in v), default=0.0)
        r = got[e["vec_id"]]
        assert r["scale_e6"] == int(math.trunc(scale * 1e6))
        if scale == 0.0:
            assert r["mean_abs_err_e9"] == 0
            continue
        q = [math.trunc(x * 127.0 / scale) for x in v]
        err = sum(abs(x - qi * scale / 127.0)
                  for x, qi in zip(v, q))
        assert r["n_saturated"] == sum(1 for qi in q if abs(qi) == 127)
        assert r["mean_abs_err_e9"] == int(
            math.trunc(err / len(v) * 1e9))


def test_quantize_is_map_only(spark):
    """Per-row array math: no shuffle beyond the fanout repartition,
    no Python evaluation."""
    plan = plan_of(_q(spark, "embedding_int8_quantize"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # exactly the one round-robin fanout exchange, nothing key-based
    import re
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "RoundRobinPartitioning" for e in exchanges), exchanges
