"""Golden-output drift guards: stable fingerprints of key query
results at sf0.001. A failure here means query SEMANTICS changed —
if the change is intentional, re-derive the constants with the
snippet in each assertion message.
"""

from __future__ import annotations

import hashlib

SF_DIR = "/root/testdata/sf0.001"


def _fingerprint(df) -> tuple[int, str]:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(repr(r[c]) for c in cols) for r in df.collect())
    digest = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), digest


def _q(spark, name):
    from transcript_analysis_spark.plans import all_queries
    return all_queries()[name].fn(spark, SF_DIR)


def test_islands_flagship_golden(spark):
    n, d = _fingerprint(_q(spark, "islands_flagship"))
    assert (n, d) == (3512, "e18413c03e77010b"), (
        f"islands output drifted: ({n}, {d!r}) — if intentional, update "
        f"via tests/test_golden_outputs.py::_fingerprint")


def test_ngram_model_score_golden(spark):
    n, d = _fingerprint(_q(spark, "ngram_model_score"))
    assert (n, d) == (10000, "d33982e5fd2afc4d"), (
        f"ngram scoring drifted: ({n}, {d!r})")


def test_minhash_pairs_golden(spark):
    n, d = _fingerprint(_q(spark, "minhash_lsh_candidate_pairs"))
    assert (n, d) == (40, "a7e955acde2f6c3e"), (
        f"minhash pairs drifted: ({n}, {d!r})")


def test_tfidf_top_terms_golden(spark):
    n, d = _fingerprint(_q(spark, "tfidf_top_terms"))
    assert (n, d) == (1500, "7de5214f55a1e4f9"), (
        f"tfidf drifted: ({n}, {d!r})")


def test_contamination_overlap_golden(spark):
    n, d = _fingerprint(_q(spark, "contamination_overlap"))
    assert (n, d) == (50, "14f4b430282a5922"), (
        f"contamination drifted: ({n}, {d!r})")


def test_ivf_topk_probe_golden(spark):
    # re-pinned in r7: the nprobe default moved 2 -> 8 (the tuned
    # IVF_NPROBE promoted from ann_param_sweep), an intentional
    # semantics change verified oracle-green at all three SFs
    n, d = _fingerprint(_q(spark, "ivf_topk_probe"))
    assert (n, d) == (10, "8ad0f6794218f0dc"), (
        f"ivf probe drifted: ({n}, {d!r})")


def test_events_dedup_first_golden(spark):
    n, d = _fingerprint(_q(spark, "events_dedup_first"))
    assert (n, d) == (5, "5aabb1b545ae9781"), (
        f"events dedup drifted: ({n}, {d!r})")


def test_quality_signal_family_golden(spark):
    expected = {
        "repetition_signals": (500, "392fb50835144343"),
        "quality_classifier_scores": (500, "03144e73d79ee9f0"),
        "ccnet_quality_buckets": (15, "f66f38778d140038"),
        "crossdoc_shingle_dup_rate": (500, "26f5d30756ff8b6f"),
        "training_data_prep": (258, "a546b026825c971b"),
    }
    for name, want in expected.items():
        n, d = _fingerprint(_q(spark, name))
        assert (n, d) == want, (
            f"{name} drifted: ({n}, {d!r}) — if intentional, update "
            f"via tests/test_golden_outputs.py::_fingerprint")


def test_simhash_hamming_pairs_golden(spark):
    n, d = _fingerprint(_q(spark, "simhash_hamming_pairs"))
    assert (n, d) == (521, "f6cfa0c879752761"), (
        f"simhash pairs drifted: ({n}, {d!r}) — if intentional, update "
        f"via tests/test_golden_outputs.py::_fingerprint")


def test_recursive_gapfill_fills_gaps(spark):
    """The recursive-CTE month series must cover the full fiscal
    window with zero-filled rows for months that have no orders (the
    point of gap-filling), one row per month."""
    rows = {r["month"]: r for r in
            _q(spark, "sql_frontend_recursive_gapfill").collect()}
    assert len(rows) == 84  # 1995-01 .. 2001-12
    assert rows["2001-12"]["n_orders"] == 0
    assert rows["2001-12"]["revenue"] == 0.0
    filled = [m for m, r in rows.items() if r["n_orders"] == 0]
    busy = [m for m, r in rows.items() if r["n_orders"] > 0]
    assert filled and busy


def test_power_iteration_top_pc_golden(spark):
    n, d = _fingerprint(_q(spark, "power_iteration_top_pc"))
    assert (n, d) == (4, "a3eb03143f551ef7"), (
        f"power-iteration trajectory drifted: ({n}, {d!r})")


def test_isotropy_repair_residuals_golden(spark):
    n, d = _fingerprint(_q(spark, "isotropy_repair_residuals"))
    assert (n, d) == (500, "f04a3d91dfbe3e1c"), (
        f"isotropy repair drifted: ({n}, {d!r})")


def test_island_judged_recommendation_golden(spark):
    # r10: the judged-precision pick — fixture precisions 0.4614 /
    # 0.4614 / 0.359 / 0.0 (the 0.5-vs-0.6 tie exercises the
    # threshold-DESC tie-break), chosen = (0.6, 8)
    n, d = _fingerprint(_q(spark, "island_judged_recommendation"))
    assert (n, d) == (4, "6a2821f038130ace"), (
        f"judged recommendation drifted: ({n}, {d!r})")
