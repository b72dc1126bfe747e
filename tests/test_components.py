"""Large-star/small-star connected components (operators/components.py)
— the O(log n)-round CC that backs near-dup clustering."""

from __future__ import annotations

import random

import pytest

from transcript_analysis_spark.operators.components import (
    connected_components)


def _labels(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    return {r.n: r.label for r in connected_components(df).collect()}


def _expected_components(edges):
    """Driver-side union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_two_triangles_and_a_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)]
    got = _labels(spark, edges)
    assert got == {n: 1 for n in [1, 2, 3, 10, 11, 12]}


def test_disjoint_components_keep_min_labels(spark):
    edges = [(5, 9), (9, 7), (20, 21), (30, 31), (31, 32)]
    got = _labels(spark, edges)
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_path_graph_diameter_beyond_propagation_budget(spark):
    """VERDICT r2 #4 done-criterion: a chain far longer than the old
    min-label-propagation budget (30 rounds) converges — star
    contraction's round count grows with log(n), not diameter."""
    n = 200  # diameter 199
    ids = list(range(1000, 1000 + n))
    random.Random(7).shuffle(ids)  # ids uncorrelated with chain position
    edges = list(zip(ids, ids[1:]))
    got = _labels(spark, edges)
    root = min(ids)
    assert got == {i: root for i in ids}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(300))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(250)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _labels(spark, edges)
    assert got == _expected_components(edges)


def test_neardup_components_uses_star_contraction(spark):
    """The registered query rides connected_components and returns one
    row per cluster with the min doc_id as canonical."""
    from transcript_analysis_spark.plans import all_queries
    df = all_queries()["neardup_components"].fn(
        spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_members >= 2  # LSH pairs always give >=2-node comps
        assert r.canonical_doc_id == r.component_id


def test_lsh_band_tuning_report_consistency(spark):
    """The tuning report's b4r2 row must measure EXACTLY the
    production banding: its candidate count equals the registered
    minhash_lsh_candidate_pairs output (same 4x2 split), and every
    row's counts/ratios are internally consistent."""
    from transcript_analysis_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    rows = {r.config: r for r in
            all_queries()["lsh_band_tuning_report"].fn(spark, sf).collect()}
    assert set(rows) == {"b8r1", "b4r2", "b2r4", "b1r8"}
    prod = all_queries()["minhash_lsh_candidate_pairs"].fn(spark, sf).count()
    assert rows["b4r2"].n_candidates == prod
    n_truth = {r.n_truth for r in rows.values()}
    assert len(n_truth) == 1                     # same truth set per row
    for r in rows.values():
        assert r.n_hits <= min(r.n_candidates, r.n_truth)
        assert abs(r.precision_at_t
                   - r.n_hits / max(r.n_candidates, 1)) < 5e-7
        assert abs(r.recall_at_t - r.n_hits / max(r.n_truth, 1)) < 5e-7
        assert 0.0 <= r.p_capture_theory <= 1.0
    # more rows per band => fewer (or equal) candidates: the S-curve's
    # conjunction direction, structurally guaranteed since an r=2k
    # band collision implies both r=k sub-band collisions
    assert rows["b8r1"].n_candidates >= rows["b4r2"].n_candidates \
        >= rows["b2r4"].n_candidates >= rows["b1r8"].n_candidates
