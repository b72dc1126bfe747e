"""MLlib LSH ANN operators (X15): recall against brute force."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from transcript_analysis_spark.operators.ann import (
    approx_nearest_neighbors, approx_similarity_pairs)

SF_DIR = "/root/testdata/sf0.001"


def test_ann_topk_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.collect()
    q = [float(x) for x in rows[0].embedding]

    def dist(v):
        return math.sqrt(sum((float(a) - b) ** 2 for a, b in zip(v, q)))

    brute = sorted(rows, key=lambda r: dist(r.embedding))[:10]
    brute_ids = {r.vec_id for r in brute}
    got = approx_nearest_neighbors(emb, q, k=10, bucket_length=4.0,
                                   num_tables=5)
    got_ids = {r.vec_id for r in got.collect()}
    # approximate: demand decent recall, not exactness
    assert len(got_ids & brute_ids) >= 6, (got_ids, brute_ids)


def test_ann_pairs_subset_of_true_pairs(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    pairs = approx_similarity_pairs(emb, threshold=3.5, bucket_length=4.0,
                                    num_tables=5)
    got = pairs.collect()
    assert got, "LSH join found no pairs at this threshold"
    # every reported distance must be genuine (verify a sample exactly)
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}
    for r in got[:20]:
        d = math.sqrt(sum((a - b) ** 2 for a, b in
                          zip(vecs[r.vec_a], vecs[r.vec_b])))
        assert abs(d - r.euclidean_dist) < 1e-4
        assert d <= 3.5 + 1e-9


def test_ivf_probe_recall_vs_brute_force(spark):
    """IVF probe (nprobe=2 of ~10 buckets) must recover a meaningful
    share of the true cosine top-10 — the recall/cost trade the
    operator exists to make. Deterministic: both queries are exact
    arithmetic, so this pins a constant."""
    from transcript_analysis_spark.plans import all_queries
    exact = {r.vec_id for r in
             all_queries()["embedding_cosine_topk"].fn(spark, SF_DIR)
             .collect()}
    ivf = {r.vec_id for r in
           all_queries()["ivf_topk_probe"].fn(spark, SF_DIR).collect()}
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall} ({ivf} vs {exact})"


def test_pq_rerank_recall_vs_brute_force(spark):
    """PQ ADC shortlist (top-100) + exact re-rank must recover a
    meaningful share of the true L2 top-10. The synthetic embeddings
    are near-uniform — the hardest case for coarse quantization (the
    true top-10 distances bunch within the quantization error), which
    is exactly why the operator re-ranks a shortlist instead of
    trusting raw ADC order (raw-ADC recall here is ~0.1; shortlisted
    re-rank measures 0.7). Deterministic: both sides are exact
    arithmetic over fixed data."""
    import math
    from transcript_analysis_spark.plans import all_queries
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    q = [float(x) for x in next(r for r in emb if r.vec_id == 0).embedding]

    def d2(v):
        return sum((float(a) - b) ** 2 for a, b in zip(v, q))

    brute = sorted((r for r in emb if r.vec_id != 0),
                   key=lambda r: (d2(r.embedding), r.vec_id))[:10]
    brute_ids = {r.vec_id for r in brute}
    got = all_queries()["pq_topk_adc"].fn(spark, SF_DIR).collect()
    got_ids = {r.vec_id for r in got}
    recall = len(got_ids & brute_ids) / 10
    assert recall >= 0.6, f"PQ rerank recall collapsed: {recall}"
    # the re-ranked exact distances must BE exact (spot-check all 10)
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    for r in got:
        assert abs(r.exact_dist - round(d2(vecs[r.vec_id]), 6)) < 1e-9


def test_ann_recall_report_floors_at_bench_scale(spark):
    """VERDICT r5 item 2 done-criterion: the registered recall report,
    run at the BENCH scale (sf0.1, 5000 vectors), must show IVF and
    PQ clearing their recall floors, every candidate set genuinely
    sub-corpus (the whole point of an index), and the recall column
    arithmetically consistent with its own hit counts. Deterministic:
    all three variants are exact integer/fixed-arithmetic pipelines."""
    from transcript_analysis_spark.plans import all_queries
    rows = {r.variant: r for r in
            all_queries()["ann_recall_report"].fn(
                spark, "/root/testdata/sf0.1").collect()}
    assert set(rows) == {"rp_lsh_bucket", "ivf_nprobe2", "pq_adc_rerank"}
    n_corpus = (spark.read.parquet(
        "/root/testdata/sf0.1/embeddings.parquet").count() - 1)
    for r in rows.values():
        assert r.k == 10
        assert 0 < r.n_candidates < n_corpus / 5, (
            f"{r.variant} candidate set is not sub-corpus: "
            f"{r.n_candidates}/{n_corpus}")
        assert r.recall_at_k == r.n_hits / 10
    assert rows["ivf_nprobe2"].recall_at_k >= 0.2
    assert rows["pq_adc_rerank"].recall_at_k >= 0.5


def test_mllib_lsh_recall_floor_vs_brute_force(spark):
    """The MLlib LSH variant cannot join the oracle-checked report
    (seeded JVM RNG is not SQL-reproducible), so its recall evidence
    lives here, against the same brute-force ground truth."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = emb.collect()
    q = [float(x) for x in next(r for r in rows if r.vec_id == 0).embedding]
    brute = sorted((r for r in rows if r.vec_id != 0),
                   key=lambda r: (math.sqrt(sum(
                       (float(a) - b) ** 2
                       for a, b in zip(r.embedding, q))), r.vec_id))[:10]
    got = approx_nearest_neighbors(emb.filter(F.col("vec_id") != 0), q,
                                   k=10, bucket_length=4.0, num_tables=5)
    recall = len({r.vec_id for r in got.collect()}
                 & {r.vec_id for r in brute}) / 10
    assert recall >= 0.6, f"MLlib LSH recall collapsed: {recall}"
