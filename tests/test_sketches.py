"""Invariant tests for plans/sketches.py (oracle parity is covered by
the parametrized sweep in test_oracle_parity.py; these pin the
properties the oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from transcript_analysis_spark.plans import sketches


def test_cms_never_underestimates(spark):
    """The count-min guarantee: est >= exact for every queried token
    (min over k counters can only over-count via collisions)."""
    rows = sketches.cms_heavy_hitters(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_est >= r.exact_cnt for r in rows)


def test_phrase_search_matches_substring_count(spark):
    """Independent derivation: with single-space tokenization, phrase
    hits equal occurrences of ' a b ' in the space-padded text
    (overlap-free because the two phrase words differ)."""
    got = {r.doc_id: r.n_hits
           for r in sketches.inverted_phrase_search(spark, SF_SMOKE).collect()}
    a, b = sketches.PHRASE
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    expect = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id",
            (F.size(F.split(F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
                            f" {a} {b} ", -1)) - 1).alias("n"))
        .filter(F.col("n") > 0).collect()}
    assert got == expect


def test_psi_contributions_nonnegative(spark):
    """(pA - pB) * ln(pA / pB) >= 0 termwise — sign(pA - pB) always
    equals sign(ln(pA/pB)); a negative contribution means the formula
    split across engines."""
    rows = sketches.token_psi_drift(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.psi_contrib >= 0 for r in rows)


def test_kmeans_partitions_corpus_and_zero_shuffle_assign(spark):
    """Every vector lands in exactly one cluster (counts sum to the
    corpus), centroids carry all KM_DIM dims, and the assignment step
    is per-row math against a literal centroid array — its plan
    contains NO join and NO exchange (the update aggregate is the only
    shuffle per Lloyd round)."""
    out = sketches.kmeans_centroids(spark, SF_SMOKE).collect()
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert sum(r.n_assigned for r in out) == n_vecs
    assert all(len(r.centroid_q.split(",")) == sketches.KM_DIM for r in out)

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = e.select("vec_id", F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * sketches.KM_SCALE + F.lit(0.5))
        .cast("bigint")).alias("v"))
    centroids = [(i, [0] * sketches.KM_DIM) for i in range(sketches.KM_K)]
    plan = sketches._km_assign(vecs, centroids)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_hll_estimate_within_5pct(spark):
    """m=1024 registers -> ~3.25% standard error; pin 5%. Guards the
    mixer quality — the weak polynomial hash gave 47% error."""
    rows = sketches.hll_distinct_profile(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert abs(r.hll_est - r.n_exact) <= 0.05 * r.n_exact + 2.0


def test_hll_mixer_is_collision_free_on_consecutive_ids():
    """The 32-bit avalanche mixer is a bijection (every step is
    invertible mod 2^32), so consecutive ids — the worst case that
    broke the polynomial hash — can never collide."""
    def mix(x):
        x &= 0xFFFFFFFF
        x = (((x >> 16) ^ x) * 0x45d9f3b) & 0xFFFFFFFF
        x = (((x >> 16) ^ x) * 0x45d9f3b) & 0xFFFFFFFF
        return (x >> 16) ^ x
    seen = {mix(i) for i in range(100_000)}
    assert len(seen) == 100_000


def test_binned_quantile_within_bin_width(spark):
    """Histogram quantile error is bounded by one bin width
    (range / 2048) — the sketch's contract."""
    rows = sketches.binned_quantile_estimate(spark, SF_SMOKE).collect()
    assert {r.quantile for r in rows} == set(sketches.QSK_QS)
    import pyspark.sql.functions as SF
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lo, hi = o.agg(SF.min("o_totalprice"), SF.max("o_totalprice")).first()
    width = (hi - lo) / sketches.QSK_BINS
    for r in rows:
        assert abs(r.est - r.exact) <= width


def test_embedding_outliers_cover_corpus_and_flag_far_points(spark):
    """Every vector scored once; flags are exactly dist2 > 4x the
    cluster median; a median-based threshold can never flag the
    majority of a cluster."""
    from transcript_analysis_spark.plans.sketches import (
        embedding_outlier_scores,
    )
    rows = embedding_outlier_scores(spark, SF_SMOKE).collect()
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    by_cid: dict[int, list] = {}
    for r in rows:
        assert r.outlier == (float(r.dist2) > 4.0 * r.med_dist2)
        by_cid.setdefault(r.cid, []).append(r)
    for g in by_cid.values():
        assert sum(1 for r in g if r.outlier) <= len(g) / 2


def test_power_iteration_corpus_trajectory(spark):
    """Corpus run: 4 rounds, direction quantized to +/-2^14, and the
    cosine to numpy's true top eigenvector increases every round.
    The synthetic embeddings are near-isotropic (top/second
    eigenvalue ratio ~1.07), so 4 rounds cannot CONVERGE here — the
    planted-direction fixture below proves convergence; this test
    proves the corpus trajectory moves monotonically toward the true
    principal direction (and the oracle hash-checks its exactness)."""
    import numpy as np

    rows = sorted(
        sketches.power_iteration_top_pc(spark, SF_SMOKE).collect(),
        key=lambda r: r.round_id)
    assert [r.round_id for r in rows] == [1, 2, 3, 4]
    X = np.array(
        [np.array(v, dtype=np.float64) for (v,) in
         spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
         .select("embedding").collect()])
    Xc = X - X.mean(axis=0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc)
    top = evecs[:, -1]
    cos = []
    for r in rows:
        w = np.array([int(x) for x in r.dir_q.split(",")], float)
        assert int(np.max(np.abs(w))) == sketches.PI_DIR_SCALE
        cos.append(abs(w @ top) / (np.linalg.norm(w) * np.linalg.norm(top)))
    assert all(b > a for a, b in zip(cos, cos[1:])), cos
    assert cos[-1] > 2.0 * cos[0]


def test_power_iteration_recovers_planted_direction(spark, tmp_path):
    """Mechanism proof on a corpus that HAS a dominant direction:
    vectors = g*u + 0.05*noise for a fixed unit u — after 4 rounds
    the recovered direction's |cos| to u exceeds 0.999 (the
    perceptron separable-fixture discipline applied to PCA)."""
    import numpy as np

    rng = np.random.default_rng(7)
    u = rng.normal(size=64)
    u /= np.linalg.norm(u)
    g = rng.normal(size=(400, 1))
    noise = rng.normal(size=(400, 64)) * 0.05
    X = (g * u + noise).astype(np.float32)
    rows = [(int(i), [float(x) for x in X[i]], 0) for i in range(400)]
    d = str(tmp_path / "planted")
    (spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
     .write.parquet(f"{d}/embeddings.parquet"))
    out = sorted(
        sketches.power_iteration_top_pc(spark, d).collect(),
        key=lambda r: r.round_id)
    w = np.array([int(x) for x in out[-1].dir_q.split(",")], float)
    cos = abs(w @ u) / (np.linalg.norm(w) * np.linalg.norm(u))
    assert cos > 0.999, cos


def test_isotropy_repair_residuals_semantics(spark, tmp_path):
    """norm2_before - resid_norm2 ~ proj_q^2 / (w.w) (the removed
    variance IS the projection's energy, up to per-coordinate
    half-up rounding), and on the planted-direction corpus the
    repair removes almost ALL the variance — the operator's purpose."""
    import numpy as np

    rng = np.random.default_rng(11)
    u = rng.normal(size=64)
    u /= np.linalg.norm(u)
    g = rng.normal(size=(300, 1)) * 3.0
    X = (g * u + rng.normal(size=(300, 64)) * 0.02).astype(np.float32)
    rows = [(int(i), [float(x) for x in X[i]], 0) for i in range(300)]
    d = str(tmp_path / "planted")
    (spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
     .write.parquet(f"{d}/embeddings.parquet"))

    out = sketches.isotropy_repair_residuals(spark, d).collect()
    assert len(out) == 300
    tot_before = sum(r.norm2_before for r in out)
    tot_after = sum(r.resid_norm2 for r in out)
    # planted corpus: >99% of centered variance lives on u
    assert tot_after < 0.01 * tot_before, (tot_after, tot_before)
    for r in out:
        assert 0 <= r.resid_norm2 <= r.norm2_before


def test_isotropy_repair_covers_corpus(spark):
    """Every embedding gets exactly one residual row. Exact
    projection removal never increases a norm; the half-up coordinate
    rounding can add at most ||r - r*||^2 + 2||r*|| ||r - r*|| with
    ||r - r*|| <= sqrt(64)/2 = 4, i.e. slack <= 8*sqrt(before) + 16
    (binding only when the true projection is ~0, as on this
    near-isotropic corpus)."""
    import math

    out = sketches.isotropy_repair_residuals(spark, SF_SMOKE).collect()
    n_vecs = spark.read.parquet(
        f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(out) == n_vecs
    assert len({r.vec_id for r in out}) == n_vecs
    for r in out:
        slack = 8 * math.isqrt(r.norm2_before) + 16
        assert r.resid_norm2 <= r.norm2_before + slack, r
