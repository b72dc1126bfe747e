"""Scale-path operators (plans/scale_ops.py): invariants and plan
gates for the bloom prefilter, sequence packing, winsorization, and
Z-order locality. Value-level correctness is oracle-checked by
tools/check_correctness.py; these tests pin the properties the oracle
comparison cannot see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(spark, name):
    from transcript_analysis_spark.plans import all_queries
    return all_queries()[name].fn(spark, SF_DIR)


# --- bloom prefilter -----------------------------------------------------

def test_bloom_never_misses_a_true_positive(spark):
    """A bloom filter has false positives but NO false negatives: the
    exact overlap must be identical to the unfiltered contamination
    query's, and candidates must cover every overlap."""
    bloom = _q(spark, "bloom_prefilter_contamination").collect()
    exact = {r["doc_id"]: r["n_overlap"]
             for r in _q(spark, "contamination_overlap").collect()}
    assert len(bloom) > 0
    for r in bloom:
        assert r["n_overlap"] == exact[r["doc_id"]]
        assert r["n_candidates"] >= r["n_overlap"]
        assert r["n_false_positives"] == r["n_candidates"] - r["n_overlap"]
        assert 0 <= r["n_candidates"] <= r["n_shingles"]


def test_bloom_prefilter_is_selective(spark):
    """The point of the prefilter: at the filter's design load the FP
    rate is tiny, so candidates ~= true overlaps, not ~= shingles."""
    agg = (_q(spark, "bloom_prefilter_contamination")
           .agg(F.sum("n_shingles").alias("s"),
                F.sum("n_candidates").alias("c"),
                F.sum("n_false_positives").alias("fp")).collect()[0])
    # false positives must be a small fraction of probed shingles
    assert agg["fp"] <= max(2, agg["s"] // 100)


def test_bloom_plan_broadcasts_bitmap_no_cartesian(spark):
    plan = plan_of(_q(spark, "bloom_prefilter_contamination"))
    assert "CartesianProduct" not in plan
    # probe and train are checkpointed (each shingling runs once, for
    # both output branches) — the final plan reads the materialized
    # RDDs instead of re-deriving them
    assert "Scan ExistingRDD" in plan
    # probe-side bit math is JVM expression work, not Python
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# --- sequence packing ----------------------------------------------------

def test_sequence_packing_budget_and_contiguity(spark):
    from transcript_analysis_spark.plans.scale_ops import PACK_BUDGET_TOKENS
    rows = _q(spark, "sequence_packing").collect()
    assert len(rows) > 0
    by_seq: dict[tuple, list] = {}
    for r in rows:
        by_seq.setdefault((r["lang"], r["seq_no"]), []).append(r)
    for (_lang, _seq), docs in by_seq.items():
        docs.sort(key=lambda r: r["doc_id"])
        total = sum(r["n_tokens"] for r in docs)
        # a sequence holds >1 doc only within budget; an oversized
        # single doc may exceed it alone
        if len(docs) > 1:
            assert total <= PACK_BUDGET_TOKENS
        # offsets are the running sum of earlier docs in the sequence
        run = 0
        for r in docs:
            assert r["seq_offset"] == run
            run += r["n_tokens"]


def test_sequence_packing_is_greedy_next_fit(spark):
    """First doc that would overflow the budget must START the next
    sequence — no doc is skipped or reordered (doc_id order within
    lang is the packing order)."""
    from transcript_analysis_spark.plans.scale_ops import PACK_BUDGET_TOKENS
    rows = sorted(_q(spark, "sequence_packing").collect(),
                  key=lambda r: (r["lang"], r["doc_id"]))
    prev = {}
    for r in rows:
        if r["lang"] in prev:
            p = prev[r["lang"]]
            assert r["seq_no"] in (p["seq_no"], p["seq_no"] + 1)
            if r["seq_no"] == p["seq_no"]:
                fill = p["seq_offset"] + p["n_tokens"]
                assert fill == 0 or fill + r["n_tokens"] <= PACK_BUDGET_TOKENS
            else:
                assert r["seq_offset"] == 0
        else:
            assert r["seq_no"] == 0 and r["seq_offset"] == 0
        prev[r["lang"]] = r


def test_sharded_packing_keeps_budget_and_contiguous_ids(spark):
    from transcript_analysis_spark.plans.scale_ops import PACK_BUDGET_TOKENS
    rows = _q(spark, "sequence_packing_sharded").collect()
    assert len(rows) > 0
    by_seq: dict[tuple, list] = {}
    langs: dict[str, set] = {}
    for r in rows:
        by_seq.setdefault((r["lang"], r["seq_no"]), []).append(r)
        langs.setdefault(r["lang"], set()).add(r["seq_no"])
    for (_l, _s), docs in by_seq.items():
        if len(docs) > 1:
            assert sum(r["n_tokens"] for r in docs) <= PACK_BUDGET_TOKENS
        docs.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in docs:
            assert r["seq_offset"] == run
            run += r["n_tokens"]
    # global seq ids are contiguous 0..max per lang (shard offsets add
    # up exactly)
    for _l, ids in langs.items():
        assert ids == set(range(len(ids)))


def test_sharded_packing_matches_unsharded_doc_set(spark):
    """Sharding changes sequence numbering, never membership or token
    accounting: same docs, same per-doc token counts."""
    a = {(r["lang"], r["doc_id"]): r["n_tokens"]
         for r in _q(spark, "sequence_packing").collect()}
    b = {(r["lang"], r["doc_id"]): r["n_tokens"]
         for r in _q(spark, "sequence_packing_sharded").collect()}
    assert a == b


# --- corpus mixture plan -------------------------------------------------

def test_mixture_plan_rates_and_epochs_consistent(spark):
    from transcript_analysis_spark.plans.scale_ops import (
        MIX_TOKEN_BUDGET, MIX_WEIGHTS)
    rows = _q(spark, "corpus_mixture_plan").collect()
    assert {r["source"] for r in rows} == set(MIX_WEIGHTS)
    # target tokens respect the weights; epochs = ceil(rate);
    # upsampled iff the domain is smaller than its target
    assert sum(r["target_tokens"] for r in rows) == MIX_TOKEN_BUDGET
    import math
    for r in rows:
        assert r["n_epochs"] == math.ceil(r["sample_rate"] - 1e-12)
        assert r["upsampled"] == (r["target_tokens"]
                                  > r["available_tokens"])


# --- uniform hash sample -------------------------------------------------

def test_uniform_hash_sample_topk_plan_and_determinism(spark):
    from transcript_analysis_spark.plans.scale_ops import SAMPLE_K
    df = _q(spark, "uniform_hash_sample")
    assert "TakeOrderedAndProject" in plan_of(df)
    a = {r["doc_id"] for r in df.collect()}
    b = {r["doc_id"] for r in _q(spark, "uniform_hash_sample").collect()}
    assert a == b and len(a) == SAMPLE_K


# --- BM25 ----------------------------------------------------------------

def test_bm25_scores_are_positive_and_bounded(spark):
    from transcript_analysis_spark.plans.scale_ops import BM25_TERMS
    rows = _q(spark, "bm25_scores").collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["n_matched"] <= len(BM25_TERMS)
        assert r["bm25"] > 0


def test_bm25_more_matched_terms_scores_higher_on_average(spark):
    import statistics
    rows = _q(spark, "bm25_scores").collect()
    by_matched: dict[int, list] = {}
    for r in rows:
        by_matched.setdefault(r["n_matched"], []).append(r["bm25"])
    means = {k: statistics.mean(v) for k, v in by_matched.items()}
    ks = sorted(means)
    assert all(means[a] < means[b] for a, b in zip(ks, ks[1:]))


# --- winsorized stats ----------------------------------------------------

def test_winsorized_mean_is_clipped_toward_center(spark):
    rows = _q(spark, "winsorized_order_stats").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["p05"] <= r["p99"]
        # the winsorized mean lives inside the clip interval
        assert r["p05"] <= r["mean_winsorized"] <= r["p99"]


def test_winsorize_percentiles_broadcast(spark):
    plan = plan_of(_q(spark, "winsorized_order_stats"))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --- vocabulary / encoding -----------------------------------------------

def test_vocab_ids_are_contiguous_by_frequency(spark):
    rows = sorted(_q(spark, "vocab_token_ids").collect(),
                  key=lambda r: r["token_id"])
    assert [r["token_id"] for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r["n_occurrences"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_vocab_ranking_window_is_partitioned(spark):
    """The ranking window must be partitioned by the count (two-level
    rank + offset scheme) — never a global single-task ORDER BY."""
    import re
    df = _q(spark, "vocab_token_ids")
    plan = plan_of(df)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for args in specs:
        assert "n_occurrences#" in args.split(",")[0], \
            f"unpartitioned vocab rank: {args}"


def test_encoding_never_explodes_the_corpus(spark):
    """document_token_ids encodes via a broadcast word->id map and a
    per-row JVM transform: the vocabulary counts are checkpointed (one
    corpus pass), so the final plan carries NO explode at all — the
    corpus is split per-row, never exploded/shuffled/regrouped — and
    no pandas stage exists anywhere."""
    plan = plan_of(_q(spark, "document_token_ids"))
    assert "Generate explode" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_encoding_round_trips_through_vocab(spark):
    """Decoding the id sequence through the vocabulary recovers the
    original text exactly."""
    vocab = {r["token_id"]: r["word"]
             for r in _q(spark, "vocab_token_ids").collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").collect()}
    enc = _q(spark, "document_token_ids").collect()
    assert len(enc) == len(docs)
    for r in enc[:50]:
        decoded = " ".join(vocab[int(t)] for t in r["token_ids"].split(" "))
        assert decoded == docs[r["doc_id"]]


# --- z-order -------------------------------------------------------------

def test_zvalue_round_trips_bit_interleave(spark):
    """De-interleaving the Morton code recovers both inputs exactly."""
    from transcript_analysis_spark.plans.scale_ops import spark_zvalue
    df = spark.range(0, 500).select(
        (F.col("id") * 37 % 65536).alias("a"),
        (F.col("id") * 101 % 65536).alias("b"))
    z = df.withColumn("z", F.expr(spark_zvalue("a", "b")))
    back = z.select("a", "b", F.expr(
        "aggregate(sequence(0, 15), cast(0 as bigint),"
        " (acc, i) -> acc + shiftleft(shiftright(z, 2 * i) & 1, i))").alias("a2"),
        F.expr(
        "aggregate(sequence(0, 15), cast(0 as bigint),"
        " (acc, i) -> acc + shiftleft(shiftright(z, 2 * i + 1) & 1, i))").alias("b2"))
    bad = back.filter("a != a2 OR b != b2").count()
    assert bad == 0


def test_zcell_spans_bounded(spark):
    """Every coarse Z-cell covers < 2^8 of each dimension — the
    property file-level min/max pruning relies on."""
    rows = _q(spark, "zorder_locality_stats").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["custkey_span"] < 256
        assert r["day_span"] < 256


def test_mixture_apply_consistent_with_plan(spark):
    """The executed copy counts must be the plan's rates, exactly:
    rate_ppm == round(sample_rate * 1e6) from temperature_mixture_plan
    per source, every n_copies is floor(rate) or floor(rate)+1, and
    upsampled sources keep every doc at least once."""
    from transcript_analysis_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    plan = {r.source: r for r in
            all_queries()["temperature_mixture_plan"].fn(spark, sf)
            .collect()}
    applied = all_queries()["corpus_mixture_apply"].fn(spark, sf).collect()
    assert applied
    by_source: dict[str, list] = {}
    for r in applied:
        by_source.setdefault(r.source, []).append(r)
    assert set(by_source) == set(plan)
    for src, rows in by_source.items():
        p = plan[src]
        rate_ppm = rows[0].rate_ppm
        assert all(r.rate_ppm == rate_ppm for r in rows)
        assert rate_ppm == round(p.sample_rate * 1e6)
        lo = rate_ppm // 1_000_000
        for r in rows:
            assert r.n_copies in (lo, lo + 1)
        if p.upsampled:
            assert all(r.n_copies >= 1 for r in rows)
        # the fractional remainder is a hash Bernoulli: with any
        # remainder at all, both outcomes should appear across the
        # source's docs unless the remainder is extreme
        frac = rate_ppm % 1_000_000
        if 100_000 < frac < 900_000 and len(rows) >= 20:
            kinds = {r.n_copies for r in rows}
            assert kinds == {lo, lo + 1}


def test_ndcg_discount_table_matches_log2(spark):
    """NDCG_DISCOUNTS is the half-up integer quantization of
    1e6/log2(pos+1) — pinned so the shared constant cannot drift from
    the formula it encodes."""
    import math

    from transcript_analysis_spark.plans.scale_ops import (NDCG_DISCOUNTS,
                                                           NDCG_K)
    assert len(NDCG_DISCOUNTS) == NDCG_K
    for i, d in enumerate(NDCG_DISCOUNTS):
        assert d == round(1e6 / math.log2(i + 2))
    assert all(a > b for a, b in zip(NDCG_DISCOUNTS, NDCG_DISCOUNTS[1:]))


def test_ndcg_perfect_and_inverted_rankings(spark, tmp_path):
    """The instrument measures ORDER: a corpus where BM25 agrees with
    graded relevance scores NDCG = 1; one where term-frequency
    saturation inverts the order scores NDCG < 1."""
    from pyspark.sql import functions as F

    from transcript_analysis_spark.plans.scale_ops import bm25_ndcg_report

    # aligned: the 3-term doc outscores 2-term outscores 1-term
    # (equal lengths, one occurrence each -> idf sums dominate)
    filler = " ".join(["zz"] * 20)
    aligned = [
        (1, f"spark hash merge {filler}", "en", "s0"),
        (2, f"spark hash zz zz {filler}", "en", "s0"),
        (3, f"spark zz zz zz {filler}", "en", "s0"),
        (4, f"zz zz zz zz {filler}", "en", "s0"),
    ]
    (spark.createDataFrame(aligned, "doc_id long, text string,"
                           " lang string, source string")
     .withColumn("n_chars", F.length("text").cast("long"))
     .coalesce(1).write.parquet(f"{tmp_path}/a/documents.parquet"))
    r = bm25_ndcg_report(spark, f"{tmp_path}/a").collect()
    assert len(r) == 1 and r[0].n_candidates == 3
    assert r[0].ndcg10 == 1.0 and r[0].dcg10 == r[0].idcg10

    # inverted: a short doc stuffed with one term out-ranks a very
    # long doc containing all three terms once — BM25's length
    # normalization crushes the long doc's saturation while the many
    # short filler docs keep avgdl low (the classic keyword-stuffing
    # failure NDCG exists to expose; plain recall cannot see it)
    long_filler = " ".join(["zz"] * 397)
    inverted = ([(1, "spark " * 12 + "spark", "en", "s0"),
                 (2, f"spark hash merge {long_filler}", "en", "s0")]
                + [(10 + i, " ".join(["zz"] * 10), "en", "s0")
                   for i in range(18)])
    (spark.createDataFrame(inverted, "doc_id long, text string,"
                           " lang string, source string")
     .withColumn("n_chars", F.length("text").cast("long"))
     .coalesce(1).write.parquet(f"{tmp_path}/b/documents.parquet"))
    r = bm25_ndcg_report(spark, f"{tmp_path}/b").collect()
    assert len(r) == 1 and r[0].n_candidates == 2
    assert 0.0 < r[0].ndcg10 < 1.0


def test_epoch_shuffle_is_decorrelated_permutation(spark):
    """Each epoch's positions are a 1..n permutation; the two epochs'
    orders are genuinely different (salt decorrelation); shards are
    full-sized except the tail."""
    from collections import Counter

    from transcript_analysis_spark.plans.scale_ops import (
        SHUFFLE_EPOCHS, SHUFFLE_SHARD_DOCS, epoch_shuffle_plan)

    rows = epoch_shuffle_plan(spark, "/root/testdata/sf0.001").collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == set(range(SHUFFLE_EPOCHS))
    n = len(by_epoch[0])
    order = {}
    for e, rs in by_epoch.items():
        assert sorted(r.shuffle_pos for r in rs) == list(range(1, n + 1))
        order[e] = [r.doc_id for r in
                    sorted(rs, key=lambda r: r.shuffle_pos)]
        sizes = Counter(r.shard for r in rs)
        assert all(v == SHUFFLE_SHARD_DOCS for s, v in sizes.items()
                   if s < max(sizes))
    # decorrelated: the epoch orders agree on only a tiny prefix
    agree = sum(a == b for a, b in zip(order[0], order[1]))
    assert agree < n // 10


def test_epoch_shuffle_plan_has_no_single_partition_window(spark):
    """The bucketed-rank discipline, asserted at the PLAN level: every
    window in the executed plan is partitioned (hash exchange on the
    bucket key), never a single-partition global sort-the-world."""
    plan = plan_of(_q(spark, "epoch_shuffle_plan"))
    assert "Window" in plan                      # the ranks are windows
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
