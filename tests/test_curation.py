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


def test_simhash_pairs_fixture_semantics(spark, tmp_path):
    """SimHash Hamming pairing on a controlled corpus: an identical
    pair must surface at hamming 0 (equal fingerprints -> every band
    agrees), a one-word edit of a 28-word doc lands within the
    hamming <= 3 gate (here exactly 3 — the pigeonhole boundary, where
    at least one of the 4 bands still matches), and a
    disjoint-vocabulary doc is never paired. Deterministic: the
    fingerprint is pure hash algebra, no RNG."""
    from transcript_analysis_spark.plans.data_pipeline import (
        simhash_hamming_pairs)
    base = ("spark shuffle partition broadcast join aggregate window "
            "watermark catalyst tungsten codegen arrow pandas parquet "
            "bucket skew salt adaptive execution plan stage task "
            "executor driver memory spill hash sort merge "
            "exchange").split()
    t1 = " ".join(base)
    t2 = " ".join(["stream" if i == 7 else w for i, w in enumerate(base)])
    t3 = "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"
    spark.createDataFrame(
        [(1, t1, "en", "s", len(t1)), (2, t1, "en", "s", len(t1)),
         (3, t2, "en", "s", len(t2)), (4, t3, "es", "s", len(t3))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_hamming_pairs(spark, str(tmp_path)).collect()}
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 3 and pairs[(2, 3)] == 3
    assert not any(4 in p for p in pairs)


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


# --- lm_perplexity_filter -------------------------------------------------

def test_perplexity_matches_python_reference(spark):
    """Recompute the self-trained bigram LM and per-doc NLL in pure
    Python (same fixed-point quantization) and match the engine's
    outputs exactly."""
    import math
    from collections import Counter

    docs = {r["doc_id"]: r["text"].split(" ")
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .collect()}
    big: Counter = Counter()
    for words in docs.values():
        big.update(zip(words, words[1:]))
    # context counts and vocabulary from the bigram table alone
    uni: Counter = Counter()
    for (w1, _w2), c2 in big.items():
        uni[w1] += c2
    v = len({w for pair in big for w in pair})
    logp = {pair: int(round(math.log((2.0 * c2 + 1.0)
                                     / (2.0 * uni[pair[0]] + v)) * 1e9))
            for pair, c2 in big.items()}
    got = {r["doc_id"]: r for r in _q(spark, "lm_perplexity_filter")
           .collect()}
    assert set(got) == {d for d, w in docs.items() if len(w) >= 2}
    from transcript_analysis_spark.plans.curation import NLL_FLAG_THRESHOLD
    for doc_id, words in docs.items():
        if len(words) < 2:
            continue
        nll_e9 = -sum(logp[p] for p in zip(words, words[1:]))
        n = len(words) - 1
        r = got[doc_id]
        assert r["n_bigrams"] == n
        # integer half-up rounding to 4 digits, prescaled by 1e9
        expect_avg = ((2 * abs(nll_e9) + n * 100000) // (2 * n * 100000)
                      ) / 1e4 * (1 if nll_e9 >= 0 else -1)
        assert r["avg_nll"] == expect_avg
        assert r["flagged"] == (expect_avg > NLL_FLAG_THRESHOLD)
        assert abs(r["ppl"] - round(math.exp(expect_avg), 3)) < 1e-9


def test_perplexity_flags_an_out_of_domain_doc(spark, tmp_path):
    """A corpus of same-distribution docs plus one doc made of unseen
    bigram transitions: the outlier's NLL must exceed the others."""
    from transcript_analysis_spark.plans.curation import (
        lm_perplexity_filter)
    normal = "the cat sat on the mat and the cat ran"
    rows = [(i, normal, "en", "s", len(normal)) for i in range(8)]
    odd = "mat the on sat ran cat the and ran the"
    rows.append((99, odd, "en", "s", len(odd)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r["avg_nll"]
           for r in lm_perplexity_filter(spark, str(tmp_path)).collect()}
    assert out[99] > max(v for k, v in out.items() if k != 99)


def test_perplexity_model_is_broadcast(spark):
    """The vocabulary-sized model must reach the position stream via
    broadcast; the corpus never shuffles on the bigram key for
    scoring (only the count aggregates shuffle)."""
    plan = plan_of(_q(spark, "lm_perplexity_filter"))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# --- BPE ------------------------------------------------------------------

def _python_bpe_reference(docs: dict, n_merges: int):
    """Pure-Python BPE with the module's exact contract: frequency-
    weighted pair counts, winner = (max count, lexicographic (l, r)),
    leftmost-first non-overlapping apply."""
    from collections import Counter
    freq: Counter = Counter()
    for text in docs.values():
        for w in text.split(" "):
            if w:
                freq[w] += 1
    vocab = {tuple(w): c for w, c in freq.items()}
    # merge identical symbol sequences (distinct words may collide
    # after merges in principle; sum their weights like groupBy would)
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))
        new_vocab: dict = {}
        for syms, cnt in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark):
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .collect()}
    expect = _python_bpe_reference(docs, 10)
    got = [(r["rank"], r["left"], r["right"], r["merged"],
            r["weighted_count"])
           for r in _q(spark, "bpe_merge_learn")
           .orderBy("rank").collect()]
    assert got == expect


def test_bpe_encode_roundtrip_and_compression(spark):
    """Encoding with k merges never increases token count vs raw
    chars, merged tokens are multi-char, and concatenating each
    word's subwords reconstructs the word (verified via counts:
    subword chars == word chars)."""
    from transcript_analysis_spark.operators.bpe import (
        apply_bpe, learn_bpe_merges)
    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = learn_bpe_merges(docs_df, n_merges=10)
    assert len(merges) == 10
    enc = {r["doc_id"]: r for r in apply_bpe(docs_df, merges).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    for doc_id, text in raw.items():
        words = [w for w in text.split(" ") if w]
        n_chars = sum(len(w) for w in words)
        r = enc[doc_id]
        assert r["n_words"] == len(words)
        assert r["n_subword_tokens"] <= n_chars
        assert r["n_subword_tokens"] >= len(words)
        assert 0 <= r["n_merged_tokens"] <= r["n_subword_tokens"]
    # with 10 merges on a 31-word vocabulary, compression must bite
    total_sub = sum(r["n_subword_tokens"] for r in enc.values())
    total_chars = sum(sum(len(w) for w in t.split(" ") if w)
                     for t in raw.values())
    assert total_sub < total_chars


def test_bpe_apply_is_jvm_map_only(spark):
    from transcript_analysis_spark.operators.bpe import (
        apply_bpe, learn_bpe_merges)
    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = learn_bpe_merges(docs_df, n_merges=3)
    plan = plan_of(apply_bpe(docs_df, merges))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # map-only over the scan


def test_single_corpus_explode_via_checkpoint(spark):
    """Both corpus-heavy curation queries collapse the one explode
    into a materialized (localCheckpoint) sufficient-statistic table:
    the executed plan must read ExistingRDD scans and contain NO
    Generate (the corpus is never re-shingled per branch)."""
    for name in ("duplicate_ngram_coverage", "lm_perplexity_filter"):
        plan = plan_of(_q(spark, name))
        assert "Scan ExistingRDD" in plan, name
        assert "Generate" not in plan, name


# --- dedup_trim_spans -----------------------------------------------------

def test_trim_spans_consistent_with_coverage(spark):
    """Trim and coverage are two views of the same covered-position
    set: dropped tokens <= positions covered by dup 3-grams, a doc
    with dup_fraction 0 keeps everything, and kept+dropped == words."""
    cov = {r["doc_id"]: r for r in
           _q(spark, "duplicate_ngram_coverage").collect()}
    trim = {r["doc_id"]: r for r in _q(spark, "dedup_trim_spans").collect()}
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .collect()}
    for doc_id, r in trim.items():
        n_words = len(docs[doc_id].split(" "))
        assert r["n_kept"] + r["n_dropped"] == n_words
        c = cov.get(doc_id)
        if c is None or c["n_dup_positions"] == 0:
            assert r["n_dropped"] == 0
            assert r["trimmed_text"] == docs[doc_id]
        else:
            # every dup position covers <= 3 tokens
            assert 0 < r["n_dropped"] <= 3 * c["n_dup_positions"]
        # kept tokens appear in original order as a subsequence
        kept = r["trimmed_text"].split(" ") if r["trimmed_text"] else []
        orig = docs[doc_id].split(" ")
        it = iter(orig)
        assert all(any(w == o for o in it) for w in kept), doc_id


def test_trim_spans_removes_exactly_the_duplicated_run(spark, tmp_path):
    """Two docs share one 5-token run inside otherwise-unique text:
    trimming must drop exactly the run plus nothing else (the shared
    3-grams cover exactly those 5 positions)."""
    from transcript_analysis_spark.plans.curation import dedup_trim_spans
    shared = "red orange yellow green blue"
    a = f"one two three {shared} four five six"
    b = f"seven eight nine {shared} ten eleven twelve"
    spark.createDataFrame(
        [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in
           dedup_trim_spans(spark, str(tmp_path)).collect()}
    assert out[1]["trimmed_text"] == "one two three four five six"
    assert out[2]["trimmed_text"] == "seven eight nine ten eleven twelve"
    assert out[1]["n_dropped"] == 5 and out[2]["n_dropped"] == 5


def test_trim_spans_rewrite_is_per_row_jvm(spark):
    """The rewrite is an indexed filter over the original words — no
    token-level explode of the corpus in the final plan (the one
    positional explode is checkpointed), no Python, no ordered
    string aggregation window."""
    plan = plan_of(_q(spark, "dedup_trim_spans"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Window" not in plan


# --- dataset_split_assignment --------------------------------------------

def test_split_assignment_proportions_and_leakage(spark):
    """Splits are ~80/10/10, deterministic across runs, and exact
    duplicate texts always share a split (no leakage through
    copies)."""
    rows = _q(spark, "dataset_split_assignment").collect()
    n = len(rows)
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / n > 0.6
    assert 0.02 < counts.get("val", 0) / n < 0.25
    assert 0.02 < counts.get("test", 0) / n < 0.25
    again = _q(spark, "dataset_split_assignment").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # same text -> same split
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .collect()}
    by_text = {}
    split_of = {r["doc_id"]: r["split"] for r in rows}
    for doc_id, text in docs.items():
        by_text.setdefault(text, set()).add(split_of[doc_id])
    assert all(len(s) == 1 for s in by_text.values())


def test_split_assignment_stable_under_corpus_growth(spark, tmp_path):
    """Adding documents must not move any existing doc's split (the
    property row_number-modulo assignment lacks)."""
    from transcript_analysis_spark.plans.curation import (
        dataset_split_assignment)
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base.write.parquet(f"{tmp_path}/small/documents.parquet")
    extra = base.selectExpr("doc_id + 100000 as doc_id",
                            "concat(text, ' zzz') as text", "lang",
                            "source", "n_chars + 4 as n_chars")
    base.unionByName(extra).write.parquet(
        f"{tmp_path}/big/documents.parquet")
    small = {r["doc_id"]: r["split"] for r in
             dataset_split_assignment(spark, f"{tmp_path}/small").collect()}
    big = {r["doc_id"]: r["split"] for r in
           dataset_split_assignment(spark, f"{tmp_path}/big").collect()}
    assert all(big[d] == s for d, s in small.items())


# --- hybrid_rrf_fusion ----------------------------------------------------

def test_bucketed_rank_equals_global_row_number(spark):
    """The bucketed-rank pattern must reproduce the exact global
    row_number by (score desc, doc_id asc) — including tied scores,
    which always share a bucket."""
    from transcript_analysis_spark.plans.curation import _bucketed_rank
    rows = [(i, float(s)) for i, s in enumerate(
        [3.2, 1.1, 1.1, 0.0, 2.74, 2.74, 2.74, 9.9, 0.005, 1.1007, -0.0])]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = {r["doc_id"]: r["rk"] for r in
           _bucketed_rank(df, "score", "rk").collect()}
    expect = {doc: rk + 1 for rk, (doc, _s) in enumerate(
        sorted(rows, key=lambda t: (-t[1], t[0])))}
    assert got == expect


def test_rrf_orders_and_bounds(spark):
    """RRF scores are in (0, 2/(k+1)], the best-fused doc has the
    smallest rank sum, and ranks are a permutation of 1..n per
    ranker."""
    from transcript_analysis_spark.plans.curation import RRF_K
    rows = _q(spark, "hybrid_rrf_fusion").collect()
    n = len(rows)
    assert n > 0
    assert sorted(r["rank_bm25"] for r in rows) == list(range(1, n + 1))
    assert sorted(r["rank_quality"] for r in rows) == list(range(1, n + 1))
    for r in rows:
        assert 0.0 < r["rrf"] <= 2.0 / (RRF_K + 1) + 1e-9
    best = max(rows, key=lambda r: r["rrf"])
    # rrf is monotone-decreasing in each rank: the best doc cannot be
    # dominated by another doc that ranks better on both signals
    for r in rows:
        if r is not best:
            assert not (r["rank_bm25"] <= best["rank_bm25"]
                        and r["rank_quality"] <= best["rank_quality"])


def test_rrf_no_global_window(spark):
    """Ranking must come from the bucket-partitioned pattern — no
    unpartitioned (single-task) window in the executed plan."""
    import re
    plan = plan_of(_q(spark, "hybrid_rrf_fusion"))
    assert "BatchEvalPython" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_bkt" in spec, f"unpartitioned window: {spec}"


# --- corpus_release_prep --------------------------------------------------

def test_release_prep_composes_its_stages(spark):
    """The composite's decision per doc must equal recombining the
    standalone stage outputs with the documented precedence."""
    cov = {r["doc_id"]: r["dup_fraction"] for r in
           _q(spark, "duplicate_ngram_coverage").collect()}
    ppl = {r["doc_id"]: r["flagged"] for r in
           _q(spark, "lm_perplexity_filter").collect()}
    spl = {r["doc_id"]: r["split"] for r in
           _q(spark, "dataset_split_assignment").collect()}
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .collect()}
    canonical = {}
    for doc_id, text in sorted(docs.items()):
        canonical.setdefault(text, doc_id)
    from transcript_analysis_spark.plans.curation import COV_DROP_THRESHOLD
    got = {r["doc_id"]: r for r in
           _q(spark, "corpus_release_prep").collect()}
    assert set(got) == set(docs)
    n_dropped = 0
    for doc_id in docs:
        if canonical[docs[doc_id]] != doc_id:
            expect = "duplicate"
        elif cov.get(doc_id) is not None and cov[doc_id] > COV_DROP_THRESHOLD:
            expect = "dup_coverage"
        elif ppl.get(doc_id):
            expect = "perplexity"
        else:
            expect = "none"
        r = got[doc_id]
        assert r["drop_reason"] == expect, doc_id
        assert r["keep"] == (expect == "none")
        assert r["split"] == spl[doc_id]
        n_dropped += expect != "none"
    # the gates must actually bite on this corpus, and not drop it all
    assert 0 < n_dropped < len(docs)


def test_release_prep_duplicate_precedence(spark, tmp_path):
    """A copy that would ALSO fail coverage must report 'duplicate'
    (precedence is part of the contract), and its canonical twin —
    same fully-duplicated text — falls to the coverage gate."""
    from transcript_analysis_spark.plans import all_queries
    corpus_release_prep = all_queries()["corpus_release_prep"].fn
    text = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "one two three four five six seven eight"
    spark.createDataFrame(
        [(1, text, "en", "s", len(text)),
         (2, text, "en", "s", len(text)),
         (3, uniq, "en", "s", len(uniq))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in
           corpus_release_prep(spark, str(tmp_path)).collect()}
    assert out[2]["drop_reason"] == "duplicate"
    assert out[1]["drop_reason"] == "dup_coverage"  # 100% covered
    assert out[3]["drop_reason"] in ("none", "perplexity")


# --- lm_backoff_eval ------------------------------------------------------

def test_backoff_tiers_match_python_reference(spark, tmp_path):
    """Constructed corpus where the eval split contains seen bigrams,
    unseen bigrams of seen words (backoff tier), and OOV words (floor
    tier): every tier count and the fixed-point NLL must match a pure
    Python implementation of the same quantized model."""
    import math
    from collections import Counter

    from transcript_analysis_spark.plans import all_queries
    from transcript_analysis_spark.plans.curation import BACKOFF_ALPHA
    from transcript_analysis_spark.plans.data_pipeline import EVAL_SOURCES

    train_texts = ["the cat sat on the mat", "the dog sat on the rug",
                   "a cat and a dog ran"]
    # "mat the" unseen-bigram (both words seen); "zebra" OOV
    eval_texts = ["the cat sat", "mat the dog", "the zebra sat on"]
    rows = [(i, t, "en", "src9", len(t))
            for i, t in enumerate(train_texts)]
    rows += [(100 + i, t, "en", EVAL_SOURCES[0], len(t))
             for i, t in enumerate(eval_texts)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    # python reference with identical quantization
    big: Counter = Counter()
    uni: Counter = Counter()
    for t in train_texts:
        ws = t.split(" ")
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    ctx: Counter = Counter()
    for (w1, _), c in big.items():
        ctx[w1] += c
    T, V = sum(uni.values()), len(uni)

    def q(x):
        return int(round(x * 1e9))

    bi_logp = {p: q(math.log((2.0 * c + 1.0) / (2.0 * ctx[p[0]] + V)))
               for p, c in big.items()}
    uni_logp = {w: q(math.log(BACKOFF_ALPHA)
                     + math.log((2.0 * u + 1.0) / (2.0 * T + V)))
                for w, u in uni.items()}
    oov_logp = q(math.log(BACKOFF_ALPHA) + math.log(1.0 / (2.0 * T + V)))

    got = {r["doc_id"]: r for r in
           all_queries()["lm_backoff_eval"].fn(spark, str(tmp_path))
           .collect()}
    assert set(got) == {100, 101, 102}
    tier_totals = {"backoff": 0, "oov": 0}
    for doc_id, text in ((100 + i, t) for i, t in enumerate(eval_texts)):
        ws = text.split(" ")
        nll, n_back, n_oov = 0, 0, 0
        for p in zip(ws, ws[1:]):
            if p in bi_logp:
                nll -= bi_logp[p]
            elif p[1] in uni_logp:
                nll -= uni_logp[p[1]]
                n_back += 1
            else:
                nll -= oov_logp
                n_oov += 1
        n = len(ws) - 1
        r = got[doc_id]
        assert (r["n_bigrams"], r["n_backoff"], r["n_oov"]) == (
            n, n_back, n_oov), doc_id
        expect_avg = ((2 * abs(nll) + n * 100000) // (2 * n * 100000)
                      ) / 1e4 * (1 if nll >= 0 else -1)
        assert r["avg_nll"] == expect_avg, doc_id
        tier_totals["backoff"] += n_back
        tier_totals["oov"] += n_oov
    # the constructed corpus must actually exercise both fallback tiers
    assert tier_totals["backoff"] > 0 and tier_totals["oov"] > 0


def test_backoff_orders_surprise(spark, tmp_path):
    """OOV-heavy eval docs must score strictly worse (higher NLL) than
    an in-domain eval doc under the same model."""
    from transcript_analysis_spark.plans import all_queries
    from transcript_analysis_spark.plans.data_pipeline import EVAL_SOURCES
    train = [(i, "alpha beta gamma delta alpha beta", "en", "s", 30)
             for i in range(4)]
    evals = [(50, "alpha beta gamma delta", "en", EVAL_SOURCES[0], 20),
             (51, "qq ww ee rr tt yy", "en", EVAL_SOURCES[0], 17)]
    spark.createDataFrame(
        train + evals,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in
           all_queries()["lm_backoff_eval"].fn(spark, str(tmp_path))
           .collect()}
    assert out[51]["n_oov"] == out[51]["n_bigrams"]
    assert out[51]["avg_nll"] > out[50]["avg_nll"]


def test_pii_text_scrub_on_constructed_fixtures(spark):
    """The corpus has no PII, so the scrubbing semantics are pinned
    here on constructed rows: every class masked, counts exact,
    clean text free of the original identifiers."""
    from transcript_analysis_spark.plans.curation import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
    )
    rows = [
        (1, "contact alice.smith+x@example.org or bob@mail.co today"),
        (2, "server 192.168.0.1 and 10.0.255.3 rebooted"),
        (3, "call +14155550123 now"),
        (4, "mixed a@b.io via 8.8.8.8 at +4915112345678 end"),
        (5, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE, "<IP>"),
        PII_PHONE_RE, "<PHONE>")
    out = {r.doc_id: r for r in df.select(
        "doc_id", clean.alias("text_clean"),
        F.expr(f"size(regexp_extract_all(text, '{PII_EMAIL_RE}', 0))")
        .alias("n_emails"),
        F.expr(f"size(regexp_extract_all(text, '{PII_IP_RE}', 0))")
        .alias("n_ips"),
        F.expr(f"size(regexp_extract_all(text, '{PII_PHONE_RE}', 0))")
        .alias("n_phones")).collect()}
    assert out[1].text_clean == "contact <EMAIL> or <EMAIL> today"
    assert out[1].n_emails == 2
    assert out[2].text_clean == "server <IP> and <IP> rebooted"
    assert out[2].n_ips == 2
    assert out[3].text_clean == "call <PHONE> now"
    assert out[3].n_phones == 1
    assert out[4].text_clean == "mixed <EMAIL> via <IP> at <PHONE> end"
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (1, 1, 1)
    assert out[5].text_clean == rows[4][1]


def test_pii_scrub_query_is_no_op_on_clean_corpus(spark):
    """On the synthetic corpus the scrub must be a provable no-op —
    the no-false-positive guarantee a release pipeline needs."""
    from transcript_analysis_spark.plans.curation import pii_text_scrub
    out = pii_text_scrub(spark, "/root/testdata/sf0.001")
    assert out.filter((F.col("n_emails") > 0) | (F.col("n_ips") > 0)
                      | (F.col("n_phones") > 0)).count() == 0


def test_perceptron_train_matches_python_replay(spark):
    """The full batch-perceptron trajectory — quantized features,
    per-epoch updates and error counts — replayed exactly in pure
    Python from the raw parquet (all-integer arithmetic: equality is
    exact, no tolerance)."""
    from transcript_analysis_spark.plans import all_queries
    from transcript_analysis_spark.plans.curation import (PCT_EPOCHS,
                                                          PCT_FEATURES,
                                                          PCT_SCALE)
    from transcript_analysis_spark.plans.data_pipeline import _STOPWORDS

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    S = PCT_SCALE
    feats = []
    for r in docs:
        words = r.text.split(" ")
        nw = max(len(words), 1)
        nst = sum(1 for w in words if w in _STOPWORDS)
        nlong = sum(1 for w in words if len(w) >= 8)
        y = 1 if r.lang == "en" else -1
        x = [S,
             (2 * S * nst + nw) // (2 * nw),
             (2 * S * nlong + nw) // (2 * nw),
             min((2 * S * r.n_chars + 8 * nw) // (16 * nw), 2 * S)]
        feats.append((y, x))
    w = [0, 0, 0, 0]
    errs = []
    for _ in range(PCT_EPOCHS):
        upd, err = [0, 0, 0, 0], 0
        for y, x in feats:
            if y * sum(wj * xj for wj, xj in zip(w, x)) <= 0:
                err += 1
                for j in range(4):
                    upd[j] += y * x[j]
        w = [wj + uj for wj, uj in zip(w, upd)]
        errs.append(err)

    got = {r.feature_idx: r for r in
           all_queries()["perceptron_classifier_train"]
           .fn(spark, sf).collect()}
    assert [got[i].feature_name for i in range(4)] == PCT_FEATURES
    assert [got[i].weight for i in range(4)] == w
    for i in range(4):
        assert [got[i].err_epoch1, got[i].err_epoch2,
                got[i].err_epoch3] == errs
    # epoch 1 misclassifies everything (w=0 => margin 0); epoch 2
    # must genuinely improve on that degenerate start
    assert errs[0] == len(feats) and errs[1] < errs[0]


def test_perceptron_learns_separable_fixture(spark, tmp_path):
    """The corpus's lang labels are unlearnable by construction
    (featurally identical across languages), so the registered eval
    reports the majority-class Bayes ceiling there. This fixture has
    real signal — en docs are stopword-dense, others stopword-free,
    classes balanced with identical word lengths — and the SAME
    registered trainer+eval must find it: epoch-2 training error 0,
    eval accuracy 1.0."""
    from pyspark.sql import functions as F

    from transcript_analysis_spark.plans.curation import (
        perceptron_classifier_eval, perceptron_classifier_train)

    # en: stopword-dense, short words; other: stopword-free, long
    # words — strictly separable in BOTH margin directions (a
    # zero-margin row counts as an update miss by the rule)
    en_text = " ".join(["the", "and", "for", "the", "and"] * 4)
    xx_text = " ".join(["xyzabcdef", "abcdefghi", "qrstuvwxy"] * 7)
    rows = ([(i, en_text, "en", "s0") for i in range(15)]
            + [(100 + i, xx_text, "de", "s0") for i in range(15)])
    (spark.createDataFrame(rows, "doc_id long, text string, lang string,"
                           " source string")
     .withColumn("n_chars", F.length("text").cast("long"))
     .coalesce(1).write.parquet(f"{tmp_path}/documents.parquet"))

    trained = {r.feature_name: r for r in
               perceptron_classifier_train(spark, str(tmp_path)).collect()}
    # epoch 1 starts from w=0 (all misclassified); the epoch-1 weights
    # already separate the fixture -> epoch 2 measures zero error
    assert trained["bias"].err_epoch1 == 30
    assert trained["bias"].err_epoch2 == 0
    assert trained["bias"].err_epoch3 == 0

    cells = perceptron_classifier_eval(spark, str(tmp_path)).collect()
    assert all(r.accuracy == 1.0 for r in cells)
    assert {(r.actual, r.pred) for r in cells} == {(1, 1), (-1, -1)}
    assert sum(r.n for r in cells) == 30


def test_kappa_and_calibration_on_separable_fixture(spark, tmp_path):
    """On the same separable fixture the agreement/calibration audits
    must report a PERFECT classifier: kappa = 1, observed agreement 1,
    and a calibration table whose negative-margin bins are pure
    negatives and positive-margin bins pure positives (step-monotone
    pos_rate). On the unlearnable corpus kappa ~ 0 — the pair of
    regimes proves the instruments measure signal, not plumbing."""
    from pyspark.sql import functions as F

    from transcript_analysis_spark.plans.curation import (
        classifier_kappa_report, classifier_margin_calibration)

    en_text = " ".join(["the", "and", "for", "the", "and"] * 4)
    xx_text = " ".join(["xyzabcdef", "abcdefghi", "qrstuvwxy"] * 7)
    rows = ([(i, en_text, "en", "s0") for i in range(15)]
            + [(100 + i, xx_text, "de", "s0") for i in range(15)])
    (spark.createDataFrame(rows, "doc_id long, text string, lang string,"
                           " source string")
     .withColumn("n_chars", F.length("text").cast("long"))
     .coalesce(1).write.parquet(f"{tmp_path}/documents.parquet"))

    k = classifier_kappa_report(spark, str(tmp_path)).collect()
    assert len(k) == 1
    assert k[0].n_total == 30 and k[0].n_agree == 30
    assert k[0].observed_agree == 1.0
    assert k[0].kappa == 1.0
    assert 0.0 < k[0].chance_agree < 1.0  # both classes present

    cal = classifier_margin_calibration(spark, str(tmp_path)).collect()
    assert sum(r.n_docs for r in cal) == 30
    assert sum(r.n_pos for r in cal) == 15
    for r in cal:
        assert r.bin != 0  # a perfect separator leaves no near-zero margin
        assert r.pos_rate == (1.0 if r.bin > 0 else 0.0)


def test_kappa_near_zero_on_unlearnable_corpus(spark):
    """The synthetic corpus's labels carry no linear signal, so the
    pocket model's chance-corrected agreement must sit at ~0 even
    though raw accuracy sits at the majority-class rate — exactly the
    skew failure mode the kappa audit exists to expose."""
    from transcript_analysis_spark.plans.curation import (
        classifier_kappa_report)
    k = classifier_kappa_report(spark, "/root/testdata/sf0.001").collect()
    assert len(k) == 1
    assert abs(k[0].kappa) < 0.1
    assert k[0].observed_agree > 0.5  # majority-class accuracy looks fine


def test_split_bias_chi2_is_small_on_unbiased_split(spark):
    """The split hash is salt-decorrelated from every gate, so the
    drop-reason mix must be independent of the split: chi2 should sit
    in the vicinity of its dof (mean of the null distribution), far
    from any bias signal. Also pins dof = (R-1)(C-1) and the e9
    quantization convention."""
    from transcript_analysis_spark.plans import all_queries
    qs = all_queries()
    r = qs["split_bias_chi2"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(r) == 1
    row = r[0]
    rel = qs["corpus_release_prep"].fn(spark, "/root/testdata/sf0.001")
    n_splits = rel.select("split").distinct().count()
    n_reasons = rel.select("drop_reason").distinct().count()
    assert row.dof == (n_splits - 1) * (n_reasons - 1)
    assert row.chi2 >= 0
    assert row.chi2 == row.chi2_e9 / 1e9
    # unbiased: far below any significance threshold (~2x dof covers
    # the bulk of the null; 10x dof would scream leakage)
    assert row.chi2 < 10 * row.dof
