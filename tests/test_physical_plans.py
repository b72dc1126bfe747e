"""Physical-plan quality gates — the scale discipline, asserted.

These tests pin the plan shapes that matter at 100 TB: filters and
projections reaching the parquet scan, dimension joins broadcasting,
no accidental cartesian products, whole-stage codegen covering the hot
expressions. A regression here is a performance bug even when results
stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _q(spark, name):
    from transcript_analysis_spark.plans import all_queries
    return all_queries()[name].fn(spark, SF_DIR)


def test_filter_pushdown_reaches_scan(spark):
    df = _q(spark, "pricing_summary")
    plan = plan_of(df)
    # shipdate predicate must be pushed into the parquet scan
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning(spark):
    df = _q(spark, "pricing_summary")
    plan = plan_of(df)
    # ReadSchema must not include columns the query never touches
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_dimension_join_broadcasts(spark):
    plan = plan_of(_q(spark, "brand_revenue"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anti_and_semi_joins_planned(spark):
    assert "LeftAnti" in plan_of(_q(spark, "customers_without_orders"))
    assert "LeftSemi" in plan_of(_q(spark, "customers_with_big_order"))


def test_islands_has_no_cartesian(spark):
    plan = plan_of(_q(spark, "islands_flagship"))
    # docs x models is an intentional broadcast nested loop (5-row dim);
    # the segments range join must be a hash join on doc_id, and no
    # full CartesianProduct may appear anywhere
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_topk_uses_take_ordered(spark):
    plan = plan_of(_q(spark, "global_top10_orders"))
    assert "TakeOrderedAndProject" in plan


def test_smoothing_stays_jvm_side(spark):
    # no Python evaluation in the flagship: all array math is JVM
    plan = plan_of(_q(spark, "islands_flagship"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # (WholeStageCodegen spans only materialize in the post-execution
    # AQE plan; absence of Python eval operators is the JVM-side gate)


def test_ngram_scoring_stays_jvm_side(spark):
    plan = plan_of(_q(spark, "ngram_model_score"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_lm_scorers_compute_model_tables_once(spark):
    """The LM scorers' repeated count-table references must compute
    once per query, by whichever mechanism fits the subtree:

    - fourgram/lm_backoff: explicit materialization — fourgram's four
      per-order groupBys have DIFFERENT keys (no identical exchange
      for runtime reuse), so they collapse structurally into one
      grouped count that is pinned; lm_backoff pins its word-count
      and bigram model tables. Their compiled plans read documents
      exactly once.
    - ngram/lidstone/KN: every repeated table ends in its own
      count-shuffle EXCHANGE, so AQE's ReusedExchange dedups the
      consumers at runtime — asserted on the executed (final) plan.
      Pinning these was measured 13% slower (serialized pin jobs)."""
    import re

    for name in ("fourgram_model_score", "lm_backoff_eval"):
        plan = plan_of(_q(spark, name))
        doc_scans = len(re.findall(r"FileScan parquet.*documents", plan))
        assert doc_scans == 1, f"{name}: {doc_scans} documents scans"
        assert "Scan ExistingRDD" in plan, name
    for name in ("ngram_model_score", "lidstone_model_score",
                 "kneser_ney_model_score"):
        df = _q(spark, name)
        df.collect()   # finalize THIS df's own AQE plan (a write
        # would spawn a separate query execution and leave it open)
        final = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final or "AdaptiveSparkPlan" \
            not in final, name
        assert "ReusedExchange" in final, (
            f"{name}: no runtime exchange reuse\n{final[:2000]}")


def test_lsh_join_is_equi_not_cartesian(spark):
    plan = plan_of(_q(spark, "minhash_lsh_candidate_pairs"))
    assert "CartesianProduct" not in plan


def test_simhash_pair_join_is_banded_not_cartesian(spark):
    """The SimHash pair generator must join on the (band, key) equi
    key — never all-pairs — and keep the vote/bit math JVM-side."""
    plan = plan_of(_q(spark, "simhash_hamming_pairs"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_neardup_components_plan_depth_bounded(spark):
    """The iterative min-label-propagation loop must localCheckpoint
    its loop-carried DataFrame: with .cache() alone the logical plan
    deepens every iteration and Catalyst stalls on large graphs. After
    checkpointing, the final plan is a shallow read over a
    materialized RDD — its string form stays small no matter how many
    iterations ran."""
    df = _q(spark, "neardup_components")
    opt = optimized_of(df)
    assert "LogicalRDD" in opt or "Scan ExistingRDD" in opt
    # a lineage-accumulating plan here would be tens of thousands of
    # chars (one join+agg layer per iteration)
    assert len(opt) < 5000, f"plan unexpectedly deep: {len(opt)} chars"


def test_tfidf_no_cartesian_and_jvm_side(spark):
    plan = plan_of(_q(spark, "tfidf_top_terms"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_joins_on_shingle_key(spark):
    # the eval x train comparison must be a shingle-key equi-join,
    # never a doc x doc product
    plan = plan_of(_q(spark, "contamination_overlap"))
    assert "CartesianProduct" not in plan


def test_ivf_centroids_broadcast(spark):
    # centroid assignment must broadcast the (tiny) centroid table;
    # the corpus side must never be the build side of a cartesian
    plan = plan_of(_q(spark, "ivf_topk_probe"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_partitioned_events_scan_prunes_partitions(spark, tmp_path):
    """Hypertable-style layout: events partitioned by day on disk; a
    day-range query must prune to matching partition directories
    (PartitionFilters in the scan), not read the whole table."""
    from transcript_analysis_spark.sources.tables import load_table
    path = str(tmp_path / "events_by_day")
    e = load_table(spark, SF_DIR, "events")
    (e.withColumn("event_date", F.to_date("ts"))
     .write.mode("overwrite").partitionBy("event_date").parquet(path))
    df = (spark.read.parquet(path)
          .filter("event_date = date'2024-01-02'")
          .select("event_id", "value"))
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "event_date" in plan
    # the filter must NOT degrade to a post-scan Filter on event_date
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "event_date" in pf.group(1)


def test_registered_queries_compose_with_partitioned_layout(spark, tmp_path):
    """SCALE.md's claim, demonstrated (VERDICT r2 #8): re-lay the
    corpus out hive-partitioned and the REGISTERED plans run
    unchanged, produce identical results, AND prune partitions — the
    event_type filters inside the funnel/as-of queries must reach the
    scan as PartitionFilters, not post-scan Filters."""
    import os
    import re
    from transcript_analysis_spark.plans import all_queries
    from transcript_analysis_spark.sources.tables import TABLES, load_table
    part_dir = str(tmp_path / "partitioned_sf")
    os.makedirs(part_dir)
    for name in TABLES:
        dst = f"{part_dir}/{name}.parquet"
        if name == "events":
            # same table, hive layout: events.parquet/event_type=*/...
            (load_table(spark, SF_DIR, "events")
             .write.partitionBy("event_type").parquet(dst))
        else:
            os.symlink(f"{SF_DIR}/{name}.parquet", dst)
    registry = all_queries()
    for qname in ("funnel_view_click_purchase", "asof_purchase_context",
                  "tumbling_hourly_event_stats"):
        fn = registry[qname].fn
        flat = sorted(map(str, fn(spark, SF_DIR).collect()))
        part = sorted(map(str, fn(spark, part_dir).collect()))
        assert flat == part, f"{qname}: results differ across layouts"
    # pruning: every event_type equality filter becomes a PartitionFilter
    for qname in ("funnel_view_click_purchase", "asof_purchase_context"):
        plan = plan_of(registry[qname].fn(spark, part_dir))
        pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        pruned = [p for p in pfs if "event_type" in p]
        assert pruned, f"{qname}: no PartitionFilters on event_type:\n{plan[:2000]}"


def test_rolling_window_is_partitioned_not_single_task(spark):
    """rolling_7day_revenue's range frame must run under a PARTITIONED
    window (per-year, with boundary-pad rows) — an unpartitioned
    ordered window serializes every day through one task."""
    plan = plan_of(_q(spark, "rolling_7day_revenue"))
    import re
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        # spec args: [partition cols...], [sort cols ASC...], frame;
        # an unpartitioned spec starts directly with the sort column
        assert "yr#" in args.split(",")[0], f"unpartitioned window: {args}"


def test_no_unpartitioned_window_specs_in_source():
    """Grep gate (VERDICT r2 #9): every Window spec in the plan/
    operator source must declare partitionBy — a bare Window.orderBy
    serializes its whole input through one task at scale. Genuinely
    global orderings go through TakeOrderedAndProject (ORDER BY +
    LIMIT) or a partitioned two-level scheme instead."""
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1] / \
        "transcript_analysis_spark"
    offenders = []
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if "Window.orderBy" in line or "Window().orderBy" in line:
                offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert not offenders, \
        "unpartitioned window specs found:\n" + "\n".join(offenders)


def test_session_config_scale_flags(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_quality_classifier_is_zero_shuffle_jvm_math(spark):
    """The hashed-bag-of-words classifier must stay pure per-row JVM
    math: no Python eval, no join, and no hash-partition exchange —
    the only allowed exchange is fanout()'s explicit round-robin."""
    import re
    plan = plan_of(_q(spark, "quality_classifier_scores"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    shuffles = re.findall(r"Exchange (\w+)", plan)
    assert all(s == "RoundRobinPartitioning" for s in shuffles), shuffles


def test_repetition_signals_partial_agg_no_python(spark):
    """Repetition stats must hash-aggregate with map-side partials
    (the explode's repeats collapse before the exchange) and keep the
    term math JVM-side."""
    plan = plan_of(_q(spark, "repetition_signals"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side combine before shuffle


def test_crossdoc_dup_rate_is_equi_join(spark):
    """doc-frequency join-back must be a shingle-key equi-join — never
    doc x doc, never a nested loop."""
    plan = plan_of(_q(spark, "crossdoc_shingle_dup_rate"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ccnet_tercile_window_partitioned_by_lang(spark):
    """NTILE must run under PARTITION BY lang — an unpartitioned
    tercile would rank the whole corpus through one task."""
    import re
    plan = plan_of(_q(spark, "ccnet_quality_buckets"))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for args in specs:
        assert "lang#" in args.split(",")[0], f"unpartitioned ntile: {args}"


# --- selection tier (plans/selection.py) ---------------------------------

def test_dsir_weight_table_broadcasts_no_cartesian(spark):
    """The vocabulary-sized weight table must broadcast back onto the
    count table (never a corpus shuffle on the word key at this
    vocabulary size), and the only nested-loop joins are the bounded
    single-row totals crossJoin."""
    plan = plan_of(_q(spark, "dsir_importance_weights"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_mmr_candidate_reduce_is_take_ordered(spark):
    """The corpus-sized stage of MMR is the top-N candidate reduce —
    it must be TakeOrderedAndProject (per-partition heads), not a
    global Sort."""
    from transcript_analysis_spark.plans import selection
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from pyspark.sql import functions as F2
    q = (e.selectExpr("vec_id", "transform(embedding, x -> cast(x as"
                      " double)) as v"))
    qv = q.filter(F2.col("vec_id") == 0).select(F2.col("v").alias("qv"))
    cand = (q.filter(F2.col("vec_id") != 0).crossJoin(F2.broadcast(qv))
            .select("vec_id")
            .orderBy("vec_id").limit(selection.MMR_N))
    assert "TakeOrderedAndProject" in plan_of(cand)


def test_event_paths_single_partitioned_aggregate(spark):
    """Path building is one user-partitioned aggregate: no window at
    all (sort_array inside the agg), no cartesian, no Python."""
    plan = plan_of(_q(spark, "event_path_pattern_match"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Window" not in plan


def test_triangle_census_all_equi_joins(spark):
    """Wedge-building and closing are hash equi-joins on part keys —
    a cartesian here means the canonical a<b<c join decomposed."""
    plan = plan_of(_q(spark, "part_triangle_count"))
    assert "CartesianProduct" not in plan


def test_containment_joins_on_shingle_key(spark):
    plan = plan_of(_q(spark, "ngram_containment_pairs"))
    assert "CartesianProduct" not in plan
    assert "shingle" in plan


def test_pmi_margins_broadcast_topk_take_ordered(spark):
    plan = plan_of(_q(spark, "skipgram_pmi_pairs"))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_session_paths_windows_are_user_partitioned(spark):
    """Both sessionization windows and the final top-k must avoid any
    single-task stage: windows partition by user_id, top-k is
    TakeOrderedAndProject."""
    plan = plan_of(_q(spark, "top_session_paths"))
    assert "TakeOrderedAndProject" in plan
    for frag in plan.split("Window ")[1:]:
        head = frag.split("\n")[0]
        assert "user_id" in head, f"unpartitioned window: {head[:120]}"


def test_pit_join_is_one_window_pass_no_range_join(spark):
    """The as-of rewrite must plan as a user-partitioned window over
    the unioned stream — no interval join (no nested-loop/cartesian),
    no Python."""
    plan = plan_of(_q(spark, "scd2_point_in_time_join"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    for frag in plan.split("Window ")[1:]:
        head = frag.split("\n")[0]
        assert "user_id" in head, f"unpartitioned window: {head[:120]}"


# --- round-9 additions: evidence reports + smoothed scorers -------------

def test_smoothed_scorers_no_cartesian_no_python(spark):
    """lidstone/KN scorers must keep ngram_model_score's plan
    discipline: zero CartesianProduct, zero Python stages; the only
    nested-loop joins are broadcast single-row/model frames."""
    for name in ("lidstone_model_score", "kneser_ney_model_score"):
        plan = plan_of(_q(spark, name))
        assert "CartesianProduct" not in plan, name
        assert "EvalPython" not in plan and "InPandas" not in plan, name


def test_ann_recall_report_plan_shape(spark):
    """Ground truth + every index probe stay TakeOrdered (per-partition
    heads, no global sort) and the broadcast structures (query vector,
    codebook, centroids) broadcast; no cartesian."""
    plan = plan_of(_q(spark, "ann_recall_report"))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_lsh_band_tuning_report_plan_shape(spark):
    """Each banded self-join is an equi-join on (band, key) — never a
    cartesian — and the truth join is the shingle equi-join; all
    JVM-side."""
    plan = plan_of(_q(spark, "lsh_band_tuning_report"))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_gopher_flags_map_only_no_shuffle_no_python(spark):
    """The Gopher rule gate is a single map-only corpus pass: no
    exchange at all, no join, no Python eval — the cheapest filter a
    curation pipeline runs (r8)."""
    plan = plan_of(_q(spark, "gopher_quality_flags"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "Exchange" not in plan, plan


def test_catalog_row_counts_partial_aggregated_scans(spark):
    """Every per-table count must partial-aggregate at the scan (one
    long per partition through each exchange) — never a wide
    collect-then-count (r8)."""
    import re
    plan = plan_of(_q(spark, "catalog_row_counts"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    # ten scans -> ten partial_count + final count pairs
    assert len(re.findall(r"partial_count", plan)) >= 10


def test_island_audit_sample_take_ordered_not_global_sort(spark):
    """The reviewer sample must cut with TakeOrderedAndProject (top-N
    push), never a full global Sort+Limit over the island table, and
    stay free of cartesian products and Python eval (r8)."""
    plan = plan_of(_q(spark, "island_audit_sample"))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_island_param_sensitivity_no_cartesian_no_python(spark):
    """The config sweep is ONE grouped aggregate over the config-
    labeled island explosion — no cartesian blowup, no Python eval;
    every join is the flagship's own equi/broadcast shapes (r8).
    Since r9 the shared smoothing pass is PINNED (localCheckpoint)
    and the array-domain segmentation computes every config per ROW
    (`find_islands_multi`), so the plan must contain EXACTLY ONE scan
    of the checkpointed RDD — not one per config — and no parquet
    scan may survive into the sweep plan."""
    import re

    plan = plan_of(_q(spark, "island_param_sensitivity"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FileScan parquet" not in plan, plan
    # the corpus-sized checkpoint is the ExistingRDD scan carrying the
    # smoothed column (the other ExistingRDD is the |configs|-row dim)
    corpus_scans = len(re.findall(r"Scan ExistingRDD\[[^\]]*smoothed",
                                  plan))
    assert corpus_scans == 1, f"{corpus_scans} checkpoint scans\n{plan}"


def test_island_threshold_recommendation_driver_sized_tail(spark):
    """The recommendation adds only broadcast agg-max compares over
    the |configs|-row sweep output (the repo's no-unpartitioned-window
    discipline — the global pick is agg + broadcast crossJoin, never a
    bare ordered window): same checkpoint-backed scan discipline, no
    cartesian product, no Python eval, no extra parquet scan beyond
    the pinned sweep (r9)."""
    plan = plan_of(_q(spark, "island_threshold_recommendation"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FileScan parquet" not in plan, plan
    # both single-row compare frames must come in as broadcasts
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_island_judged_recommendation_plan_shape(spark):
    """The r10 judged-precision pick: the fixture, the matching, and
    the coverage annotation all read the ONE smoothing checkpoint —
    no parquet re-scan, no cartesian product, no Python eval; the
    judgment match is a plain join (the containment condition rides
    on the doc/model equi-keys), and the global pick stays the
    broadcast agg-max compare discipline."""
    plan = plan_of(_q(spark, "island_judged_recommendation"))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FileScan parquet" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
