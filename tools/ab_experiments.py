"""Variant builders for tools/ab_bench.py (r13 optimization round).

Each experiment maps variant names to builder(spark, sf_dir) -> DataFrame.
Variants that depend on a SQL conf set it at build time (confs are read
at planning, so per-variant toggling inside one session is sound).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from transcript_analysis_spark.plans import all_queries  # noqa: E402


def _q(name):
    return all_queries()[name].fn


def _with_conf(fn, **confs):
    def build(spark, sf_dir):
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            return fn(spark, sf_dir)
        finally:
            pass
    return build


def exp_shj(spark):
    """preferSortMergeJoin=false on the SMJ-heavy headliners."""
    out = {}
    for q in ("pagerank_purchase_graph", "bloom_prefilter_contamination",
              "corpus_release_prep"):
        out[f"{q}:smj"] = _with_conf(
            _q(q), **{"spark.sql.join.preferSortMergeJoin": "true"})
        out[f"{q}:shj"] = _with_conf(
            _q(q), **{"spark.sql.join.preferSortMergeJoin": "false"})
    return out


def exp_asof(spark):
    """Re-measure asof (suspected weather in sitting 1)."""
    return {"asof_purchase_context": _q("asof_purchase_context"),
            "tumbling": _q("tumbling_hourly_event_stats")}


def _bloom_union(spark, sf_dir):
    """bloom_prefilter_contamination with counts+overlap computed in
    ONE aggregate over a union (positives joined to train first),
    dropping the final doc_id join."""
    from transcript_analysis_spark.plans.data_pipeline import (
        EVAL_SOURCES, _spark_shingles, _t, spark_char_hash)
    from transcript_analysis_spark.plans.scale_ops import (
        bloom_words, bloom_hit_column)

    sh = _spark_shingles(spark, sf_dir)
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    train = (sh.join(src.filter(~is_eval), "doc_id")
             .select("shingle").distinct().localCheckpoint(eager=True))
    bwords = bloom_words(train)
    bitmap = bwords.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "bits"))).alias("bm"))
    ev = (sh.join(src.filter(is_eval), "doc_id")
          .withColumn("h", F.expr(spark_char_hash("shingle"))))
    probe = ev.join(F.broadcast(bitmap))
    hit = bloom_hit_column("h", "bm")
    probe = (probe.select("doc_id", "shingle", hit.alias("bloom_hit"))
             .localCheckpoint(eager=True))
    pos = (probe.filter("bloom_hit")
           .join(train.withColumn("in_train", F.lit(1)), "shingle", "left")
           .select("doc_id", F.lit(1).alias("is_cand"),
                   F.coalesce("in_train", F.lit(0)).alias("in_train")))
    neg = (probe.filter(~F.col("bloom_hit"))
           .select("doc_id", F.lit(0).alias("is_cand"),
                   F.lit(0).alias("in_train")))
    u = pos.unionAll(neg)
    return (u.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum("is_cand").cast("long").alias("n_candidates"),
                 F.sum("in_train").cast("long").alias("n_overlap"))
            .select("doc_id", "n_shingles", "n_candidates", "n_overlap",
                    (F.col("n_candidates") - F.col("n_overlap"))
                    .cast("long").alias("n_false_positives")))


def exp_bloom(spark):
    return {"bloom:current": _q("bloom_prefilter_contamination"),
            "bloom:union1agg": _bloom_union}


def _islands_hoisted(spark, sf_dir):
    """islands_flagship with the per-word integer base hoisted above
    the model cross join (string ops once per word, not once per
    (word, model))."""
    from transcript_analysis_spark.operators import islands as isl
    from transcript_analysis_spark.plans.domain import (
        fanout, load_table, segments_from)

    docs = fanout(load_table(spark, sf_dir, "documents"))
    models = spark.range(5).select(F.col("id").alias("model_id"))
    base = ("transform(words, (w, i) -> ascii(substr(w, 1, 1)) * 31"
            " + length(w) * 17 + (i + 1) * 7)")
    scored0 = (
        docs.select("doc_id", F.split("text", " ").alias("words"))
        .withColumn("__base", F.expr(base))
        .crossJoin(F.broadcast(models))
        .withColumn("raw", F.expr(
            "transform(__base, b -> CASE WHEN (b + model_id * 13) % 10 < 3"
            " THEN CAST(0.9 AS DOUBLE) ELSE CAST(0.1 AS DOUBLE) END)"))
        .drop("__base"))
    scored = isl.smooth_scores(scored0, score_col="raw",
                               out_col="smoothed")
    found = isl.find_islands(scored, keys=["doc_id", "model_id"],
                             score_col="raw", smoothed_col="smoothed")
    ranged = isl.with_word_range(found)
    segments = segments_from(docs)
    timed = isl.with_time_range(ranged, segments, key="doc_id")
    return timed.select(
        "doc_id", "model_id", "start_index", "end_index",
        "word_start", "word_end", "time_start_sec", "time_end_sec",
        "average_score")


def exp_islands(spark):
    return {"islands:current": _q("islands_flagship"),
            "islands:hoisted": _islands_hoisted}


_SQL_FRONTEND = """
    SELECT r.r_name,
           COUNT(*)                                              AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
"""


def _sqlfrontend_scoped(spark, sf_dir):
    from transcript_analysis_spark.sources.tables import load_table
    for name in ("lineitem", "orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_FRONTEND)


def exp_sqlfrontend(spark):
    return {"sqlf:all10views": _q("sql_frontend_revenue_by_region"),
            "sqlf:5views": _sqlfrontend_scoped}


EXPERIMENTS = {
    "shj": exp_shj,
    "asof": exp_asof,
    "bloom": exp_bloom,
    "islands": exp_islands,
    "sqlfrontend": exp_sqlfrontend,
}
