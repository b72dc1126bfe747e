"""Domain queries — the reference's transcript/score/island/model
surface, derived deterministically from the driver corpus.

The DuckDB oracle only sees the driver's parquet tables, so these
queries DERIVE the domain shapes in-query from `documents`:

- tokens: `split(text, ' ')` with 1-based positions (documents.text is
  single-space-separated words).
- per-word scores: pure integer arithmetic on (word, pos, model_id) —
  identical in Spark and DuckDB, no engine hash functions.
- segments: fixed 10-word caption segments at 4.0 s each, mirroring
  `vid_transcript_table`'s (start, duration, cum_word_count) shape.
- n-gram models: bigram/unigram count tables per `source` (SURVEY
  §7.4 Option A: models-as-data; scoring is a co-partitioned join, not
  a pickled-model UDF).

Float parity contract: every float that feeds a comparison or appears
in output is rounded identically on both sides; constants are inlined
as repr() literals so both engines parse the same double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.operators import islands as isl
from transcript_analysis_spark.plans.registry import register
from transcript_analysis_spark.functions.rounding import spark_round_ratio
from transcript_analysis_spark.sources.tables import fanout, load_table

N_MODELS = 5

# Deterministic per-word raw score: bimodal {0.9, 0.1} from integer
# arithmetic (mirrors FIXTURES.md "crafted island arrays" — clustered
# high words produce smoothed bumps above the 0.6 threshold).
_RAW_EXPR = ("CASE WHEN (ascii(substr({w}, 1, 1)) * 31 + length({w}) * 17 "
             "+ {pos} * 7 + {model} * 13) % 10 < 3 "
             "THEN CAST(0.9 AS DOUBLE) ELSE CAST(0.1 AS DOUBLE) END")


def _kernel_values_sql() -> str:
    """DuckDB VALUES list (off, w) for the Gaussian kernel, from the
    exact same float literals the Spark plan uses."""
    kernel = isl.gaussian_kernel()
    rows = ", ".join(
        f"({off}, CAST({w!r} AS DOUBLE))"
        for off, w in zip(range(-isl.DEFAULT_SMOOTH_SIZE,
                                isl.DEFAULT_SMOOTH_SIZE + 1), kernel))
    return f"(VALUES {rows}) AS kern(off, w)"


def _scored_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents x models -> (doc_id, model_id, words, raw array<double>).

    The Spark-first restatement of the reference's scoring product
    (one score array per (vid, model) pair,
    `client/async_processing_client.py:406-444`): the cross join IS the
    697.9M-pair work matrix (SURVEY §2.3 J8); score arrays are computed
    as per-row JVM array expressions — no shuffle, no Python.
    """
    return scored_documents_from(fanout(load_table(spark, sf_dir,
                                                   "documents")))


def scored_documents_from(docs: DataFrame) -> DataFrame:
    """The scoring product over an arbitrary (doc_id, text) frame —
    shared by the batch flagship and the streaming islands store so
    their score derivations cannot drift."""
    spark = docs.sparkSession
    models = spark.range(N_MODELS).select(F.col("id").alias("model_id"))
    raw = _RAW_EXPR.format(w="w", pos="(i + 1)", model="model_id")
    return (
        docs.select("doc_id", F.split("text", " ").alias("words"))
        .crossJoin(F.broadcast(models))
        .withColumn("raw", F.expr(f"transform(words, (w, i) -> {raw})"))
    )


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return segments_from(load_table(spark, sf_dir, "documents"))


def segments_from(docs: DataFrame) -> DataFrame:
    """Derived caption segments: 10 words / 4.0 s each per document
    (the `vid_transcript_table` shape, `sql/schema.sql:67-77`)."""
    return (
        docs.select("doc_id", F.size(F.split("text", " ")).alias("wc"))
        .filter(F.col("wc") > 0)
        .select(
            "doc_id",
            F.explode(F.expr("sequence(0, cast(floor((wc - 1) / 10) as long))"))
             .alias("seg_idx"),
            "wc")
        .select(
            "doc_id",
            (F.col("seg_idx") * 10 + 1).cast("long").alias("seg_start_word"),
            F.least(F.col("wc").cast("long"),
                    (F.col("seg_idx") * 10 + 10).cast("long")).alias("seg_end_word"),
            (F.col("seg_idx") * F.lit(4.0)).alias("start_sec"),
            F.lit(4.0).alias("duration_sec"),
        )
    )


_TOK_CTE = """
    tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' '))                 AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    )
"""

_RAW_CTE = f"""
    models AS (SELECT unnest(generate_series(0, {N_MODELS - 1})) AS model_id),
    raw AS (
      SELECT t.doc_id, m.model_id, t.pos,
             {_RAW_EXPR.format(w='t.word', pos='t.pos', model='m.model_id')} AS raw
      FROM tok t CROSS JOIN models m
    )
"""


def _norm_ctes(materialized: bool = False) -> str:
    """The shared smooth-and-normalize oracle CTEs (conv -> norm),
    used by the flagship AND the parameter-sensitivity sweep so the
    smoothing replay cannot drift between them. `materialized` forces
    one evaluation when norm is referenced from several config
    branches (the DuckDB CTE-inlining lesson, SCALE.md r8)."""
    m = " MATERIALIZED" if materialized else ""
    return f"""
    conv AS (
      SELECT r1.doc_id, r1.model_id, r1.pos, r1.raw,
             ROUND(SUM(r2.raw * kern.w), {isl.SMOOTH_ROUND}) AS conv
      FROM raw r1
      JOIN {_kernel_values_sql()} ON TRUE
      LEFT JOIN raw r2
        ON r2.doc_id = r1.doc_id AND r2.model_id = r1.model_id
       AND r2.pos = r1.pos + kern.off
      GROUP BY r1.doc_id, r1.model_id, r1.pos, r1.raw
    ),
    norm AS{m} (
      SELECT doc_id, model_id, pos, raw,
             CASE WHEN MAX(conv) OVER (PARTITION BY doc_id, model_id) > 0
                  THEN ROUND(conv / MAX(conv) OVER (PARTITION BY doc_id, model_id),
                             {isl.SMOOTH_ROUND})
                  ELSE conv END AS sm
      FROM conv
    )"""


@register(
    "islands_flagship",
    oracle=f"""
    WITH {_TOK_CTE},
    {_RAW_CTE},
    {_norm_ctes()},
    flagged AS (
      SELECT *,
             (pos - 1) - ROW_NUMBER() OVER (PARTITION BY doc_id, model_id
                                            ORDER BY pos) AS grp
      FROM norm WHERE sm >= CAST(0.6 AS DOUBLE)
    ),
    isl AS (
      SELECT doc_id, model_id,
             CAST(MIN(pos) - 1 AS BIGINT)       AS start_index,
             CAST(MAX(pos) - 1 AS BIGINT)       AS end_index,
             CAST(MIN(pos) AS BIGINT)           AS word_start,
             CAST(MAX(pos) + 3 AS BIGINT)       AS word_end,
             ROUND(AVG(raw), {isl.SCORE_ROUND}) AS average_score
      FROM flagged
      GROUP BY doc_id, model_id, grp
      HAVING MAX(pos) - MIN(pos) >= {isl.DEFAULT_MIN_ISLAND_LENGTH}
    ),
    seg AS (
      SELECT doc_id,
             CAST(FLOOR((pos - 1) / 10) AS BIGINT) AS seg_idx,
             COUNT(*)                              AS wc
      FROM tok GROUP BY doc_id, 2
    ),
    seg2 AS (
      SELECT doc_id,
             seg_idx * 10 + 1                    AS seg_start_word,
             seg_idx * 10 + wc                   AS seg_end_word,
             seg_idx * CAST(4.0 AS DOUBLE)       AS start_sec,
             CAST(4.0 AS DOUBLE)                 AS duration_sec
      FROM seg
    )
    SELECT i.doc_id, i.model_id, i.start_index, i.end_index,
           i.word_start, i.word_end,
           GREATEST(CAST(0 AS DOUBLE), MIN(s.start_sec) - 5) AS time_start_sec,
           MAX(s.start_sec + s.duration_sec) + 5              AS time_end_sec,
           i.average_score
    FROM isl i
    JOIN seg2 s ON s.doc_id = i.doc_id
               AND s.seg_end_word >= i.word_start
               AND s.seg_start_word <= i.word_end
    GROUP BY i.doc_id, i.model_id, i.start_index, i.end_index,
             i.word_start, i.word_end, i.average_score
    """,
    headline=True,
    tags=("W3", "W4", "W5", "W6", "J6", "A10", "A13"),
)
def islands_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship: Gaussian smooth -> gaps-and-islands -> word range
    -> segment time range -> average raw score, per (doc, model) pair
    (reference `island_worker.py:150-174` +
    `build_islands_from_scores.py:321-332`). Smoothing is per-row JVM
    array math; one shuffle for the islands grouping; one equi+range
    hash join for times.

    The fanout is doc_id-keyed (r13): both join sides of the
    time-range join derive from the same keyed frame, so the join
    reuses the partitioning instead of re-exchanging both sides, and
    the keyless repartition's sort-before-repartition disappears —
    measured −22% min-of-5 at sf0.1 (interleaved A/B, twice)."""
    return islands_from_docs(
        fanout(load_table(spark, sf_dir, "documents"), key="doc_id"))


def islands_from_docs(docs: DataFrame) -> DataFrame:
    """The full flagship chain over an arbitrary (doc_id, text) frame.

    Factored out so the streaming islands store
    (streaming/islands_store.py) runs the IDENTICAL operator chain per
    micro-batch — islands for a (doc, model) pair depend only on that
    doc's text, so per-doc results computed batch-at-a-time union to
    exactly the batch plan's output."""
    scored = isl.smooth_scores(scored_documents_from(docs),
                               score_col="raw", out_col="smoothed")
    found = isl.find_islands(scored, keys=["doc_id", "model_id"],
                             score_col="raw", smoothed_col="smoothed")
    ranged = isl.with_word_range(found)
    segments = segments_from(docs)
    timed = isl.with_time_range(ranged, segments, key="doc_id")
    return timed.select(
        "doc_id", "model_id", "start_index", "end_index",
        "word_start", "word_end", "time_start_sec", "time_end_sec",
        "average_score")


@register(
    "ngram_model_score",
    oracle="""
    WITH tok AS (
      SELECT d.doc_id, d.source,
             unnest(string_split(d.text, ' '))                 AS word,
             generate_subscripts(string_split(d.text, ' '), 1) AS pos
      FROM documents d
    ),
    bi AS (
      SELECT t1.doc_id, t1.source, t1.pos, t1.word AS w1, t2.word AS w2
      FROM tok t1
      JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
    ),
    c2 AS (
      SELECT source AS model_source, w1, w2, COUNT(*) AS cnt2
      FROM bi GROUP BY source, w1, w2
    ),
    c1 AS (
      SELECT model_source, w1, CAST(SUM(cnt2) AS BIGINT) AS cnt1
      FROM c2 GROUP BY model_source, w1
    ),
    cu AS (
      SELECT source AS model_source, word, COUNT(*) AS cntu
      FROM tok GROUP BY source, word
    ),
    tot AS (
      SELECT source AS model_source, COUNT(*) AS total
      FROM tok GROUP BY source
    ),
    pairs AS (
      SELECT b.doc_id, m.model_source, b.pos, b.w1, b.w2
      FROM bi b CROSS JOIN (SELECT model_source FROM tot) m
    ),
    scored AS (
      SELECT p.doc_id, p.model_source,
             CASE
               WHEN c2.cnt2 IS NOT NULL
                 THEN ROUND(LOG10(CAST(c2.cnt2 AS DOUBLE) / c1.cnt1), 9)
               WHEN cu.cntu IS NOT NULL
                 THEN ROUND(LOG10((CAST(0.4 AS DOUBLE) * cu.cntu) / t.total), 9)
               ELSE CAST(-7.0 AS DOUBLE)
             END AS logp
      FROM pairs p
      LEFT JOIN c2 ON c2.model_source = p.model_source
                  AND c2.w1 = p.w1 AND c2.w2 = p.w2
      LEFT JOIN c1 ON c1.model_source = p.model_source AND c1.w1 = p.w1
      LEFT JOIN cu ON cu.model_source = p.model_source AND cu.word = p.w2
      JOIN tot t ON t.model_source = p.model_source
    )
    SELECT doc_id, model_source,
           (CAST((CASE WHEN (SUM(CAST(ROUND(logp * 1e9, 0) AS BIGINT))) < 0 THEN -1 ELSE 1 END) * ((2 * abs(CAST((SUM(CAST(ROUND(logp * 1e9, 0) AS BIGINT))) AS BIGINT)) * 1 + (COUNT(*)) * 1000) // (2 * (COUNT(*)) * 1000)) AS DOUBLE) / 1000000) AS avg_logprob,
           COUNT(*)                                     AS n_ngrams
    FROM scored
    GROUP BY doc_id, model_source
    """,
    headline=True,
    tags=("W1", "W2", "F1", "J8"),
)
def ngram_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM scoring as a JOIN, not a pickled-model UDF (SURVEY
    §7.4 Option A). Models = bigram/unigram count tables per `source`
    (MLE with stupid-backoff 0.4 to unigram, floor -7); scoring = doc
    bigrams x models, left join to the count tables, coalesce down the
    back-off chain (reference hot loop
    `client/async_processing_client.py:177-179` re-expressed).

    At scale both sides partition by the join key (ngram), the model
    tables are orders of magnitude smaller than the pair matrix, and
    no executor ever holds a 480 MB pickle (BASELINE.md).

    The count tables look multiply-referenced (c2 by the context
    table AND the scoring join; cu by the totals, the model dim AND
    the join) but need no explicit materialization: each ends in its
    count-shuffle EXCHANGE, and AQE's runtime ReusedExchange computes
    identical exchanges once per query (verified: pinning them was
    measured 13% slower at sf0.1). Explicit pins are reserved for
    repeated subtrees reuse cannot cover — map-only branches with no
    exchange, or differing-key aggregations (see
    fourgram_model_score)."""
    docs = fanout(load_table(spark, sf_dir, "documents"))
    d = docs.select("doc_id", "source", F.split("text", " ").alias("words"))
    # bigrams straight from the word array: zip(words[:-1], words[1:]) —
    # no self-join, no shuffle (W1's sliding window as array ops).
    bi = (
        d.select(
            "doc_id", "source",
            F.posexplode(F.arrays_zip(
                F.slice("words", 1, F.size("words") - 1),
                F.slice("words", 2, F.size("words") - 1)))
             .alias("pos0", "z"))
        .select("doc_id", "source",
                (F.col("pos0") + 1).alias("pos"),
                F.col("z")["0"].alias("w1"),
                F.col("z")["1"].alias("w2"))
    )
    tok = (d.select("doc_id", "source",
                    F.posexplode("words").alias("pos0", "word"))
           .select("doc_id", "source", "word"))
    # The repeated count-table references need no pins: each table
    # ends in an EXCHANGE (its count shuffle), and AQE's runtime
    # ReusedExchange dedups identical exchanges across consumers — a
    # localCheckpoint here was measured 13% SLOWER (eager pin jobs
    # serialize what one DAG runs concurrently). Contrast fourgram,
    # where the four per-order groupBys have DIFFERENT keys (no
    # identical exchange to reuse) and a structural single pass wins.
    c2 = (bi.groupBy(F.col("source").alias("model_source"), "w1", "w2")
            .agg(F.count(F.lit(1)).alias("cnt2")))
    c1 = (c2.groupBy("model_source", "w1")
            .agg(F.sum("cnt2").cast("long").alias("cnt1")))
    cu = (tok.groupBy(F.col("source").alias("model_source"), "word")
             .agg(F.count(F.lit(1)).alias("cntu")))
    # total tokens per source = sum of unigram counts — derived from cu
    # instead of re-scanning/re-exploding the corpus a third time
    tot = (cu.groupBy("model_source")
             .agg(F.sum("cntu").cast("long").alias("total")))
    models = tot.select("model_source")
    pairs = bi.select("doc_id", "pos", "w1", "w2").crossJoin(F.broadcast(models))
    scored = (
        pairs
        .join(c2, ["model_source", "w1", "w2"], "left")
        .join(c1, ["model_source", "w1"], "left")
        .join(cu.withColumnRenamed("word", "w2"), ["model_source", "w2"], "left")
        .join(F.broadcast(tot), ["model_source"])
        .select(
            "doc_id", "model_source",
            F.when(F.col("cnt2").isNotNull(),
                   F.round(F.log10(F.col("cnt2").cast("double") / F.col("cnt1")), 9))
             .when(F.col("cntu").isNotNull(),
                   F.round(F.log10((F.lit(0.4) * F.col("cntu")) / F.col("total")), 9))
             .otherwise(F.lit(-7.0))
             .alias("logp"))
    )
    # The 9dp-rounded logps are summed as exact scaled integers so the
    # per-group average is independent of summation order (engine
    # aggregation order is arbitrary; a float sum could land on a 6dp
    # rounding boundary and flip the last digit between engines).
    # n_prescale=9: the summed logps are 1e9-scaled integers; letting
    # the rounding helper cancel that against the 10^6 output scale
    # keeps 2*|N| (not 2*|N|*10^6) as the largest intermediate, so
    # int64 holds to ~2e8-word documents instead of overflowing at a
    # few hundred words.
    return (scored.groupBy("doc_id", "model_source")
            .agg(spark_round_ratio(
                    "sum(cast(round(logp * 1e9, 0) as bigint))",
                    "count(1)", 6, n_prescale=9).alias("avg_logprob"),
                 F.count(F.lit(1)).alias("n_ngrams")))


LIDSTONE_GAMMA = 0.5    # exactly representable in binary — both
                        # engines form bit-identical (c + 0.5) and
                        # (denom + 0.5 * V) doubles before log10


@register(
    "lidstone_model_score",
    oracle=f"""
    WITH tok AS (
      SELECT d.doc_id, d.source,
             unnest(string_split(d.text, ' '))                 AS word,
             generate_subscripts(string_split(d.text, ' '), 1) AS pos
      FROM documents d
    ),
    bi AS (
      SELECT t1.doc_id, t1.source, t1.pos, t1.word AS w1, t2.word AS w2
      FROM tok t1
      JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
    ),
    c2 AS (
      SELECT source AS model_source, w1, w2, COUNT(*) AS cnt2
      FROM bi GROUP BY source, w1, w2
    ),
    c1 AS (
      SELECT model_source, w1, CAST(SUM(cnt2) AS BIGINT) AS cnt1
      FROM c2 GROUP BY model_source, w1
    ),
    cu AS (
      SELECT source AS model_source, word, COUNT(*) AS cntu
      FROM tok GROUP BY source, word
    ),
    tot AS (
      SELECT model_source, CAST(SUM(cntu) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS vsz
      FROM cu GROUP BY model_source
    ),
    pairs AS (
      SELECT b.doc_id, m.model_source, b.pos, b.w1, b.w2
      FROM bi b CROSS JOIN (SELECT model_source FROM tot) m
    ),
    scored AS (
      SELECT p.doc_id, p.model_source,
             CASE
               WHEN c2.cnt2 IS NOT NULL
                 THEN ROUND(LOG10((CAST(c2.cnt2 AS DOUBLE) + {LIDSTONE_GAMMA})
                            / (c1.cnt1 + {LIDSTONE_GAMMA} * t.vsz)), 9)
               WHEN cu.cntu IS NOT NULL
                 THEN ROUND(LOG10(CAST(0.4 AS DOUBLE)
                            * (cu.cntu + {LIDSTONE_GAMMA})
                            / (t.total + {LIDSTONE_GAMMA} * t.vsz)), 9)
               ELSE ROUND(LOG10(CAST({LIDSTONE_GAMMA} AS DOUBLE)
                          / (t.total + {LIDSTONE_GAMMA} * t.vsz)), 9)
             END AS logp
      FROM pairs p
      LEFT JOIN c2 ON c2.model_source = p.model_source
                  AND c2.w1 = p.w1 AND c2.w2 = p.w2
      LEFT JOIN c1 ON c1.model_source = p.model_source AND c1.w1 = p.w1
      LEFT JOIN cu ON cu.model_source = p.model_source AND cu.word = p.w2
      JOIN tot t ON t.model_source = p.model_source
    )
    SELECT doc_id, model_source,
           (CAST((CASE WHEN (SUM(CAST(ROUND(logp * 1e9, 0) AS BIGINT))) < 0 THEN -1 ELSE 1 END) * ((2 * abs(CAST((SUM(CAST(ROUND(logp * 1e9, 0) AS BIGINT))) AS BIGINT)) * 1 + (COUNT(*)) * 1000) // (2 * (COUNT(*)) * 1000)) AS DOUBLE) / 1000000) AS avg_logprob,
           COUNT(*)                                     AS n_ngrams
    FROM scored
    GROUP BY doc_id, model_source
    """,
    tags=("W2", "F1", "smoothing"),
)
def lidstone_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ngram_model_score` under Lidstone additive smoothing — the
    smoothing-mode contract that lets in-engine training match
    imported NLTK-style models (the reference's pickles bake the
    smoothing in at training time,
    `client/async_processing_client.py:177-179`; the engine makes it
    a declared mode, round-trip-tested against
    `NGramModel.train(smoothing='lidstone')`).

    Estimates: bigram (c+g)/(denom + g*V), backed off (alpha 0.4) to
    Lidstone unigrams, with unseen words scoring the raw unknown mass
    g/(total + g*V) — flat, no backoff penalty (the penalty models
    backing off between OBSERVED orders). g = {LIDSTONE_GAMMA}
    (binary-exact, so both engines round identical doubles at 9dp).
    Plan shape is identical to ngram_model_score: count tables are
    vocab-bounded aggregates, the pair matrix never materializes
    driver-side, averages go through the exact scaled-integer sum."""
    docs = fanout(load_table(spark, sf_dir, "documents"))
    g = LIDSTONE_GAMMA
    d = docs.select("doc_id", "source", F.split("text", " ").alias("words"))
    bi = (
        d.select(
            "doc_id", "source",
            F.posexplode(F.arrays_zip(
                F.slice("words", 1, F.size("words") - 1),
                F.slice("words", 2, F.size("words") - 1)))
             .alias("pos0", "z"))
        .select("doc_id", "source",
                (F.col("pos0") + 1).alias("pos"),
                F.col("z")["0"].alias("w1"),
                F.col("z")["1"].alias("w2"))
    )
    tok = (d.select("doc_id", "source",
                    F.posexplode("words").alias("pos0", "word"))
           .select("doc_id", "source", "word"))
    # The repeated count-table references need no pins: each table
    # ends in an EXCHANGE (its count shuffle), and AQE's runtime
    # ReusedExchange dedups identical exchanges across consumers — a
    # localCheckpoint here was measured 13% SLOWER (eager pin jobs
    # serialize what one DAG runs concurrently). Contrast fourgram,
    # where the four per-order groupBys have DIFFERENT keys (no
    # identical exchange to reuse) and a structural single pass wins.
    c2 = (bi.groupBy(F.col("source").alias("model_source"), "w1", "w2")
            .agg(F.count(F.lit(1)).alias("cnt2")))
    c1 = (c2.groupBy("model_source", "w1")
            .agg(F.sum("cnt2").cast("long").alias("cnt1")))
    cu = (tok.groupBy(F.col("source").alias("model_source"), "word")
             .agg(F.count(F.lit(1)).alias("cntu")))
    tot = (cu.groupBy("model_source")
             .agg(F.sum("cntu").cast("long").alias("total"),
                  F.count(F.lit(1)).cast("long").alias("vsz")))
    models = tot.select("model_source")
    pairs = bi.select("doc_id", "pos", "w1", "w2").crossJoin(
        F.broadcast(models))
    scored = (
        pairs
        .join(c2, ["model_source", "w1", "w2"], "left")
        .join(c1, ["model_source", "w1"], "left")
        .join(cu.withColumnRenamed("word", "w2"),
              ["model_source", "w2"], "left")
        .join(F.broadcast(tot), ["model_source"])
        .select(
            "doc_id", "model_source",
            F.when(F.col("cnt2").isNotNull(),
                   F.round(F.log10((F.col("cnt2").cast("double") + g)
                                   / (F.col("cnt1") + g * F.col("vsz"))), 9))
             .when(F.col("cntu").isNotNull(),
                   F.round(F.log10(F.lit(0.4) * (F.col("cntu") + g)
                                   / (F.col("total")
                                      + g * F.col("vsz"))), 9))
             .otherwise(
                 F.round(F.log10(F.lit(g) / (F.col("total")
                                             + g * F.col("vsz"))), 9))
             .alias("logp"))
    )
    return (scored.groupBy("doc_id", "model_source")
            .agg(spark_round_ratio(
                    "sum(cast(round(logp * 1e9, 0) as bigint))",
                    "count(1)", 6, n_prescale=9).alias("avg_logprob"),
                 F.count(F.lit(1)).alias("n_ngrams")))


KN_DISCOUNT = 0.75    # binary-exact; the standard KN discount


@register(
    "kneser_ney_model_score",
    oracle=f"""
    WITH tok AS (
      SELECT d.doc_id, d.source,
             unnest(string_split(d.text, ' '))                 AS word,
             generate_subscripts(string_split(d.text, ' '), 1) AS pos
      FROM documents d
    ),
    bi AS (
      SELECT t1.doc_id, t1.source, t1.pos, t1.word AS w1, t2.word AS w2
      FROM tok t1
      JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
    ),
    c2 AS (
      SELECT source AS model_source, w1, w2, COUNT(*) AS cnt2
      FROM bi GROUP BY source, w1, w2
    ),
    c1 AS (
      SELECT model_source, w1,
             CAST(SUM(cnt2) AS BIGINT) AS cnt1,
             CAST(COUNT(*) AS BIGINT) AS n1fwd
      FROM c2 GROUP BY model_source, w1
    ),
    cont AS (
      SELECT model_source, w2, CAST(COUNT(*) AS BIGINT) AS n1bwd
      FROM c2 GROUP BY model_source, w2
    ),
    npairs AS (
      SELECT model_source, CAST(COUNT(*) AS BIGINT) AS np
      FROM c2 GROUP BY model_source
    ),
    pairs AS (
      SELECT b.doc_id, m.model_source, b.pos, b.w1, b.w2
      FROM bi b CROSS JOIN (SELECT model_source FROM npairs) m
    ),
    scored AS (
      SELECT p.doc_id, p.model_source,
             CASE
               WHEN c2.cnt2 IS NOT NULL
                 THEN ROUND(LOG10(
                   ((CAST(c2.cnt2 AS DOUBLE) - {KN_DISCOUNT}) / c1.cnt1)
                   + (({KN_DISCOUNT} * c1.n1fwd / c1.cnt1)
                      * (CAST(ct.n1bwd AS DOUBLE) / n.np))), 9)
               WHEN c1.cnt1 IS NOT NULL AND ct.n1bwd IS NOT NULL
                 THEN ROUND(LOG10(
                   ({KN_DISCOUNT} * c1.n1fwd / c1.cnt1)
                   * (CAST(ct.n1bwd AS DOUBLE) / n.np)), 9)
               WHEN ct.n1bwd IS NOT NULL
                 THEN ROUND(LOG10(CAST(ct.n1bwd AS DOUBLE) / n.np), 9)
               ELSE CAST(-7.0 AS DOUBLE)
             END AS logp
      FROM pairs p
      LEFT JOIN c2 ON c2.model_source = p.model_source
                  AND c2.w1 = p.w1 AND c2.w2 = p.w2
      LEFT JOIN c1 ON c1.model_source = p.model_source AND c1.w1 = p.w1
      LEFT JOIN cont ct ON ct.model_source = p.model_source
                       AND ct.w2 = p.w2
      JOIN npairs n ON n.model_source = p.model_source
    )
    SELECT doc_id, model_source,
           (CAST((CASE WHEN (SUM(CAST(ROUND(logp * 1e9, 0) AS BIGINT))) < 0 THEN -1 ELSE 1 END) * ((2 * abs(CAST((SUM(CAST(ROUND(logp * 1e9, 0) AS BIGINT))) AS BIGINT)) * 1 + (COUNT(*)) * 1000) // (2 * (COUNT(*)) * 1000)) AS DOUBLE) / 1000000) AS avg_logprob,
           COUNT(*)                                     AS n_ngrams
    FROM scored
    GROUP BY doc_id, model_source
    """,
    tags=("W2", "F1", "smoothing"),
)
def kneser_ney_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    headline NLTK smoothing the reference's pickled LMs may carry,
    `client/async_processing_client.py:177-179`) — completing the
    smoothing-parity trio (MLE+stupid-backoff, Lidstone, KN):

        P(w2|w1) = (c(w1,w2) - D)/c(w1.) + lam(w1) * Pcont(w2)
        lam(w1)  = D * N1+(w1.)/c(w1.)
        Pcont(w2)= N1+(.w2) / N1+(..)

    with D = {KN_DISCOUNT}. Seen-context/unseen-pair rows take the
    interpolation mass alone; an unseen context falls back to the
    continuation probability (KN's signature: 'how many contexts does
    w2 follow', not 'how often'); a never-seen w2 floors at -7.

    Every count is one more aggregate over the SAME c2 frame the MLE
    scorer builds — N1+(w1.) rides along in c1, N1+(.w2) and
    N1+(..) are two vocab-bounded aggregates — so the plan shape (and
    its 100 TB story) is unchanged from ngram_model_score: broadcast
    count tables, pair matrix never on the driver, exact
    scaled-integer averaging. Both engines build the log10 argument
    with the same parenthesization, so the 9dp rounding sees
    identical doubles."""
    docs = fanout(load_table(spark, sf_dir, "documents"))
    dd = KN_DISCOUNT
    d = docs.select("doc_id", "source", F.split("text", " ").alias("words"))
    bi = (
        d.select(
            "doc_id", "source",
            F.posexplode(F.arrays_zip(
                F.slice("words", 1, F.size("words") - 1),
                F.slice("words", 2, F.size("words") - 1)))
             .alias("pos0", "z"))
        .select("doc_id", "source",
                (F.col("pos0") + 1).alias("pos"),
                F.col("z")["0"].alias("w1"),
                F.col("z")["1"].alias("w2"))
    )
    # no pin on c2: it ends in its count-shuffle exchange, which AQE's
    # ReusedExchange dedups across c1/cont/npairs/join at runtime
    c2 = (bi.groupBy(F.col("source").alias("model_source"), "w1", "w2")
            .agg(F.count(F.lit(1)).alias("cnt2")))
    c1 = (c2.groupBy("model_source", "w1")
            .agg(F.sum("cnt2").cast("long").alias("cnt1"),
                 F.count(F.lit(1)).cast("long").alias("n1fwd")))
    cont = (c2.groupBy("model_source", F.col("w2"))
            .agg(F.count(F.lit(1)).cast("long").alias("n1bwd")))
    npairs = (c2.groupBy("model_source")
              .agg(F.count(F.lit(1)).cast("long").alias("np")))
    models = npairs.select("model_source")
    pairs = bi.select("doc_id", "pos", "w1", "w2").crossJoin(
        F.broadcast(models))
    interp = ((F.lit(dd) * F.col("n1fwd") / F.col("cnt1"))
              * (F.col("n1bwd").cast("double") / F.col("np")))
    scored = (
        pairs
        .join(c2, ["model_source", "w1", "w2"], "left")
        .join(c1, ["model_source", "w1"], "left")
        .join(cont, ["model_source", "w2"], "left")
        .join(F.broadcast(npairs), ["model_source"])
        .select(
            "doc_id", "model_source",
            F.when(F.col("cnt2").isNotNull(),
                   F.round(F.log10(
                       ((F.col("cnt2").cast("double") - dd)
                        / F.col("cnt1")) + interp), 9))
             .when(F.col("cnt1").isNotNull()
                   & F.col("n1bwd").isNotNull(),
                   F.round(F.log10(interp), 9))
             .when(F.col("n1bwd").isNotNull(),
                   F.round(F.log10(F.col("n1bwd").cast("double")
                                   / F.col("np")), 9))
             .otherwise(F.lit(-7.0))
             .alias("logp"))
    )
    return (scored.groupBy("doc_id", "model_source")
            .agg(spark_round_ratio(
                    "sum(cast(round(logp * 1e9, 0) as bigint))",
                    "count(1)", 6, n_prescale=9).alias("avg_logprob"),
                 F.count(F.lit(1)).alias("n_ngrams")))


@register(
    "ordered_transcript_concat",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' '))                 AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    rebuilt AS (
      SELECT doc_id,
             STRING_AGG(word, ' ' ORDER BY pos) AS rebuilt_text,
             COUNT(*)                           AS n_words
      FROM tok GROUP BY doc_id
    )
    SELECT r.doc_id, r.n_words,
           (r.rebuilt_text = d.text) AS matches
    FROM rebuilt r JOIN documents d ON d.doc_id = r.doc_id
    """,
    tags=("A9", "O1"),
)
def ordered_transcript_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — transcript assembly
    (reference `client/async_processing_client.py:251-260`). The
    order-preservation contract through shuffles:
    `array_sort(collect_list(struct(pos, word)))`, never bare
    collect_list (SURVEY §7.3)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs
           .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
           # shuffle-randomizing repartition proves the sort contract
           .repartition("doc_id"))
    rebuilt = (
        tok.groupBy("doc_id")
        .agg(
            F.expr("concat_ws(' ', transform(array_sort(collect_list("
                   "struct(pos0, word))), s -> s.word))").alias("rebuilt_text"),
            F.count(F.lit(1)).alias("n_words"))
    )
    return (rebuilt.join(docs, "doc_id")
            .select("doc_id", "n_words",
                    (F.col("rebuilt_text") == F.col("text")).alias("matches")))


@register(
    "word_window_chunks",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS wc
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, words, wc,
             unnest(generate_series(0, CAST(FLOOR((wc - 1) / 40) AS BIGINT)))
               AS chunk_index
      FROM d
    )
    SELECT doc_id, chunk_index,
           chunk_index * 40 + 1                            AS chunk_start_word,
           LEAST(CAST(50 AS BIGINT), wc - (chunk_index * 40 + 1) + 1) AS token_count,
           array_to_string(
             list_slice(words, chunk_index * 40 + 1,
                        chunk_index * 40 + LEAST(CAST(50 AS BIGINT),
                                                 wc - (chunk_index * 40 + 1) + 1)),
             ' ')                                          AS chunk_text
    FROM chunks
    """,
    tags=("F9", "W7"),
)
def word_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-window chunker — 50-word chunks, 40-word stride (the
    reference's 200-word/40-overlap chunker,
    `embed_transcripts_8values.py:61-73`, scaled to the corpus) as
    `sequence()` + `slice()` array ops: a UDTF shape (1 doc -> N
    chunks) with zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    d = (docs.select("doc_id", F.split("text", " ").alias("words"))
         .withColumn("wc", F.size("words").cast("long")))
    chunks = d.select(
        "doc_id", "words", "wc",
        F.explode(F.expr("sequence(0, cast(floor((wc - 1) / 40) as long))"))
         .alias("chunk_index"))
    start = F.col("chunk_index") * 40 + 1
    tc = F.least(F.lit(50).cast("long"), F.col("wc") - start + 1)
    return chunks.select(
        "doc_id", "chunk_index",
        start.alias("chunk_start_word"),
        tc.alias("token_count"),
        F.array_join(F.slice("words", start.cast("int"), tc.cast("int")), " ")
         .alias("chunk_text"))


@register(
    "score_array_stats",
    oracle=f"""
    WITH {_TOK_CTE},
    {_RAW_CTE},
    arrs AS (
      SELECT doc_id, model_id,
             COUNT(*)                                        AS n_scores,
             COUNT(*) FILTER (WHERE raw >= CAST(0.5 AS DOUBLE)) AS n_high,
             ROUND(SUM(CASE WHEN pos <= 10 THEN raw END)
                   / LEAST(10, COUNT(*)), 6)                 AS head_mean,
             MAX(raw)                                        AS max_raw
      FROM raw
      GROUP BY doc_id, model_id
    )
    SELECT doc_id, model_id, n_scores, n_high, head_mean, max_raw
    FROM arrs WHERE n_scores > 0
    """,
    tags=("P3", "A10", "array"),
)
def score_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-function family over score arrays: size / filter /
    slice / aggregate higher-order functions + the real-score predicate
    P3 `size(score) > 0` (reference `sql/check_scoring.sql:31-33`)."""
    scored = _scored_documents(spark, sf_dir)
    return (
        scored.filter(F.size("raw") > 0)
        .select(
            "doc_id", "model_id",
            F.size("raw").cast("long").alias("n_scores"),
            F.size(F.expr("filter(raw, x -> x >= CAST(0.5 AS DOUBLE))"))
             .cast("long").alias("n_high"),
            F.round(
                F.expr("aggregate(slice(raw, 1, least(10, size(raw))), 0D,"
                       " (acc, x) -> acc + x)")
                / F.least(F.lit(10), F.size("raw")), 6).alias("head_mean"),
            F.array_max("raw").alias("max_raw"),
        )
    )


@register(
    "scoring_progress",
    oracle=f"""
    WITH {_TOK_CTE},
    {_RAW_CTE},
    pair AS (
      SELECT doc_id, model_id,
             COUNT(*) FILTER (WHERE raw >= CAST(0.5 AS DOUBLE)) AS n_high
      FROM raw GROUP BY doc_id, model_id
    ),
    stats AS (
      SELECT COUNT(*)                                AS total_pairs,
             COUNT(*) FILTER (WHERE n_high > 0)      AS scored_pairs
      FROM pair
    )
    SELECT total_pairs, scored_pairs,
           (CAST((CASE WHEN (100 * scored_pairs) < 0 THEN -1 ELSE 1 END) * ((2 * abs(CAST((100 * scored_pairs) AS BIGINT)) * 1000 + (total_pairs)) // (2 * (total_pairs))) AS DOUBLE) / 1000)
             AS pct_complete
    FROM stats
    """,
    tags=("A12", "A7"),
)
def scoring_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-progress dashboard aggregate (reference
    `server/dashboard.py:460-476`): scored pairs / expected work-matrix
    size as a percentage."""
    scored = _scored_documents(spark, sf_dir)
    pair = scored.select(
        "doc_id", "model_id",
        F.size(F.expr("filter(raw, x -> x >= CAST(0.5 AS DOUBLE))"))
         .alias("n_high"))
    stats = pair.agg(
        F.count(F.lit(1)).alias("total_pairs"),
        F.count(F.when(F.col("n_high") > 0, 1)).alias("scored_pairs"))
    return stats.select(
        "total_pairs", "scored_pairs",
        spark_round_ratio("100 * scored_pairs", "total_pairs", 3)
         .alias("pct_complete"))


_ISLANDS_ORACLE_BODY = f"""    WITH {_TOK_CTE},
    {_RAW_CTE},
    conv AS (
      SELECT r1.doc_id, r1.model_id, r1.pos, r1.raw,
             ROUND(SUM(r2.raw * kern.w), {isl.SMOOTH_ROUND}) AS conv
      FROM raw r1
      JOIN {_kernel_values_sql()} ON TRUE
      LEFT JOIN raw r2
        ON r2.doc_id = r1.doc_id AND r2.model_id = r1.model_id
       AND r2.pos = r1.pos + kern.off
      GROUP BY r1.doc_id, r1.model_id, r1.pos, r1.raw
    ),
    norm AS (
      SELECT doc_id, model_id, pos, raw,
             CASE WHEN MAX(conv) OVER (PARTITION BY doc_id, model_id) > 0
                  THEN ROUND(conv / MAX(conv) OVER (PARTITION BY doc_id, model_id),
                             {isl.SMOOTH_ROUND})
                  ELSE conv END AS sm
      FROM conv
    ),
    flagged AS (
      SELECT *,
             (pos - 1) - ROW_NUMBER() OVER (PARTITION BY doc_id, model_id
                                            ORDER BY pos) AS grp
      FROM norm WHERE sm >= CAST(0.6 AS DOUBLE)
    ),
    isl AS (
      SELECT doc_id, model_id,
             CAST(MIN(pos) - 1 AS BIGINT)       AS start_index,
             CAST(MAX(pos) - 1 AS BIGINT)       AS end_index,
             CAST(MIN(pos) AS BIGINT)           AS word_start,
             CAST(MAX(pos) + 3 AS BIGINT)       AS word_end,
             ROUND(AVG(raw), {isl.SCORE_ROUND}) AS average_score
      FROM flagged
      GROUP BY doc_id, model_id, grp
      HAVING MAX(pos) - MIN(pos) >= {isl.DEFAULT_MIN_ISLAND_LENGTH}
    ),
    seg AS (
      SELECT doc_id,
             CAST(FLOOR((pos - 1) / 10) AS BIGINT) AS seg_idx,
             COUNT(*)                              AS wc
      FROM tok GROUP BY doc_id, 2
    ),
    seg2 AS (
      SELECT doc_id,
             seg_idx * 10 + 1                    AS seg_start_word,
             seg_idx * 10 + wc                   AS seg_end_word,
             seg_idx * CAST(4.0 AS DOUBLE)       AS start_sec,
             CAST(4.0 AS DOUBLE)                 AS duration_sec
      FROM seg
    )
    SELECT i.doc_id, i.model_id, i.start_index, i.end_index,
           i.word_start, i.word_end,
           GREATEST(CAST(0 AS DOUBLE), MIN(s.start_sec) - 5) AS time_start_sec,
           MAX(s.start_sec + s.duration_sec) + 5              AS time_end_sec,
           i.average_score
    FROM isl i
    JOIN seg2 s ON s.doc_id = i.doc_id
               AND s.seg_end_word >= i.word_start
               AND s.seg_start_word <= i.word_end
    GROUP BY i.doc_id, i.model_id, i.start_index, i.end_index,
             i.word_start, i.word_end, i.average_score
"""


@register(
    "islands_analysis",
    oracle=f"""
    WITH islands_out AS (
      {_ISLANDS_ORACLE_BODY}
    ),
    per_doc AS (
      SELECT i.doc_id, i.model_id, d.source,
             COUNT(*)                                       AS n_islands,
             SUM(i.end_index - i.start_index + 1)           AS words_covered
      FROM islands_out i JOIN documents d ON d.doc_id = i.doc_id
      GROUP BY i.doc_id, i.model_id, d.source
    )
    SELECT model_id, source,
           CAST(SUM(n_islands) AS BIGINT)            AS total_islands,
           COUNT(*)                                  AS docs_with_islands,
           (CAST((CASE WHEN (SUM(n_islands)) < 0 THEN -1 ELSE 1 END) * ((2 * abs(CAST((SUM(n_islands)) AS BIGINT)) * 1000000 + (COUNT(*))) // (2 * (COUNT(*)))) AS DOUBLE) / 1000000)  AS avg_islands_per_doc,
           (CAST((CASE WHEN (SUM(words_covered)) < 0 THEN -1 ELSE 1 END) * ((2 * abs(CAST((SUM(words_covered)) AS BIGINT)) * 1000000 + (SUM(n_islands))) // (2 * (SUM(n_islands)))) AS DOUBLE) / 1000000) AS avg_island_len,
           CAST(MAX(n_islands) AS BIGINT)            AS max_islands_in_doc
    FROM per_doc
    GROUP BY model_id, source
    """,
    tags=("WS5", "A5", "A7"),
)
def islands_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Islands analysis rollup — the reference's WS5 roadmap product
    (`ROADMAP.md:68-73`: island counts, length distributions,
    per-channel island density) over the flagship output, grouped by
    (model, source-as-channel)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    isl_out = islands_flagship(spark, sf_dir)
    per_doc = (
        isl_out.join(docs, "doc_id")
        .groupBy("doc_id", "model_id", "source")
        .agg(F.count(F.lit(1)).alias("n_islands"),
             F.sum(F.col("end_index") - F.col("start_index") + 1)
              .alias("words_covered")))
    return (per_doc.groupBy("model_id", "source")
            .agg(F.sum("n_islands").cast("long").alias("total_islands"),
                 F.count(F.lit(1)).alias("docs_with_islands"),
                 spark_round_ratio("sum(n_islands)", "count(1)", 6)
                  .alias("avg_islands_per_doc"),
                 spark_round_ratio("sum(words_covered)", "sum(n_islands)", 6)
                  .alias("avg_island_len"),
                 F.max("n_islands").cast("long").alias("max_islands_in_doc")))


@register(
    "fourgram_model_score",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             ['<s>', '<s>', '<s>'] || string_split(text, ' ') AS padded,
             CAST(len(string_split(text, ' ')) AS BIGINT)     AS nw
      FROM documents
    ),
    grams AS (
      SELECT doc_id, i,
             array_to_string(padded[i + 1:i + 4], ' ') AS k4,
             array_to_string(padded[i + 2:i + 4], ' ') AS k3,
             array_to_string(padded[i + 3:i + 4], ' ') AS k2,
             padded[i + 4]                             AS k1
      FROM (SELECT doc_id, padded,
                   unnest(generate_series(0, nw - 1)) AS i
            FROM d)
    ),
    c4 AS (SELECT k4 AS g, COUNT(*) AS c FROM grams GROUP BY k4),
    c3 AS (SELECT k3 AS g, COUNT(*) AS c FROM grams GROUP BY k3),
    c2 AS (SELECT k2 AS g, COUNT(*) AS c FROM grams GROUP BY k2),
    c1 AS (SELECT k1 AS g, COUNT(*) AS c FROM grams GROUP BY k1),
    d4 AS (SELECT REGEXP_REPLACE(g, ' [^ ]*$', '') AS p, SUM(c) AS dc
           FROM c4 GROUP BY 1),
    d3 AS (SELECT REGEXP_REPLACE(g, ' [^ ]*$', '') AS p, SUM(c) AS dc
           FROM c3 GROUP BY 1),
    d2 AS (SELECT REGEXP_REPLACE(g, ' [^ ]*$', '') AS p, SUM(c) AS dc
           FROM c2 GROUP BY 1),
    tot AS (SELECT SUM(c) AS t FROM c1),
    lp4 AS (SELECT c4.g,
                   ROUND(LOG10(CAST(c4.c AS DOUBLE) / d4.dc), 9) AS lp
            FROM c4 JOIN d4 ON d4.p = REGEXP_REPLACE(c4.g, ' [^ ]*$', '')),
    lp3 AS (SELECT c3.g,
                   ROUND(LOG10(CAST(c3.c AS DOUBLE) / d3.dc), 9) AS lp
            FROM c3 JOIN d3 ON d3.p = REGEXP_REPLACE(c3.g, ' [^ ]*$', '')),
    lp2 AS (SELECT c2.g,
                   ROUND(LOG10(CAST(c2.c AS DOUBLE) / d2.dc), 9) AS lp
            FROM c2 JOIN d2 ON d2.p = REGEXP_REPLACE(c2.g, ' [^ ]*$', '')),
    lp1 AS (SELECT c1.g,
                   ROUND(LOG10(CAST(c1.c AS DOUBLE) / t.t), 9) AS lp
            FROM c1 CROSS JOIN tot t),
    pen AS (SELECT LOG10(CAST(0.4 AS DOUBLE))                    AS p1,
                   LOG10(CAST(0.4 AS DOUBLE)) + LOG10(CAST(0.4 AS DOUBLE)) AS p2,
                   LOG10(CAST(0.4 AS DOUBLE)) + LOG10(CAST(0.4 AS DOUBLE))
                     + LOG10(CAST(0.4 AS DOUBLE))                AS p3),
    scored AS (
      SELECT g.doc_id,
             COALESCE(ROUND(l4.lp, 9),
                      ROUND(l3.lp + pen.p1, 9),
                      ROUND(l2.lp + pen.p2, 9),
                      ROUND(l1.lp + pen.p3, 9),
                      CAST(-7.0 AS DOUBLE)) AS s
      FROM grams g
      LEFT JOIN lp4 l4 ON l4.g = g.k4
      LEFT JOIN lp3 l3 ON l3.g = g.k3
      LEFT JOIN lp2 l2 ON l2.g = g.k2
      LEFT JOIN lp1 l1 ON l1.g = g.k1
      CROSS JOIN pen
    )
    SELECT doc_id,
           (CAST((CASE WHEN (SUM(CAST(ROUND(s * 1e9, 0) AS BIGINT))) < 0 THEN -1 ELSE 1 END) * ((2 * abs(CAST((SUM(CAST(ROUND(s * 1e9, 0) AS BIGINT))) AS BIGINT)) * 1 + (COUNT(*)) * 1000) // (2 * (COUNT(*)) * 1000)) AS DOUBLE) / 1000000) AS avg_logprob,
           COUNT(*)                                     AS n_scored
    FROM scored GROUP BY doc_id
    """,
    tags=("W1", "W2", "F1", "F2"),
)
def fourgram_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's EXACT scoring contract at n=4 (`<s>`x3 padding,
    MLE counts over all orders, stupid-backoff 0.4, floor -7;
    `client/async_processing_client.py:50,163-179` + SURVEY §7.3
    contract), with the model TRAINED IN-QUERY as DataFrames — the
    fully-distributed form of §7.4 Option A: count tables never touch
    the driver, scoring is joins on gram keys.

    Cross-validated three ways: this Spark plan == the DuckDB oracle
    == the Python NGramModel (tests/test_transcript_pipeline.py)."""
    docs = fanout(load_table(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        F.expr("concat(array_repeat('<s>', 3), split(text, ' '))").alias("padded"),
        F.expr("size(split(text, ' '))").alias("nw"))
    grams = d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(0, nw - 1), i -> struct("
            " concat_ws(' ', slice(padded, i + 1, 4)) as k4,"
            " concat_ws(' ', slice(padded, i + 2, 3)) as k3,"
            " concat_ws(' ', slice(padded, i + 3, 2)) as k2,"
            " element_at(padded, i + 4) as k1))")).alias("z")
    ).select("doc_id", "z.*")

    # ALL four count tables from ONE corpus pass: each gram row
    # explodes into its (order, key) pairs, one grouped count covers
    # every order, and the result — the model, |gram types| rows — is
    # PINNED. Unpinned per-order groupBys re-derived the corpus
    # explode per reference (9 documents scans measured in the full
    # plan; 2 with this: the pin pass + the scoring pass).
    counts_all = (
        grams.select(F.explode(F.expr(
            "array(struct(4 as n, k4 as g), struct(3 as n, k3 as g), "
            "struct(2 as n, k2 as g), struct(1 as n, k1 as g))")).alias("z"))
        .groupBy(F.col("z.n").alias("n"), F.col("z.g").alias("g"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True))

    def counts(n: int):
        return counts_all.filter(F.col("n") == n).select("g", "c")

    prefix = lambda c: F.regexp_replace(c, r" [^ ]*$", "")
    c4, c3, c2, c1 = counts(4), counts(3), counts(2), counts(1)

    def lp_table(ck):
        dk = (ck.groupBy(prefix(F.col("g")).alias("p"))
              .agg(F.sum("c").alias("dc")))
        return (ck.join(dk, prefix(ck["g"]) == dk["p"])
                .select("g", F.round(F.log10(F.col("c").cast("double")
                                             / F.col("dc")), 9).alias("lp")))

    tot = c1.agg(F.sum("c").alias("t"))
    lp4, lp3, lp2 = lp_table(c4), lp_table(c3), lp_table(c2)
    lp1 = (c1.crossJoin(F.broadcast(tot))
           .select("g", F.round(F.log10(F.col("c").cast("double")
                                        / F.col("t")), 9).alias("lp")))
    import math
    p1 = math.log10(0.4)
    p2 = p1 + math.log10(0.4)
    p3 = p2 + math.log10(0.4)
    j = (grams
         .join(lp4.withColumnRenamed("g", "k4").withColumnRenamed("lp", "l4"),
               "k4", "left")
         .join(lp3.withColumnRenamed("g", "k3").withColumnRenamed("lp", "l3"),
               "k3", "left")
         .join(lp2.withColumnRenamed("g", "k2").withColumnRenamed("lp", "l2"),
               "k2", "left")
         .join(lp1.withColumnRenamed("g", "k1").withColumnRenamed("lp", "l1"),
               "k1", "left"))
    s = F.coalesce(
        F.round(F.col("l4"), 9),
        F.round(F.col("l3") + F.lit(p1), 9),
        F.round(F.col("l2") + F.lit(p2), 9),
        F.round(F.col("l1") + F.lit(p3), 9),
        F.lit(-7.0))
    return (j.select("doc_id", s.alias("s"))
            .groupBy("doc_id")
            .agg(spark_round_ratio(
                    "sum(cast(round(s * 1e9, 0) as bigint))",
                    "count(1)", 6, n_prescale=9).alias("avg_logprob"),
                 F.count(F.lit(1)).alias("n_scored")))


# --- island audit & tuning (reference ROADMAP Workstream 2, r8) -----------
#
# The reference's roadmap calls the island audit tool the gate for
# everything else ("precision QA — gates everything",
# ROADMAP.md Workstream 2): sample islands for human review, and tune
# smoothing/min-length/threshold against the judged precision. The
# Spark-side halves of that loop are both registered queries; the
# human-judgment persistence + precision report live in the engine
# facade (api.record_island_judgments / island_precision_report).

ISLAND_SWEEP_CONFIGS = [(0.5, 6), (0.6, 8), (0.7, 10), (0.8, 12)]
AUDIT_SAMPLE_N = 25
_AUDIT_HASH = 2654435761   # Knuth multiplicative constant
_AUDIT_MOD = 1_000_000_007


def _sweep_config_sql(i: int, t: float, m: int) -> str:
    from transcript_analysis_spark.functions.rounding import duck_round_ratio
    return f"""
    f{i} AS (
      SELECT doc_id, model_id, pos, raw,
             (pos - 1) - ROW_NUMBER() OVER (PARTITION BY doc_id, model_id
                                            ORDER BY pos) AS grp
      FROM norm WHERE sm >= CAST({t!r} AS DOUBLE)
    ),
    i{i} AS (
      SELECT doc_id, model_id,
             CAST(MIN(pos) - 1 AS BIGINT)       AS s,
             CAST(MAX(pos) - 1 AS BIGINT)       AS e,
             ROUND(AVG(raw), {isl.SCORE_ROUND}) AS a
      FROM f{i} GROUP BY doc_id, model_id, grp
      HAVING MAX(pos) - MIN(pos) >= {m}
    ),
    a{i} AS (
      SELECT CAST({t!r} AS DOUBLE) AS threshold,
             CAST({m} AS BIGINT)   AS min_len,
             CAST(COUNT(*) AS BIGINT) AS n_islands,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COALESCE(SUM(e - s + 1), 0) AS BIGINT) AS total_span,
             CASE WHEN COUNT(*) = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE {duck_round_ratio('SUM(e - s + 1)', 'COUNT(*)', 4)}
             END AS avg_len,
             CAST(COALESCE(SUM(CAST(ROUND(a * 1000000) AS BIGINT)), 0)
                  AS BIGINT) AS score_e6_sum
      FROM i{i}
    )"""


def sweep_islands_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-labeled island rows for EVERY sweep config from ONE
    scan of one pinned smoothing pass
    (`operators.islands.find_islands_multi`) — the common scaffold of
    `island_param_sensitivity` (per-config aggregates) and the
    judgments-aware facade `recommend_island_threshold` (per-config
    judged precision). See `island_param_sensitivity`'s docstring for
    why the shared frame is checkpointed."""
    scored = isl.smooth_scores(_scored_documents(spark, sf_dir),
                               score_col="raw", out_col="smoothed") \
        .localCheckpoint(eager=True)
    return isl.find_islands_multi(scored, keys=["doc_id", "model_id"],
                                  configs=ISLAND_SWEEP_CONFIGS,
                                  score_col="raw",
                                  smoothed_col="smoothed")


def sweep_configs_dim(spark: SparkSession) -> DataFrame:
    """The |configs|-row dimension frame. Aggregating the exploded
    island rows drops configs that produced zero islands; the sweep
    table left-joins from this dim so every config always emits its
    row (zero-filled), exactly like the oracle's per-config CTEs."""
    return spark.createDataFrame(
        [(float(t), int(m)) for t, m in ISLAND_SWEEP_CONFIGS],
        "threshold double, min_len bigint")


def sweep_table_from_islands(spark: SparkSession,
                             islands_multi: DataFrame) -> DataFrame:
    """The |configs|-row sensitivity table from the config-labeled
    island frame: ONE grouped aggregate over all configs at once
    (the old shape was |configs| single-row aggregates unioned, each
    re-scanning the smoothing checkpoint). Factored out so
    `recommend_island_threshold` can reuse the SAME island frame
    (hence the same single smoothing pass) for both the sweep
    aggregates and the judgment matching."""
    agg = (islands_multi
           .groupBy("threshold", "min_len")
           .agg(F.count(F.lit(1)).cast("long").alias("n_islands"),
                F.countDistinct("doc_id").cast("long").alias("n_docs"),
                F.sum(F.col("end_index") - F.col("start_index") + 1)
                 .cast("long").alias("total_span"),
                spark_round_ratio("sum(end_index - start_index + 1)",
                                  "count(1)", 4).alias("avg_len"),
                F.sum(F.expr("cast(round(average_score * 1000000) "
                             "as bigint)"))
                 .cast("long").alias("score_e6_sum")))
    dim = sweep_configs_dim(spark)
    return (dim.join(agg, ["threshold", "min_len"], "left")
            .select("threshold", "min_len",
                    F.coalesce("n_islands", F.lit(0)).cast("long")
                     .alias("n_islands"),
                    F.coalesce("n_docs", F.lit(0)).cast("long")
                     .alias("n_docs"),
                    F.coalesce("total_span", F.lit(0)).cast("long")
                     .alias("total_span"),
                    F.coalesce("avg_len", F.lit(0.0)).alias("avg_len"),
                    F.coalesce("score_e6_sum", F.lit(0)).cast("long")
                     .alias("score_e6_sum")))


def _register_island_sweep() -> None:
    parts = [f"WITH {_TOK_CTE},\n{_RAW_CTE},\n{_norm_ctes(materialized=True)}"]
    for i, (t, m) in enumerate(ISLAND_SWEEP_CONFIGS):
        parts.append(_sweep_config_sql(i, t, m))
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM a{i}" for i in range(len(ISLAND_SWEEP_CONFIGS)))

    @register(
        "island_param_sensitivity",
        oracle=",".join(parts) + "\n" + union,
        headline=True,
        tags=("islands", "tuning", "report"),
    )
    def island_param_sensitivity(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
        """Threshold/min-length sensitivity sweep of the flagship
        islands product — the tuning table the reference's roadmap
        wants behind its audit tool ("tune smoothing window / min
        length / score threshold", ROADMAP.md Workstream 2): per
        config, island count, docs covered, span total, mean length,
        and the exact 1e6-quantized sum of island scores.

        One smoothing pass AND one scan serve every config: the
        smoothed frame is pinned (localCheckpoint — exchange reuse
        across plan branches is not guaranteed, measured −21% at
        sf0.1), and the array-domain segmentation computes every
        config's islands per ROW (`find_islands_multi`), so the whole
        sweep is one checkpoint scan + one grouped aggregate — not
        |configs| scans of a corpus-sized intermediate (the pre-r9
        shape: |configs| union branches, each re-reading the
        checkpoint). The oracle mirrors the sharing with a
        MATERIALIZED norm CTE. Output is |configs| rows — a
        driver-sized decision table."""
        return sweep_table_from_islands(
            spark, sweep_islands_multi(spark, sf_dir))


_register_island_sweep()

# Coverage floor for the data-only recommendation rule: a config must
# keep >= 50% of the widest config's island span to be eligible
# (quantized to e6 so the comparison runs in exact integers).
ISLAND_COVERAGE_FLOOR_E6 = 500_000


def recommendation_from_sweep(sweep: DataFrame) -> DataFrame:
    """Annotate a sweep table with coverage/mean-score and flag the
    recommended row — factored out so `recommend_island_threshold`
    can apply it to a sweep built from ALREADY-materialized config
    triples (one smoothing pass serving the sweep aggregates, the
    coverage annotation, AND the judgment matching) instead of
    re-running the corpus scan through the registered query."""
    from transcript_analysis_spark.functions.rounding import (
        spark_round_ratio_wide_q)

    # The annotation references the sweep subtree from several
    # branches (the table itself, the max-span compare, the best-key
    # agg); without a pin each branch re-derives the corpus-sized
    # sweep subtree — 4 checkpoint scans measured. The sweep table is
    # PROVABLY driver-sized (|configs| rows), so pinning it is free
    # and collapses the whole decision tail to one corpus pass.
    sweep = sweep.localCheckpoint(eager=True)
    ext = sweep.crossJoin(F.broadcast(
        sweep.agg(F.max("total_span").alias("max_span"))))
    cov = F.when(F.col("max_span") == 0, F.lit(0).cast("long")) \
        .otherwise(spark_round_ratio_wide_q("total_span",
                                            "max_span", 6))
    mean = F.when(F.col("n_islands") == 0, F.lit(0).cast("long")) \
        .otherwise(spark_round_ratio_wide_q("score_e6_sum",
                                            "n_islands", 0))
    annotated = ext.select(
        "threshold", "min_len", "n_islands", "n_docs", "total_span",
        "avg_len", "score_e6_sum", cov.alias("coverage_e6"),
        mean.alias("mean_score_e6"))
    # the pick: lexicographic max of (qualifies, mean score,
    # threshold, min_len) — struct ordering; keys are distinct
    # (threshold is), so exactly one row matches the max
    rank_key = F.struct(
        F.when(F.col("coverage_e6") >= ISLAND_COVERAGE_FLOOR_E6, 1)
         .otherwise(0).alias("q"),
        F.col("mean_score_e6").alias("m"),
        F.col("threshold").alias("t"),
        F.col("min_len").alias("l"))
    best = annotated.agg(F.max(rank_key).alias("best_key"))
    return (annotated.crossJoin(F.broadcast(best)).select(
        "threshold", "min_len", "n_islands", "n_docs", "total_span",
        "avg_len", "score_e6_sum",
        (F.col("coverage_e6").cast("double") / F.lit(1_000_000.0))
        .alias("coverage"),
        "mean_score_e6",
        (rank_key == F.col("best_key")).alias("recommended")))


def _register_island_recommendation() -> None:
    from transcript_analysis_spark.functions.rounding import (
        duck_round_ratio_wide_q)
    from transcript_analysis_spark.plans.registry import _REGISTRY

    inner = _REGISTRY["island_param_sensitivity"].oracle
    covq = duck_round_ratio_wide_q("total_span", "max_span", 6)
    meanq = duck_round_ratio_wide_q("score_e6_sum", "n_islands", 0)

    @register(
        "island_threshold_recommendation",
        oracle=f"""
        WITH sweep AS MATERIALIZED ({inner}),
        ext AS (
          SELECT *, MAX(total_span) OVER () AS max_span FROM sweep
        ),
        annotated AS (
          SELECT threshold, min_len, n_islands, n_docs, total_span,
                 avg_len, score_e6_sum,
                 CASE WHEN max_span = 0 THEN CAST(0 AS BIGINT)
                      ELSE {covq} END AS coverage_e6,
                 CASE WHEN n_islands = 0 THEN CAST(0 AS BIGINT)
                      ELSE {meanq} END AS mean_score_e6
          FROM ext
        )
        SELECT threshold, min_len, n_islands, n_docs, total_span,
               avg_len, score_e6_sum,
               CAST(coverage_e6 AS DOUBLE) / 1000000 AS coverage,
               mean_score_e6,
               (ROW_NUMBER() OVER (
                  ORDER BY CASE WHEN coverage_e6 >= {ISLAND_COVERAGE_FLOOR_E6}
                                THEN 1 ELSE 0 END DESC,
                           mean_score_e6 DESC, threshold DESC,
                           min_len DESC) = 1) AS recommended
        FROM annotated
        """,
        tags=("islands", "tuning", "decision"),
    )
    def island_threshold_recommendation(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
        """The decision the reference ROADMAP's Workstream 2 tuning
        loop exists to make ("tune smoothing window / min length /
        score threshold", ROADMAP.md:34-39,66): annotate every sweep
        config with its span coverage relative to the widest config
        and its mean island score (the engine's own confidence proxy),
        then flag exactly ONE row recommended — the highest-mean-score
        config among those keeping >= 50% of the widest span,
        strictest config on ties. All comparisons run on exact e6-
        quantized integers, so the pick is engine-deterministic.

        With human judgments recorded (api.record_island_judgments),
        `api.recommend_island_threshold` swaps the score proxy for
        JUDGED precision per config — this registered query is the
        oracle-checkable scaffold it decorates. Plan shape: the sweep
        (one shared smoothing pass, |configs| aggregates) + two
        broadcast single-row aggregates crossed back onto the
        |configs|-row frame (the repo's no-unpartitioned-window
        discipline: even a driver-sized global ordering is expressed
        as agg-max + broadcast compare, never a bare ordered
        window)."""
        return recommendation_from_sweep(
            _REGISTRY["island_param_sensitivity"].fn(spark, sf_dir))


_register_island_recommendation()

# Deterministic judgment fixture for the registered judged-precision
# pick: a pseudo-reviewed sample of the FLAGSHIP config's islands
# (every third by the audit hash), labeled real iff the island's mean
# score clears this bar. Emulates the shape api.record_island_judgments
# persists, from data both engines can derive. The bar sits at the
# corpus's MEDIAN island score (sf0.001 quartiles 0.35/0.39/0.44), so
# the fixture splits ~half real / half not and the per-config
# precision ratios actually discriminate — a bar above the max would
# make every n_real zero and the oracle blind to the precision math.
_JUDGED_FIXTURE_CONFIG = (isl.DEFAULT_THRESHOLD,
                          isl.DEFAULT_MIN_ISLAND_LENGTH)
_JUDGED_FIXTURE_REAL_BAR = 0.4


def judged_recommendation_from(spark: SparkSession,
                               islands_multi: DataFrame,
                               judgments: DataFrame) -> DataFrame:
    """Per-config JUDGED precision pick over a config-labeled island
    frame — the core of the reference ROADMAP Workstream-2 loop
    ("precision QA — gates everything", ROADMAP.md:34-39): each
    judgment, keyed on the island the reviewer actually saw, labels
    per config the island (same doc, model) whose span CONTAINS the
    judged island's start; per-config precision is the share of those
    labels that are is_real; the chosen config is the
    highest-precision one among those keeping >= 50% of the widest
    config's span, judged configs outranking unjudged, strictest on
    ties. Shared by the registered `island_judged_recommendation`
    (deterministic fixture judgments, oracle-checked) and
    `api.recommend_island_threshold` (judgments from the parquet
    store) so the two cannot drift.

    `judgments` columns: doc_id, model_id, j_start, is_real. ONE
    smoothing pass serves everything: the matching and the coverage
    annotation both read `islands_multi`'s shared checkpoint. The
    matching is ONE join carrying the config columns, not |configs|
    joins; the pick is a broadcast agg-max compare (the repo's
    no-unpartitioned-window discipline)."""
    f = islands_multi.alias("f")
    matched = f.join(
        judgments.alias("j"),
        (F.col("f.doc_id") == F.col("j.doc_id"))
        & (F.col("f.model_id") == F.col("j.model_id"))
        & (F.col("j.j_start") >= F.col("f.start_index"))
        & (F.col("j.j_start") <= F.col("f.end_index")))
    judged = matched.groupBy("threshold", "min_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_judged"),
        F.sum(F.when(F.col("is_real"), 1).otherwise(0))
         .cast("long").alias("n_real"))

    base = recommendation_from_sweep(
        sweep_table_from_islands(spark, islands_multi)).select(
        "threshold", "min_len", "coverage")
    # left join + zero-fill: a config judged nowhere must still
    # emit its row (the grouped aggregate has no row for it)
    full = base.join(judged, ["threshold", "min_len"], "left") \
        .withColumns({
            "n_judged": F.coalesce("n_judged", F.lit(0)).cast("long"),
            "n_real": F.coalesce("n_real", F.lit(0)).cast("long")})
    qualifies = (F.col("coverage")
                 >= ISLAND_COVERAGE_FLOOR_E6 / 1_000_000.0)
    prec = F.when(F.col("n_judged") == 0, F.lit(0.0)).otherwise(
        spark_round_ratio("n_real", "n_judged", 4))
    rank_key = F.struct(
        F.when(qualifies, 1).otherwise(0).alias("q"),
        F.when(F.col("n_judged") > 0, 1).otherwise(0).alias("j"),
        prec.alias("p"),
        F.col("threshold").alias("t"),
        F.col("min_len").alias("l"))
    best = full.agg(F.max(rank_key).alias("best_key"))
    return full.crossJoin(F.broadcast(best)).select(
        "threshold", "min_len", "coverage", "n_judged", "n_real",
        prec.alias("judged_precision"),
        (rank_key == F.col("best_key")).alias("chosen"))


def _register_island_judged_recommendation() -> None:
    from transcript_analysis_spark.functions.rounding import (
        duck_round_ratio, duck_round_ratio_wide_q)

    ft, fm = _JUDGED_FIXTURE_CONFIG
    parts = [f"WITH {_TOK_CTE},\n{_RAW_CTE},\n{_norm_ctes(materialized=True)}"]
    cfg_branches = []
    for i, (t, m) in enumerate(ISLAND_SWEEP_CONFIGS):
        # reuse only the f{i}/i{i} CTEs of the sweep scaffold (split
        # off the a{i} aggregate — the judged pick aggregates from the
        # materialized union instead, so each i{i} evaluates ONCE)
        parts.append(_sweep_config_sql(i, t, m).rsplit(",\n    a", 1)[0])
        cfg_branches.append(
            f"SELECT CAST({t!r} AS DOUBLE) AS threshold, "
            f"CAST({m} AS BIGINT) AS min_len, "
            f"doc_id, model_id, s, e, a FROM i{i}")
    dim_rows = ", ".join(
        f"(CAST({t!r} AS DOUBLE), CAST({m} AS BIGINT))"
        for t, m in ISLAND_SWEEP_CONFIGS)
    covq = duck_round_ratio_wide_q("total_span", "max_span", 6)
    precq = duck_round_ratio("n_real", "n_judged", 4)
    oracle = ",\n".join(parts) + f""",
    cfg AS MATERIALIZED (
      {" UNION ALL ".join(cfg_branches)}
    ),
    dim AS (SELECT * FROM (VALUES {dim_rows}) AS v(threshold, min_len)),
    agg AS (
      SELECT threshold, min_len,
             CAST(COALESCE(SUM(e - s + 1), 0) AS BIGINT) AS total_span
      FROM cfg GROUP BY threshold, min_len
    ),
    sweep AS (
      SELECT d.threshold, d.min_len,
             COALESCE(a.total_span, 0) AS total_span
      FROM dim d LEFT JOIN agg a
        ON a.threshold = d.threshold AND a.min_len = d.min_len
    ),
    ext AS (SELECT *, MAX(total_span) OVER () AS max_span FROM sweep),
    cov AS (
      SELECT threshold, min_len,
             CASE WHEN max_span = 0 THEN CAST(0 AS BIGINT)
                  ELSE {covq} END AS coverage_e6
      FROM ext
    ),
    judgments AS MATERIALIZED (
      SELECT doc_id, model_id, s AS j_start,
             (a >= CAST({_JUDGED_FIXTURE_REAL_BAR!r} AS DOUBLE)) AS is_real
      FROM cfg
      WHERE threshold = CAST({ft!r} AS DOUBLE) AND min_len = {fm}
        AND (doc_id * 31 + model_id * 7 + s) % 3 = 0
    ),
    matched AS (
      SELECT c.threshold, c.min_len, j.is_real
      FROM cfg c JOIN judgments j
        ON j.doc_id = c.doc_id AND j.model_id = c.model_id
       AND j.j_start >= c.s AND j.j_start <= c.e
    ),
    judged AS (
      SELECT threshold, min_len,
             CAST(COUNT(*) AS BIGINT) AS n_judged,
             CAST(SUM(CASE WHEN is_real THEN 1 ELSE 0 END) AS BIGINT)
               AS n_real
      FROM matched GROUP BY threshold, min_len
    ),
    fullt AS (
      SELECT v.threshold, v.min_len, v.coverage_e6,
             CAST(v.coverage_e6 AS DOUBLE) / 1000000 AS coverage,
             COALESCE(g.n_judged, CAST(0 AS BIGINT)) AS n_judged,
             COALESCE(g.n_real, CAST(0 AS BIGINT)) AS n_real
      FROM cov v LEFT JOIN judged g
        ON g.threshold = v.threshold AND g.min_len = v.min_len
    )
    SELECT threshold, min_len, coverage, n_judged, n_real,
           CASE WHEN n_judged = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE {precq} END AS judged_precision,
           (ROW_NUMBER() OVER (ORDER BY
              CASE WHEN coverage_e6 >= {ISLAND_COVERAGE_FLOOR_E6}
                   THEN 1 ELSE 0 END DESC,
              CASE WHEN n_judged > 0 THEN 1 ELSE 0 END DESC,
              CASE WHEN n_judged = 0 THEN CAST(0.0 AS DOUBLE)
                   ELSE {precq} END DESC,
              threshold DESC, min_len DESC) = 1) AS chosen
    FROM fullt
    """

    @register(
        "island_judged_recommendation",
        oracle=oracle,
        tags=("islands", "tuning", "decision"),
    )
    def island_judged_recommendation(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
        """The judged-precision half of the ROADMAP Workstream-2
        tuning loop as a registered, oracle-checked query (r9 verdict
        item 6): per sweep config, the precision of a deterministic
        judgment fixture (a pseudo-reviewed hash-sample of the
        flagship config's islands, real iff mean score >= the corpus-median bar)
        attributed by containing-island matching, with the same
        coverage floor and pick rule `api.recommend_island_threshold`
        applies to HUMAN judgments — the facade delegates to the same
        `judged_recommendation_from` core, so the driver hash-checking
        this query checks the facade's whole decision path except the
        parquet read. Output: |configs| rows, exactly one chosen."""
        im = sweep_islands_multi(spark, sf_dir)
        t, m = _JUDGED_FIXTURE_CONFIG
        fixture = (
            im.filter((F.col("threshold") == float(t))
                      & (F.col("min_len") == int(m)))
            .filter((F.col("doc_id") * 31 + F.col("model_id") * 7
                     + F.col("start_index")) % 3 == 0)
            .select("doc_id", "model_id",
                    F.col("start_index").alias("j_start"),
                    (F.col("average_score")
                     >= float(_JUDGED_FIXTURE_REAL_BAR))
                    .alias("is_real")))
        return judged_recommendation_from(spark, im, fixture)


_register_island_judged_recommendation()


@register(
    "island_audit_sample",
    oracle=f"""
    WITH isl_out AS (
      {_ISLANDS_ORACLE_BODY}
    ),
    d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    sampled AS (
      SELECT i.doc_id, i.model_id, i.start_index, i.end_index,
             i.word_start, i.word_end, i.average_score,
             array_to_string(
               d.words[CAST(i.word_start AS BIGINT):CAST(i.word_end AS BIGINT)],
               ' ') AS island_text,
             ((i.doc_id * 31 + i.model_id * 7 + i.start_index)
               % {_AUDIT_MOD}) * {_AUDIT_HASH} % {_AUDIT_MOD} AS hv
      FROM isl_out i JOIN d ON d.doc_id = i.doc_id
    )
    SELECT doc_id, model_id, start_index, end_index, word_start,
           word_end, island_text, average_score, hv
    FROM sampled
    ORDER BY hv, doc_id, model_id, start_index
    LIMIT {AUDIT_SAMPLE_N}
    """,
    tags=("islands", "audit", "sampling"),
)
def island_audit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reviewer sample for the island audit tool
    (ROADMAP.md Workstream 2: "pull N random islands, show each
    island's transcript span in context ... mark yes/no"): the
    flagship's islands, each joined back to its document to extract
    the island's word-span text, ranked by a content-keyed
    multiplicative hash (reproducible "random" — the same N islands
    every run, so judgments stay attached), top N taken.

    The hash reduces mod 1e9+7 BEFORE the Knuth multiply so the
    product stays far inside int64 at any corpus size. Plan shape:
    flagship plan + one doc_id equi-join + TakeOrderedAndProject —
    the sample never sorts more than the island table."""
    isl_out = islands_flagship(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words"))
    hv = (((F.col("doc_id") * 31 + F.col("model_id") * 7
            + F.col("start_index")) % _AUDIT_MOD)
          * _AUDIT_HASH % _AUDIT_MOD)
    joined = (isl_out.join(d, "doc_id")
              .select("doc_id", "model_id", "start_index", "end_index",
                      "word_start", "word_end",
                      F.array_join(F.expr(
                          "slice(words, cast(word_start as int), "
                          "cast(word_end - word_start + 1 as int))"),
                          " ").alias("island_text"),
                      "average_score", hv.alias("hv")))
    return (joined.orderBy("hv", "doc_id", "model_id", "start_index")
            .limit(AUDIT_SAMPLE_N))


@register(
    "island_length_histogram",
    oracle=f"""
    WITH isl_out AS (
      {_ISLANDS_ORACLE_BODY}
    ),
    len AS (
      SELECT model_id,
             CAST(end_index - start_index + 1 AS BIGINT) AS island_len
      FROM isl_out
    )
    SELECT model_id,
           CAST((island_len // 5) * 5 AS BIGINT) AS len_bucket,
           CAST(COUNT(*) AS BIGINT)              AS n_islands,
           CAST(MIN(island_len) AS BIGINT)       AS min_len,
           CAST(MAX(island_len) AS BIGINT)       AS max_len
    FROM len
    GROUP BY model_id, 2
    """,
    tags=("islands", "report", "A6"),
)
def island_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Island length distribution per model — the first chart of the
    reference ROADMAP's analysis workstream ("length distributions",
    Workstream 5): flagship island lengths in fixed 5-position
    buckets. Composed on the flagship (Spark frame AND oracle body),
    so the distribution cannot drift from the shipped islands; one
    grouped count over the island table — driver-sized output."""
    isl_out = islands_flagship(spark, sf_dir)
    ln = (F.col("end_index") - F.col("start_index") + 1)
    return (isl_out
            .select("model_id", ln.alias("island_len"))
            .groupBy("model_id",
                     ((F.col("island_len") / 5).cast("long") * 5)
                     .alias("len_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_islands"),
                 F.min("island_len").cast("long").alias("min_len"),
                 F.max("island_len").cast("long").alias("max_len")))
