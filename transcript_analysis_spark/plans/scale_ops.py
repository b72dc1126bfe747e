"""Scale-path operators: bloom-prefiltered decontamination, training
sequence packing, winsorized robust statistics, and Z-order locality.

These are the operations that change shape at 100 TB. Each one keeps
the portable-hash discipline of plans/data_pipeline.py — every hash or
bit trick is exact int64 arithmetic that Spark and DuckDB reproduce
bit-for-bit, so even the bloom filter's FALSE POSITIVES are
deterministic and oracle-checked.

Scale notes, per operator:

- ``bloom_prefilter_contamination``: the 100 TB decontamination
  pattern. The train-side shingle set is distilled into a 256 KB bit
  array (one aggregation), broadcast to every probe task, and the
  expensive shingle equi-join runs ONLY on bloom-positive shingles —
  the big eval side is never shuffled for shingles the filter rejects.
  A real cluster sizes m to the train-set cardinality; the FP rate
  here is plan-visible output (`n_false_positives`), not a hidden
  approximation.
- ``sequence_packing``: pretraining batch assembly (greedy next-fit
  document packing into fixed token-budget sequences). Sequential per
  stratum by construction — parallel ACROSS strata via grouped-map
  pandas; at 100 TB you sub-shard each language by doc_id range and
  pack shards independently (the budget invariant is shard-local).
- ``winsorized_order_stats``: robust aggregation via exact per-group
  percentile clipping. Exact percentile implies a per-group sort; the
  documented swap at scale is `approx_percentile` (t-digest), same
  plan shape, no sort.
- ``zorder_locality_stats``: the bit math behind Z-ordered (Morton
  curve) data layout. `sources/layout.py:zorder_write` uses the same
  expression to range-partition writes so file min/max stats prune on
  BOTH dimensions; this query makes the locality measurable (per
  Z-cell dimension spans are bounded by the cell size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.data_pipeline import (
    EVAL_SOURCES,
    MOD,
    _DUCK_SHINGLES,
    _spark_shingles,
    _t,
    duck_char_hash,
    spark_char_hash,
)
from transcript_analysis_spark.functions.rounding import (
    duck_round_ratio,
    duck_round_ratio_wide,
    duck_round_ratio_wide_q,
    spark_round_ratio,
    spark_round_ratio_wide,
    spark_round_ratio_wide_q,
)
from transcript_analysis_spark.sources.tables import fanout
from transcript_analysis_spark.plans.registry import register

# --- deterministic bloom filter parameters -------------------------------
# m = 2^21 bits stored as 65,536 32-bit words (in BIGINT lanes: no sign
# games, both engines agree on every shift). k = 4 hash functions
# derived from one polynomial char hash h: ((a*h + b) % MOD) % m.
# a*h < 11 * (1e9+7) — comfortably inside int64.
BLOOM_M_BITS = 1 << 21
BLOOM_WORD_BITS = 32
BLOOM_K_AB = ((3, 1), (5, 2), (7, 3), (11, 5))


def _spark_bloom_positions(h_col: str) -> list[str]:
    return [f"(({a} * {h_col} + {b}) % {MOD}) % {BLOOM_M_BITS}"
            for a, b in BLOOM_K_AB]


def bloom_hit_column(h_col: str = "h", map_col: str = "bm"):
    """All-k-bits-set probe of the single-row word->bits bloom map —
    shared by the batch prefilter and the streaming decontaminator
    (streaming/decontam.py)."""
    hit = None
    for p in _spark_bloom_positions(h_col):
        one = F.expr(
            f"(coalesce(element_at({map_col}, ({p}) div {BLOOM_WORD_BITS}), 0)"
            f" & shiftleft(cast(1 as bigint),"
            f" cast(({p}) % {BLOOM_WORD_BITS} as int))) != 0")
        hit = one if hit is None else (hit & one)
    return hit


def bloom_words(shingle_df: DataFrame) -> DataFrame:
    """(w, bits) bloom word table of a distinct-shingle frame — the
    persistable form of the filter (65,536 rows max)."""
    trh = shingle_df.select(F.expr(spark_char_hash("shingle")).alias("h"))
    pos = trh.select(F.explode(F.array(
        *[F.expr(p) for p in _spark_bloom_positions("h")])).alias("pos"))
    return (pos.groupBy(F.expr(f"pos div {BLOOM_WORD_BITS}").alias("w"))
            .agg(F.expr(
                f"bit_or(shiftleft(cast(1 as bigint),"
                f" cast(pos % {BLOOM_WORD_BITS} as int)))").alias("bits")))


@register(
    "bloom_prefilter_contamination",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    split AS (SELECT doc_id, source FROM documents),
    train_set AS (
      SELECT DISTINCT s.shingle
      FROM shingles s JOIN split d ON d.doc_id = s.doc_id
      WHERE d.source NOT IN {EVAL_SOURCES!r}
    ),
    trh AS (SELECT {duck_char_hash('shingle')} AS h FROM train_set),
    tpos AS (
      SELECT ((p.a * trh.h + p.b) % {MOD}) % {BLOOM_M_BITS} AS pos
      FROM trh CROSS JOIN (VALUES {", ".join(f"({a}, {b})" for a, b in BLOOM_K_AB)}) p(a, b)
    ),
    bwords AS (
      SELECT pos // {BLOOM_WORD_BITS} AS w,
             bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD_BITS} AS INT)) AS bits
      FROM tpos GROUP BY 1
    ),
    ev AS (
      SELECT s.doc_id, s.shingle, {duck_char_hash('s.shingle')} AS h
      FROM shingles s JOIN split d ON d.doc_id = s.doc_id
      WHERE d.source IN {EVAL_SOURCES!r}
    ),
    evpos AS (
      SELECT doc_id, shingle,
             {", ".join(f"(({a} * h + {b}) % {MOD}) % {BLOOM_M_BITS} AS p{i}"
                        for i, (a, b) in enumerate(BLOOM_K_AB))}
      FROM ev
    ),
    probe AS (
      SELECT e.doc_id, e.shingle,
             ({" AND ".join(
                 f"(COALESCE(w{i}.bits, 0) &"
                 f" (1::BIGINT << CAST(e.p{i} % {BLOOM_WORD_BITS} AS INT))) != 0"
                 for i in range(len(BLOOM_K_AB)))}) AS bloom_hit
      FROM evpos e
      {" ".join(f"LEFT JOIN bwords w{i} ON w{i}.w = e.p{i} // {BLOOM_WORD_BITS}"
                for i in range(len(BLOOM_K_AB)))}
    )
    SELECT p.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN p.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_candidates,
           CAST(SUM(CASE WHEN p.bloom_hit AND t.shingle IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           CAST(SUM(CASE WHEN p.bloom_hit AND t.shingle IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives
    FROM probe p LEFT JOIN train_set t ON t.shingle = p.shingle
    GROUP BY p.doc_id
    """,
    headline=True,
    tags=("decontamination", "bloom", "scale"),
)
def bloom_prefilter_contamination(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Decontamination with a broadcast bloom prefilter — the shape
    that survives 100 TB. Builds a 2^21-bit bloom filter over the
    train split's distinct shingles (ONE aggregation into 65,536
    32-bit words, materialized as a single-row map and broadcast),
    probes every eval shingle with per-row JVM bit math (zero shuffle
    on the probe side), and runs the exact shingle equi-join ONLY on
    bloom-positive shingles. Because the filter's hash functions are
    the same exact int64 polynomial math in both engines, the oracle
    reproduces the identical bit array — `n_false_positives` is
    checked exactly, not bounded.

    Contrast with `contamination_overlap` (plans/data_pipeline.py),
    which joins ALL eval shingles against the train set: same
    `n_overlap`, but the join input here is ~`n_candidates` instead of
    `n_shingles` — at real scale that's the difference between
    shuffling the corpus and shuffling a rounding error of it."""
    sh = _spark_shingles(spark, sf_dir)
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    is_eval = F.col("source").isin(*EVAL_SOURCES)

    # Materialize the train shingle set once: it feeds BOTH the bloom
    # bitmap build and the exact verify join, and without the
    # checkpoint each branch would re-scan and re-shingle the corpus
    # (the _spark_vocab pattern; at real scale persist(DISK_ONLY)).
    train = (sh.join(src.filter(~is_eval), "doc_id")
             .select("shingle").distinct().localCheckpoint(eager=True))
    bwords = bloom_words(train)
    bitmap = bwords.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "bits"))).alias("bm"))

    ev = (sh.join(src.filter(is_eval), "doc_id")
          .withColumn("h", F.expr(spark_char_hash("shingle"))))
    probe = ev.join(F.broadcast(bitmap))
    hit = bloom_hit_column("h", "bm")
    # Materialized once (eval-split shingles — decontamination eval
    # sets are small relative to the corpus): both output branches
    # read the checkpoint instead of re-running the probe pipeline.
    probe = (probe.select("doc_id", "shingle", hit.alias("bloom_hit"))
             .localCheckpoint(eager=True))

    # The scale shape the docstring promises: the exact equi-join
    # against the train set ships ONLY bloom-positive shingles — a
    # plain left join would carry every probe row through the shingle
    # shuffle just to preserve n_shingles. The negatives rejoin as
    # zero-marked 3-int rows through a union, so ALL per-doc totals
    # come out of ONE doc_id aggregate (r13: previously two aggregates
    # + a doc_id join; the union collapses map-side before the
    # shuffle, measured −5% min-of-5 at sf0.1 and one fewer stage).
    pos = (probe.filter("bloom_hit")
           .join(train.withColumn("in_train", F.lit(1)),
                 "shingle", "left")
           .select("doc_id", F.lit(1).alias("is_cand"),
                   F.coalesce("in_train", F.lit(0)).alias("in_train")))
    neg = (probe.filter(~F.col("bloom_hit"))
           .select("doc_id", F.lit(0).alias("is_cand"),
                   F.lit(0).alias("in_train")))
    return (pos.unionAll(neg)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum("is_cand").cast("long").alias("n_candidates"),
                 F.sum("in_train").cast("long").alias("n_overlap"))
            .select("doc_id", "n_shingles", "n_candidates", "n_overlap",
                    (F.col("n_candidates") - F.col("n_overlap"))
                    .cast("long").alias("n_false_positives")))


# --- sequence packing ----------------------------------------------------

PACK_BUDGET_TOKENS = 120

_PACK_SCHEMA = ("lang string, doc_id long, n_tokens long, "
                "seq_no long, seq_offset long")


def greedy_pack_pandas(pdf, seq_col: str = "seq_no"):
    """Grouped-map body shared by `sequence_packing` (seq_col=seq_no),
    `sequence_packing_sharded` (seq_col=seq_local), and the
    property-based differential test: walk the group in doc_id order,
    assigning greedy next-fit sequence numbers and in-sequence token
    offsets under PACK_BUDGET_TOKENS."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    seqs, offs = [], []
    seq, fill = 0, 0
    for t in pdf["n_tokens"]:
        t = int(t)
        if fill > 0 and fill + t > PACK_BUDGET_TOKENS:
            seq += 1
            fill = 0
        seqs.append(seq)
        offs.append(fill)
        fill += t
    pdf[seq_col] = pd.Series(seqs, dtype="int64")
    pdf["seq_offset"] = pd.Series(offs, dtype="int64")
    return pdf


@register(
    "sequence_packing",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk AS (
      SELECT lang, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS seq_no,
             CAST(0 AS BIGINT) AS seq_offset,
             n_tokens AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.lang, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN w.fill > 0 AND w.fill + d.n_tokens > {PACK_BUDGET_TOKENS}
                  THEN w.seq_no + 1 ELSE w.seq_no END,
             CASE WHEN w.fill > 0 AND w.fill + d.n_tokens > {PACK_BUDGET_TOKENS}
                  THEN CAST(0 AS BIGINT) ELSE w.fill END,
             CASE WHEN w.fill > 0 AND w.fill + d.n_tokens > {PACK_BUDGET_TOKENS}
                  THEN d.n_tokens ELSE w.fill + d.n_tokens END
      FROM walk w JOIN d ON d.lang = w.lang AND d.rn = w.rn + 1
    )
    SELECT lang, doc_id, n_tokens, seq_no, seq_offset FROM walk
    """,
    tags=("packing", "training-prep", "scale"),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit sequence packing: walk each language stratum in
    doc_id order, appending documents to the current training sequence
    until the {PACK_BUDGET_TOKENS}-token budget would overflow, then
    start a new sequence (an oversized document gets a sequence of its
    own). Emits per-document (seq_no, seq_offset) — the assembly step
    that turns a filtered corpus into fixed-length pretraining rows.

    Packing is inherently sequential WITHIN a stream, so it runs as
    grouped-map pandas per stratum — the same legitimate-sequential
    pattern as the token chunker (operators/chunking.py). Strata pack
    in parallel; at 100 TB, sub-shard each language by doc_id range
    and pack shards independently (the budget invariant is local to a
    shard; only seq_no numbering is shard-relative). The DuckDB oracle
    is a recursive CTE replaying the identical walk — its recursion
    depth is the largest stratum (~2 min at sf0.1; the Spark side is
    sub-second). `sequence_packing_sharded` is the depth-bounded form
    on both sides."""
    docs = (_t(spark, sf_dir, "documents")
            .select("lang", "doc_id",
                    F.size(F.split("text", " ")).cast("long")
                     .alias("n_tokens")))

    def pack(pdf):
        return greedy_pack_pandas(pdf)[
            ["lang", "doc_id", "n_tokens", "seq_no", "seq_offset"]]

    return docs.groupBy("lang").applyInPandas(pack, _PACK_SCHEMA)


PACK_SHARD_SPAN = 256   # doc_id span per packing shard


@register(
    "sequence_packing_sharded",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT lang, doc_id, doc_id // {PACK_SHARD_SPAN} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY lang, doc_id // {PACK_SHARD_SPAN}
                                ORDER BY doc_id) AS rn
      FROM documents
    ),
    walk AS (
      SELECT lang, shard, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS seq_local,
             CAST(0 AS BIGINT) AS seq_offset,
             n_tokens AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.lang, d.shard, d.doc_id, d.n_tokens, d.rn,
             CASE WHEN w.fill > 0 AND w.fill + d.n_tokens > {PACK_BUDGET_TOKENS}
                  THEN w.seq_local + 1 ELSE w.seq_local END,
             CASE WHEN w.fill > 0 AND w.fill + d.n_tokens > {PACK_BUDGET_TOKENS}
                  THEN CAST(0 AS BIGINT) ELSE w.fill END,
             CASE WHEN w.fill > 0 AND w.fill + d.n_tokens > {PACK_BUDGET_TOKENS}
                  THEN d.n_tokens ELSE w.fill + d.n_tokens END
      FROM walk w JOIN d ON d.lang = w.lang AND d.shard = w.shard
                        AND d.rn = w.rn + 1
    ),
    pershard AS (
      SELECT lang, shard, MAX(seq_local) + 1 AS n_seqs
      FROM walk GROUP BY lang, shard
    ),
    off AS (
      SELECT lang, shard,
             CAST(COALESCE(SUM(n_seqs) OVER (
                    PARTITION BY lang ORDER BY shard
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS shard_offset
      FROM pershard
    )
    SELECT w.lang, w.doc_id, w.n_tokens,
           CAST(o.shard_offset + w.seq_local AS BIGINT) AS seq_no,
           w.seq_offset
    FROM walk w JOIN off o ON o.lang = w.lang AND o.shard = w.shard
    """,
    tags=("packing", "training-prep", "scale"),
)
def sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of `sequence_packing`: each language stratum is
    sub-sharded by doc_id range ({PACK_SHARD_SPAN} ids per shard) and
    every (lang, shard) packs independently — parallelism scales with
    the corpus instead of the language count, and the sequential walk
    is bounded by the shard size. Global sequence numbers come from a
    second tiny pass: sequences-per-shard, prefix-summed per language
    (a PARTITIONED window over O(shards) rows), added to each shard's
    local numbers. Packing never crosses a shard boundary, so the
    budget invariant is preserved; only sequence numbering differs
    from the single-walk form."""
    from pyspark.sql import Window

    docs = (_t(spark, sf_dir, "documents")
            .select("lang", "doc_id",
                    # integer div, not float /: a long->double cast
                    # rounds above 2^53 and would shard-misplace huge
                    # doc_ids (and break for non-power-of-two spans)
                    F.expr(f"doc_id div {PACK_SHARD_SPAN}").alias("shard"),
                    F.size(F.split("text", " ")).cast("long")
                     .alias("n_tokens")))

    def pack_local(pdf):
        return greedy_pack_pandas(pdf, seq_col="seq_local")[
            ["lang", "shard", "doc_id", "n_tokens",
             "seq_local", "seq_offset"]]

    packed = docs.groupBy("lang", "shard").applyInPandas(
        pack_local, "lang string, shard long, doc_id long, "
                    "n_tokens long, seq_local long, seq_offset long")
    pershard = (packed.groupBy("lang", "shard")
                .agg((F.max("seq_local") + 1).alias("n_seqs")))
    w = (Window.partitionBy("lang").orderBy("shard")
         .rowsBetween(Window.unboundedPreceding, -1))
    offsets = pershard.select(
        "lang", "shard",
        F.coalesce(F.sum("n_seqs").over(w), F.lit(0)).cast("long")
         .alias("shard_offset"))
    return (packed.join(F.broadcast(offsets), ["lang", "shard"])
            .select("lang", "doc_id", "n_tokens",
                    (F.col("shard_offset") + F.col("seq_local"))
                     .cast("long").alias("seq_no"),
                    "seq_offset"))


# --- winsorized robust statistics ----------------------------------------

@register(
    "winsorized_order_stats",
    oracle="""
    WITH pct AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS p05,
             quantile_cont(o_totalprice, 0.99) AS p99
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           ROUND(MIN(p.p05), 2) AS p05,
           ROUND(MIN(p.p99), 2) AS p99,
           ROUND(AVG(o.o_totalprice), 2) AS mean_raw,
           ROUND(AVG(LEAST(GREATEST(o.o_totalprice, p.p05), p.p99)), 2)
             AS mean_winsorized
    FROM orders o JOIN pct p ON p.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
    tags=("robust-stats", "A10"),
)
def winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (percentile-clipped) group statistics: exact p05/p99
    per priority, values clipped into [p05, p99], then the robust mean
    next to the raw mean — outlier-resistant aggregates for score
    columns whose tails are garbage. Two passes: a per-group exact
    percentile (Spark `percentile`, linear interpolation — the same
    contract as DuckDB `quantile_cont`), broadcast back, clip, and
    re-aggregate. At 100 TB swap `percentile` for `approx_percentile`
    (t-digest sketch, no per-group sort) — the plan shape is
    unchanged."""
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    pcts = (o.groupBy("o_orderpriority")
            .agg(F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
                 F.expr("percentile(o_totalprice, 0.99)").alias("p99")))
    clipped = F.expr("least(greatest(o_totalprice, p05), p99)")
    return (o.join(F.broadcast(pcts), "o_orderpriority")
            .groupBy("o_orderpriority")
            .agg(F.round(F.min("p05"), 2).alias("p05"),
                 F.round(F.min("p99"), 2).alias("p99"),
                 F.round(F.avg("o_totalprice"), 2).alias("mean_raw"),
                 F.round(F.avg(clipped), 2).alias("mean_winsorized")))


# --- tokenizer vocabulary + corpus encoding ------------------------------

_DUCK_VOCAB = """
    tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' '))                 AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    counts AS (SELECT word, COUNT(*) AS n_occurrences FROM tok GROUP BY word),
    vocab AS (
      SELECT word, n_occurrences,
             ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, word)
               AS token_id
      FROM counts
    )
"""


def _spark_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with contiguous token ids, ranked
    WITHOUT a global single-task window: row_number runs partitioned
    by the occurrence count (ties ranked by word within a count), and
    each count-group's global offset (= how many words have a strictly
    higher count) comes from a non-equi join of the count HISTOGRAM
    against itself — a frame of O(distinct counts) rows, far smaller
    than the vocabulary. token_id = offset + rank-within-count equals
    the oracle's ROW_NUMBER() OVER (ORDER BY n DESC, word) exactly."""
    from pyspark.sql import Window

    d = fanout(_t(spark, sf_dir, "documents"))
    counts = (d.select(F.explode(F.split("text", " ")).alias("word"))
              .groupBy("word")
              .agg(F.count(F.lit(1)).alias("n_occurrences")))
    # Materialize the vocabulary once: three downstream branches
    # (histogram, offsets, ranking) would otherwise each re-scan and
    # re-explode the corpus. The checkpoint is vocabulary-sized, so
    # this trades O(vocab) storage for corpus passes.
    counts = counts.localCheckpoint(eager=True)
    hist = (counts.groupBy("n_occurrences")
            .agg(F.count(F.lit(1)).alias("n_words")))
    h2 = hist.select(F.col("n_occurrences").alias("n2"),
                     F.col("n_words").alias("w2"))
    offsets = (hist.join(F.broadcast(h2), F.col("n2") > F.col("n_occurrences"),
                         "left")
               .groupBy("n_occurrences")
               .agg(F.coalesce(F.sum("w2"), F.lit(0)).alias("offset")))
    w = Window.partitionBy("n_occurrences").orderBy("word")
    ranked = counts.withColumn("rank_in", F.row_number().over(w))
    return (ranked.join(F.broadcast(offsets), "n_occurrences")
            .select("word", "n_occurrences",
                    (F.col("offset") + F.col("rank_in")).cast("long")
                     .alias("token_id")))


@register(
    "vocab_token_ids",
    oracle=f"""
    WITH {_DUCK_VOCAB}
    SELECT word, n_occurrences, token_id FROM vocab
    """,
    tags=("tokenization", "training-prep"),
)
def vocab_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary construction: every corpus word gets a
    contiguous id by descending frequency (ties alphabetical) — the
    id-assignment step of tokenizer training. One hash-aggregate over
    the corpus; the ranking itself never sees more than the vocabulary
    (and its single-task exposure is only O(distinct counts) — see
    `_spark_vocab`)."""
    return _spark_vocab(spark, sf_dir)


@register(
    "document_token_ids",
    oracle=f"""
    WITH {_DUCK_VOCAB},
    enc AS (
      SELECT t.doc_id, t.pos, v.token_id
      FROM tok t JOIN vocab v ON v.word = t.word
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           array_to_string(list(CAST(token_id AS VARCHAR) ORDER BY pos), ' ')
             AS token_ids
    FROM enc GROUP BY doc_id
    """,
    tags=("tokenization", "training-prep", "scale"),
)
def document_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoding: each document's text becomes its token-id
    sequence (space-joined string — the driver harness hashes scalars
    only). The scale path is the point: the vocabulary is collapsed to
    a single-row word->id map and broadcast, so encoding is a per-row
    JVM `transform` over the split words — the corpus is never
    exploded, shuffled, or regrouped. (A vocabulary too big for one
    broadcast map falls back to explode + equi-join + ordered regroup,
    which is what the DuckDB oracle expresses.)"""
    vm = _spark_vocab(spark, sf_dir).agg(
        F.map_from_entries(F.collect_list(F.struct("word", "token_id")))
         .alias("vm"))
    d = fanout(_t(spark, sf_dir, "documents"))
    enc = d.join(F.broadcast(vm)).select(
        "doc_id",
        F.expr("transform(split(text, ' '), w -> element_at(vm, w))")
         .alias("ids"))
    return enc.select(
        "doc_id",
        F.size("ids").cast("long").alias("n_tokens"),
        F.expr("concat_ws(' ', transform(ids, i -> cast(i as string)))")
         .alias("token_ids"))


# --- corpus mixture planning ---------------------------------------------

# target domain weights for the training mixture (src0 upweighted the
# way curated sources usually are) and the total token budget
MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.15,
               "src3": 0.1, "src4": 0.05}
MIX_TOKEN_BUDGET = 20_000


@register(
    "corpus_mixture_plan",
    oracle=f"""
    WITH avail AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS available_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT * FROM (VALUES
        {", ".join(f"('{s}', {w})" for s, w in MIX_WEIGHTS.items())}
      ) t(source, weight)
    )
    SELECT a.source, a.n_docs, a.available_tokens,
           CAST(ROUND(w.weight * {MIX_TOKEN_BUDGET}, 0) AS BIGINT)
             AS target_tokens,
           ROUND(w.weight * {MIX_TOKEN_BUDGET} / a.available_tokens, 6)
             AS sample_rate,
           CAST(CEIL(w.weight * {MIX_TOKEN_BUDGET} / a.available_tokens)
                AS BIGINT) AS n_epochs,
           (w.weight * {MIX_TOKEN_BUDGET} > a.available_tokens)
             AS upsampled
    FROM avail a JOIN w ON w.source = a.source
    """,
    tags=("mixture", "training-prep"),
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planner: for each source domain, the sampling rate
    (or upsampling epoch count) needed to hit its target weight in a
    fixed token budget — the decision table behind 'weight the curated
    source 40%, crawl 30%, ...'. One aggregate over the corpus joined
    to the broadcast weight table; a rate > 1 means the domain must
    repeat (`n_epochs` full passes), the standard upsampling move for
    scarce high-quality sources."""
    w_rows = [(s, float(w)) for s, w in MIX_WEIGHTS.items()]
    weights = spark.createDataFrame(w_rows, "source string, weight double")
    avail = (_t(spark, sf_dir, "documents")
             .groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.size(F.split("text", " "))).cast("long")
                   .alias("available_tokens")))
    need = F.col("weight") * MIX_TOKEN_BUDGET
    return (avail.join(F.broadcast(weights), "source")
            .select("source", "n_docs", "available_tokens",
                    F.round(need, 0).cast("long").alias("target_tokens"),
                    F.round(need / F.col("available_tokens"), 6)
                     .alias("sample_rate"),
                    F.ceil(need / F.col("available_tokens")).cast("long")
                     .alias("n_epochs"),
                    (need > F.col("available_tokens")).alias("upsampled")))


# --- fixed-size deterministic sampling -----------------------------------

SAMPLE_K = 100


@register(
    "uniform_hash_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars, {duck_char_hash('text')} AS hv
      FROM documents
    )
    SELECT doc_id, lang, n_chars, hv
    FROM h ORDER BY hv, doc_id LIMIT {SAMPLE_K}
    """,
    tags=("sampling", "A4", "scale"),
)
def uniform_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE uniform sample via order statistics: take the k
    documents with the smallest content hash. The hash order is
    independent of storage order, so the sample is uniform over
    content; it is also fully deterministic and REPRODUCIBLE across
    engines and runs (unlike `TABLESAMPLE`/`rand()`), and STABLE under
    corpus growth (a doc stays sampled until k better hashes exist —
    bottom-k sketch semantics). Complements the rate-based
    `deterministic_sample_extrapolate` (fixed RATE, variable size).
    The plan is the scale point: TakeOrderedAndProject — per-partition
    top-k heaps then one k-row merge, never a global sort."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.expr(spark_char_hash("text")).alias("hv"))
    return d.orderBy("hv", "doc_id").limit(SAMPLE_K)


# --- BM25 ranking --------------------------------------------------------

BM25_TERMS = ("spark", "hash", "merge")
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "bm25_scores",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    tf AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS dl,
             {", ".join(
                 f"CAST(len(list_filter(words, w -> w = '{t}')) AS BIGINT)"
                 f" AS tf{i}" for i, t in enumerate(BM25_TERMS))}
      FROM d
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             AVG(dl) AS avgdl,
             {", ".join(
                 f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS df{i}" for i in range(len(BM25_TERMS)))}
      FROM tf
    )
    SELECT t.doc_id,
           ({" + ".join(f"CASE WHEN t.tf{i} > 0 THEN 1 ELSE 0 END"
                        for i in range(len(BM25_TERMS)))}) AS n_matched,
           ROUND({" + ".join(
               f"(ln(1.0 + (s.n_docs - s.df{i} + 0.5) / (s.df{i} + 0.5))"
               f" * (t.tf{i} * ({BM25_K1} + 1.0))"
               f" / (t.tf{i} + {BM25_K1} * (1.0 - {BM25_B}"
               f" + {BM25_B} * t.dl / s.avgdl)))"
               for i in range(len(BM25_TERMS)))}, 4) AS bm25
    FROM tf t CROSS JOIN stats s
    WHERE {" + ".join(f"t.tf{i}" for i in range(len(BM25_TERMS)))} > 0
    """,
    tags=("text-analysis", "ranking"),
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term
    set — the lexical-retrieval complement to `tfidf_top_terms` and
    the embedding searches. Term frequencies are per-row array math
    over the split words (no corpus explode); document frequencies,
    N, and the average length are ONE tiny aggregate broadcast back as
    a single row. Both engines evaluate the identical arithmetic
    expression tree (Lucene-style idf: ln(1 + (N - df + .5)/(df + .5))),
    so the rounded scores hash-match."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", F.split("text", " ").alias("words")))
    tf = d.select(
        "doc_id",
        F.size("words").cast("long").alias("dl"),
        *[F.expr(f"cast(size(filter(words, w -> w = '{t}')) as bigint)")
           .alias(f"tf{i}") for i, t in enumerate(BM25_TERMS)])
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).cast("long")
           .alias(f"df{i}") for i in range(len(BM25_TERMS))])
    scored = tf.join(F.broadcast(stats))
    n_matched = " + ".join(f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END"
                           for i in range(len(BM25_TERMS)))
    score = " + ".join(
        f"(ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * ({BM25_K1} + 1.0))"
        f" / (tf{i} + {BM25_K1} * (1.0 - {BM25_B}"
        f" + {BM25_B} * dl / avgdl)))"
        for i in range(len(BM25_TERMS)))
    any_tf = " + ".join(f"tf{i}" for i in range(len(BM25_TERMS)))
    return (scored.filter(F.expr(f"{any_tf} > 0"))
            .select("doc_id",
                    F.expr(n_matched).cast("int").alias("n_matched"),
                    F.expr(f"round({score}, 4)").alias("bm25")))


# --- Z-order (Morton) locality -------------------------------------------

Z_EPOCH = "1995-01-01"
Z_CELL_SHIFT = 16   # bucket = z >> 16: bounds each dim span at 2^8


def spark_zvalue(a: str, b: str) -> str:
    """Interleave the low 16 bits of two non-negative int expressions
    into a 32-bit Morton code (a -> even bits, b -> odd bits). Exact
    int64 arithmetic, reproduced verbatim by :func:`duck_zvalue`."""
    return (f"aggregate(sequence(0, 15), cast(0 as bigint), (acc, i) -> "
            f"acc + shiftleft(shiftright(cast(({a}) as bigint), i) & 1, 2 * i)"
            f" + shiftleft(shiftright(cast(({b}) as bigint), i) & 1, 2 * i + 1))")


def duck_zvalue(a: str, b: str) -> str:
    # Fully parenthesized: DuckDB (like Postgres) gives <<, >>, &, |
    # one shared left-associative precedence tier, so an unbracketed
    # `x << i | y << j` chains as `((x << i) | y) << j`.
    return (f"CAST(list_sum(list_transform(range(0, 16), i -> "
            f"((((CAST(({a}) AS BIGINT) >> i) & 1) << (2 * i))"
            f" | ((((CAST(({b}) AS BIGINT) >> i) & 1)) << (2 * i + 1)))))"
            f" AS BIGINT)")


# pmod, not %: the z-value contract requires NON-NEGATIVE inputs
# (two's-complement bits of a negative remainder would alias distinct
# values across engines' shift semantics). The corpus dates start at
# Z_EPOCH so % would pass today, but the folding must not depend on
# that.
_Z_A = "o_custkey % 65536"
_Z_B_SPARK = f"pmod(datediff(o_orderdate, '{Z_EPOCH}'), 65536)"
_Z_B_DUCK = ("(((datediff('day', TIMESTAMP '" + Z_EPOCH + "', o_orderdate)"
             " % 65536) + 65536) % 65536)")


@register(
    "zorder_locality_stats",
    oracle=f"""
    WITH z AS (
      SELECT CAST({_Z_A} AS BIGINT) AS ck,
             CAST({_Z_B_DUCK} AS BIGINT) AS dd,
             {duck_zvalue(_Z_A, _Z_B_DUCK)} AS zval
      FROM orders
    )
    SELECT zval >> {Z_CELL_SHIFT} AS z_cell,
           COUNT(*) AS n_orders,
           MAX(ck) - MIN(ck) AS custkey_span,
           MAX(dd) - MIN(dd) AS day_span
    FROM z GROUP BY 1
    """,
    tags=("layout", "zorder", "scale"),
)
def zorder_locality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order locality, made measurable: Morton-interleave
    (customer key, order day) into a 32-bit Z-value and aggregate per
    coarse Z-cell. Every cell's span in BOTH dimensions is bounded by
    the cell's bit budget (< 2^11 here) — the property that makes
    Z-ordered parquet files prunable by min/max stats on either
    dimension. `sources/layout.py:zorder_write` uses this same
    expression to range-partition writes; tests/test_layout.py proves
    the per-file span shrinkage against a round-robin layout."""
    o = _t(spark, sf_dir, "orders")
    z = o.select(
        F.expr(_Z_A).cast("long").alias("ck"),
        F.expr(_Z_B_SPARK).cast("long").alias("dd"),
        F.expr(spark_zvalue(_Z_A, _Z_B_SPARK)).alias("zval"))
    return (z.groupBy(F.expr(f"zval >> {Z_CELL_SHIFT}").alias("z_cell"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 (F.max("ck") - F.min("ck")).alias("custkey_span"),
                 (F.max("dd") - F.min("dd")).alias("day_span")))


# --- temperature-scaled mixture ------------------------------------------

TEMP_T = 2            # temperature: weights ~ n^(1/T); T=2 => sqrt (IEEE-exact)
TEMP_SCALE = 1_000_000


# Shared mixture-weight derivation (ONE definition): the scaled-weight
# CTE chain used verbatim by temperature_mixture_plan's oracle AND
# corpus_mixture_apply's, and the matching Spark frames — a change to
# the temperature/quantization touches exactly one place per engine.
_DUCK_MIX_SCALED = f"""avail AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS available_tokens
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT source, available_tokens,
             CAST(round(sqrt(CAST(available_tokens AS DOUBLE))
                        * {TEMP_SCALE}) AS BIGINT) AS w_q
      FROM avail
    ),
    tot AS (SELECT CAST(SUM(w_q) AS BIGINT) AS wsum FROM scaled)"""

_DUCK_MIX_RATE_ARGS = (f'CAST(s.w_q AS HUGEINT) * {MIX_TOKEN_BUDGET}',
                       'CAST(t.wsum AS HUGEINT) * s.available_tokens')

_SPARK_MIX_RATE_ARGS = (f"cast(w_q as decimal(38,0)) * {MIX_TOKEN_BUDGET}",
                        "cast(wsum as decimal(38,0)) * available_tokens")


def _mix_scaled_frames(spark: SparkSession, sf_dir: str):
    """(scaled, tot): per-source quantized sqrt weights + one-row sum."""
    avail = (_t(spark, sf_dir, "documents")
             .groupBy("source")
             .agg(F.sum(F.size(F.split("text", " "))).cast("long")
                  .alias("available_tokens")))
    scaled = avail.select(
        "source", "available_tokens",
        F.expr(f"cast(round(sqrt(cast(available_tokens as double))"
               f" * {TEMP_SCALE}) as bigint)").alias("w_q"))
    tot = scaled.agg(F.sum("w_q").cast("long").alias("wsum"))
    return scaled, tot


@register(
    "temperature_mixture_plan",
    oracle=f"""
    WITH {_DUCK_MIX_SCALED}
    SELECT s.source, s.available_tokens, s.w_q,
           {duck_round_ratio_wide('s.w_q', 't.wsum', 6)} AS mix_weight,
           {duck_round_ratio_wide(*_DUCK_MIX_RATE_ARGS, 6)}
             AS sample_rate,
           {duck_round_ratio_wide(*_DUCK_MIX_RATE_ARGS, 6)} > 1.0
             AS upsampled
    FROM scaled s CROSS JOIN tot t
    """,
    tags=("mixture", "training-prep"),
)
def temperature_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (the UniMax / multilingual
    T-sampling move): each source's share is proportional to
    available_tokens^(1/T), flattening the natural distribution so
    scarce domains are upsampled and huge ones downweighted — the
    data-driven counterpart of corpus_mixture_plan's hand-set
    weights.

    T = {TEMP_T} makes the power a square root, which IEEE 754
    requires to be correctly rounded — so sqrt is bit-identical in
    both engines, and quantizing each source's scaled weight to int64
    BEFORE the normalizing sum removes the float-summation-order
    hazard (sum of int64 is exact). The rate/weight rounding runs in
    128-bit integers (DECIMAL(38,0) div / HUGEINT //): the bigint
    half-up form would overflow 2*w_q*budget*10^6 once a source holds
    >~53k tokens — Spark (non-ANSI) wrapping silently where DuckDB
    errors. The wide form is exact past 10^13-token sources
    (tests/test_scale_ops.py overflow-regime case). One corpus
    aggregate + a source-count-sized cross join with the one-row
    total."""
    scaled, tot = _mix_scaled_frames(spark, sf_dir)
    rate = spark_round_ratio_wide(*_SPARK_MIX_RATE_ARGS, 6)
    return (scaled.crossJoin(F.broadcast(tot))
            .select("source", "available_tokens", "w_q",
                    spark_round_ratio_wide("w_q", "wsum", 6)
                    .alias("mix_weight"),
                    rate.alias("sample_rate"),
                    (rate > 1.0).alias("upsampled")))


@register(
    "corpus_mixture_apply",
    oracle=f"""
    WITH {_DUCK_MIX_SCALED},
    rates AS (
      SELECT s.source,
             {duck_round_ratio_wide_q(*_DUCK_MIX_RATE_ARGS, 6)}
               AS rate_ppm
      FROM scaled s CROSS JOIN tot t
    )
    SELECT d.doc_id, d.source, r.rate_ppm,
           CAST(r.rate_ppm // 1000000
                + CASE WHEN ({duck_char_hash("d.text || '|mix'")})
                            % 1000000 < r.rate_ppm % 1000000
                       THEN 1 ELSE 0 END AS BIGINT) AS n_copies
    FROM documents d JOIN rates r ON r.source = d.source
    """,
    tags=("mixture", "training-prep", "sampling"),
)
def corpus_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the temperature mixture plan: turn each source's
    planned sample_rate into a per-document copy count — the step
    that actually builds the training epoch from the plan
    (`temperature_mixture_plan` decides rates; this materializes
    them; rates > 1 mean upsampling, so a document can appear
    multiple times, and rates < 1 drop a deterministic fraction).

    Exact end-to-end: the rate is carried as the WIDE integer
    quotient (rate_ppm, the same 128-bit half-up arithmetic as the
    plan — never re-derived from the rounded double), whole copies
    are `rate_ppm div 1e6`, and the fractional remainder becomes a
    per-doc Bernoulli via the portable content hash mod 1e6 —
    deterministic, engine-reproducible, salt-decorrelated from the
    split/sample/fingerprint hashes. Emits every doc with its
    n_copies (0 = dropped) for auditability; the epoch corpus is the
    `n_copies > 0` slice exploded by copy index.

    Plan shape at 100 TB: one corpus aggregate for the rate table
    (sources-sized, broadcast back) + one map-only pass over docs —
    no shuffle touches the document bodies."""
    scaled, tot = _mix_scaled_frames(spark, sf_dir)
    rates = (scaled.crossJoin(F.broadcast(tot))
             .select("source",
                     spark_round_ratio_wide_q(*_SPARK_MIX_RATE_ARGS, 6)
                     .alias("rate_ppm")))
    d = fanout(_t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text")
    salt_hash = spark_char_hash("text || '|mix'")
    hmod = F.expr(f"pmod({salt_hash}, 1000000)")
    return (d.join(F.broadcast(rates), "source")
            .select("doc_id", "source", "rate_ppm",
                    (F.expr("rate_ppm div 1000000")
                     + F.when(hmod < F.col("rate_ppm") % 1000000, 1)
                       .otherwise(0))
                    .cast("long").alias("n_copies")))


# The registered sequence_packing oracle is available here (it
# registers earlier in this module); compose it directly so the
# report's oracle cannot drift from the packer's.
from transcript_analysis_spark.plans.registry import _REGISTRY as _THIS_REG  # noqa: E402

_PACKING_ORACLE_SQL = _THIS_REG["sequence_packing"].oracle


@register(
    "packing_efficiency_report",
    oracle=f"""
    WITH per_seq AS (
      SELECT lang, seq_no,
             CAST(SUM(n_tokens) AS BIGINT) AS fill,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM ({_PACKING_ORACLE_SQL}) p
      GROUP BY lang, seq_no
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sequences,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(fill) AS BIGINT) AS total_tokens,
           CAST(SUM(GREATEST({PACK_BUDGET_TOKENS} - fill, 0)) AS BIGINT)
             AS total_padding,
           CAST(SUM(GREATEST(fill - {PACK_BUDGET_TOKENS}, 0)) AS BIGINT)
             AS total_overflow,
           {duck_round_ratio(
               f'SUM(LEAST(fill, {PACK_BUDGET_TOKENS}))',
               f'COUNT(*) * {PACK_BUDGET_TOKENS}', 6)} AS utilization
    FROM per_seq GROUP BY lang
    """,
    tags=("packing", "training-prep", "report"),
)
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How good is the greedy packing actually? Per language: sequence
    count, padding tokens (budget - fill for under-full sequences),
    overflow tokens (oversized single-doc sequences), and utilization
    = filled/(sequences x budget) — the number that decides whether
    pretraining batches waste FLOPs on pad tokens. COMPOSED on the
    registered `sequence_packing` query on the Spark side and on its
    recursive-CTE oracle on the DuckDB side (the `corpus_release_prep`
    discipline: the report cannot drift from the packer it reports
    on). Integer token sums + the shared half-up ratio, so the
    utilization figures are exact."""
    packed = sequence_packing(spark, sf_dir)
    per_seq = (packed.groupBy("lang", "seq_no")
               .agg(F.sum("n_tokens").cast("long").alias("fill"),
                    F.count(F.lit(1)).cast("long").alias("n_docs")))
    B = PACK_BUDGET_TOKENS
    return (per_seq.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_sequences"),
                 F.sum("n_docs").cast("long").alias("n_docs"),
                 F.sum("fill").cast("long").alias("total_tokens"),
                 F.sum(F.greatest(F.lit(B) - F.col("fill"), F.lit(0)))
                  .cast("long").alias("total_padding"),
                 F.sum(F.greatest(F.col("fill") - F.lit(B), F.lit(0)))
                  .cast("long").alias("total_overflow"),
                 spark_round_ratio(
                     f"sum(least(fill, {B}))",
                     f"count(1) * {B}", 6).alias("utilization")))


# --- ranking quality: NDCG@k of the BM25 retrieval ------------------------

NDCG_K = 10
# round(1e6 / log2(pos + 1)) for pos 1..10 — the standard DCG discount
# as a FIXED integer constant table shared verbatim by both engines,
# so the graded-relevance sum needs no transcendental at query time
# and stays exact integer arithmetic.
NDCG_DISCOUNTS = (1000000, 630930, 500000, 430677, 386853,
                  356207, 333333, 315465, 301030, 289065)

_BM25_ORACLE_SQL = _THIS_REG["bm25_scores"].oracle
_DUCK_DISC_VALUES = ", ".join(
    f"({i + 1}, {d})" for i, d in enumerate(NDCG_DISCOUNTS))
_SPARK_DISC_MAP = "map(" + ", ".join(
    f"{i + 1}, {d}L" for i, d in enumerate(NDCG_DISCOUNTS)) + ")"


@register(
    "bm25_ndcg_report",
    oracle=f"""
    WITH scored AS (SELECT * FROM ({_BM25_ORACLE_SQL}) b),
    disc(pos, disc) AS (VALUES {_DUCK_DISC_VALUES}),
    ranked AS (
      SELECT n_matched,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS pos
      FROM scored
    ),
    ideal AS (
      SELECT n_matched,
             row_number() OVER (ORDER BY n_matched DESC, doc_id) AS pos
      FROM scored
    ),
    dcg AS (
      SELECT CAST(SUM(r.n_matched * d.disc) AS BIGINT) AS dcg10
      FROM ranked r JOIN disc d ON r.pos = d.pos
    ),
    idcg AS (
      SELECT CAST(SUM(i.n_matched * d.disc) AS BIGINT) AS idcg10
      FROM ideal i JOIN disc d ON i.pos = d.pos
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM scored)
    SELECT n_candidates, dcg10, idcg10,
           {duck_round_ratio('dcg10', 'idcg10', 6)} AS ndcg10
    FROM nc CROSS JOIN dcg CROSS JOIN idcg
    WHERE n_candidates > 0
    """,
    tags=("text-analysis", "ranking", "eval", "report"),
)
def bm25_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{NDCG_K} of the registered BM25 ranking against graded
    term-containment relevance — the ranking-quality member of the
    eval tier (recall@k grades the ANN indexes, kappa grades the
    classifier, NDCG grades retrieval ORDER, which recall alone cannot
    see). COMPOSED on `bm25_scores`' own oracle so the graded ranking
    can never drift from the registered query; relevance is its exact
    n_matched column (0-{len(BM25_TERMS)} query terms present).

    Exactness: ranking order is total ((bm25 DESC, doc_id) — the
    rounded score is hash-proven identical across engines), the DCG
    discount is a fixed integer constant table (module constant
    NDCG_DISCOUNTS = round(1e6/log2(pos+1))), so DCG and ideal-DCG are
    plain int64 sums (<= 3e7) and NDCG is one exact half-up rational.

    Plan shape at 100 TB: the BM25 pass is map-only + one tiny stats
    broadcast; both top-{NDCG_K} cuts are TakeOrderedAndProject
    (per-partition heaps, k-row merge — never a global sort); the
    position-weighted sums then fold the <= {NDCG_K}-element sorted
    array in one bounded higher-order expression — NO window spec at
    all, so the unpartitioned-window plan gate stays clean by
    construction. Empty corpus -> zero rows both engines (the
    n_candidates > 0 guard)."""
    scored = bm25_scores(spark, sf_dir)

    def _dcg(ordered, sort_keys, alias):
        # rank by folding the collected top-k (bounded: <= NDCG_K
        # structs) in sort order; struct sort is lexicographic
        # ascending, so descending keys enter negated
        top = scored.orderBy(*ordered).limit(NDCG_K)
        arr = F.sort_array(F.collect_list(F.struct(
            *sort_keys, F.col("n_matched").alias("rel"))))
        return (top.agg(arr.alias("arr"))
                .select(F.expr(
                    f"case when size(arr) = 0 then cast(null as bigint)"
                    f" else aggregate(sequence(1, size(arr)),"
                    f" cast(0 as bigint), (acc, i) -> acc"
                    f" + arr[i-1].rel * element_at({_SPARK_DISC_MAP}, i))"
                    f" end").alias(alias)))

    dcg = _dcg([F.col("bm25").desc(), F.col("doc_id")],
               [(-F.col("bm25")).alias("k1"), F.col("doc_id").alias("k2")],
               "dcg10")
    idcg = _dcg([F.col("n_matched").desc(), F.col("doc_id")],
                [(-F.col("n_matched")).alias("k1"),
                 F.col("doc_id").alias("k2")],
                "idcg10")
    nc = scored.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    return (nc.crossJoin(F.broadcast(dcg)).crossJoin(F.broadcast(idcg))
            .filter(F.col("n_candidates") > 0)
            .select("n_candidates", "dcg10", "idcg10",
                    spark_round_ratio("dcg10", "idcg10", 6)
                    .alias("ndcg10")))


# --- reproducible epoch data ordering -------------------------------------

SHUFFLE_EPOCHS = 2
SHUFFLE_SHARD_DOCS = 100   # docs per training shard
_SHUFFLE_BUCKETS = 1024
_SHUFFLE_BDIV = MOD // _SHUFFLE_BUCKETS + 1
# Per-epoch affine mix (a*h + b) % MOD over the one content hash.
# The multiplier is the load-bearing part: MOD is prime, so each mix
# is a bijection, and DISTINCT multipliers scramble the relative
# order between epochs. (A same-length text-suffix salt — the first
# design — reduces to h*31^len + C_e: the SAME multiplier with an
# additive shift, which merely rotates the value circle and leaves
# the two epoch orders almost identical. Caught by the decorrelation
# test; a*h stays < 1.2e18, inside int64.)
EPOCH_SALTS = ((1103515245, 12345), (1299709, 7919))


def _epoch_mix(e: int, h_expr: str) -> str:
    a, b = EPOCH_SALTS[e]
    return f"(({a} * ({h_expr}) + {b}) % {MOD})"


def _epoch_positions(frame: DataFrame, pos_col: str) -> DataFrame:
    """Exact global 1..n ordering positions by (hv asc, doc_id asc)
    WITHOUT a global single-task window — the ascending-integer twin
    of curation's `_bucketed_rank`: hv is bucketed by integer div
    (at most {_SHUFFLE_BUCKETS} buckets, ordering with hv), positions
    are row_numbers within each bucket partition, and each bucket's
    offset is the count of rows in strictly-lower buckets via a
    non-equi join over the O(#buckets) count table."""
    from pyspark.sql import Window
    b = frame.withColumn("_bkt", F.expr(f"hv div {_SHUFFLE_BDIV}"))
    counts = b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    offs = (counts.alias("x")
            .join(F.broadcast(counts.alias("y")),
                  F.col("y._bkt") < F.col("x._bkt"), "left")
            .groupBy(F.col("x._bkt").alias("_bkt"))
            .agg(F.coalesce(F.sum("y._c"), F.lit(0)).alias("_off")))
    w = Window.partitionBy("_bkt").orderBy(F.asc("hv"), F.asc("doc_id"))
    return (b.join(F.broadcast(offs), "_bkt")
            .withColumn(pos_col,
                        (F.col("_off") + F.row_number().over(w))
                        .cast("long"))
            .drop("_bkt", "_c", "_off"))


def _duck_epoch_cte(e: int) -> str:
    return (f"SELECT CAST({e} AS BIGINT) AS epoch, doc_id, "
            f"{_epoch_mix(e, duck_char_hash('text'))} AS hv "
            f"FROM documents")


@register(
    "epoch_shuffle_plan",
    oracle=f"""
    WITH u AS (
      {" UNION ALL ".join(_duck_epoch_cte(e)
                          for e in range(SHUFFLE_EPOCHS))}
    ),
    r AS (
      SELECT epoch, doc_id, hv,
             CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                                     ORDER BY hv, doc_id)
                  AS BIGINT) AS shuffle_pos
      FROM u
    )
    SELECT epoch, doc_id, hv, shuffle_pos,
           (shuffle_pos - 1) // {SHUFFLE_SHARD_DOCS} AS shard
    FROM r
    """,
    tags=("training-prep", "ordering"),
)
def epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch global data ordering — the "data order
    seed" of a pretraining run, made a deterministic artifact instead
    of runtime RNG state: epoch e orders the corpus by an epoch-keyed
    affine mix of the content hash ((a_e*h + b_e) mod prime, distinct
    multipliers — see EPOCH_SALTS for why a suffix salt fails), so the
    order is (a) a uniform permutation per epoch, (b) decorrelated
    BETWEEN epochs (the property epoch reshuffles exist for, pinned by
    test), (c) identical across engines, runs, and restarts (no
    rand()/seed state to lose on preemption), and (d) stable under
    append-only growth for already-positioned prefixes of the hash
    order. Positions then map onto fixed-size training shards.

    Plan shape at 100 TB: the per-epoch global 1..n positions use the
    ascending bucketed-rank scheme (partitioned window over <=
    {_SHUFFLE_BUCKETS} hash-range buckets + one O(#buckets) broadcast
    non-equi join) — never one task sorting the world; epochs are
    independent map passes unioned. The DuckDB oracle is the plain
    corpus-wide ROW_NUMBER the pattern replaces."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # ONE content-hash pass, pinned narrow: every epoch's mix is
    # affine in the SAME full-text hash, and each epoch's position
    # scheme references its frame twice through NON-identical
    # exchanges (groupBy counts vs the window partitioning), so
    # runtime exchange reuse cannot dedup them — unpinned, this plan
    # re-scanned documents and re-hashed every text 2x per epoch
    # (6 scans measured, ReusedExchange count 0).
    hashed = (d.select("doc_id", F.expr(spark_char_hash("text")).alias("h"))
              .localCheckpoint(eager=True))
    frames = []
    for e in range(SHUFFLE_EPOCHS):
        f = hashed.select(
            F.lit(e).cast("long").alias("epoch"), "doc_id",
            F.expr(_epoch_mix(e, "h")).alias("hv"))
        frames.append(_epoch_positions(f, "shuffle_pos"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "epoch", "doc_id", "hv", "shuffle_pos",
        F.expr(f"(shuffle_pos - 1) div {SHUFFLE_SHARD_DOCS}")
         .cast("long").alias("shard"))
