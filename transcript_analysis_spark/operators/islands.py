"""Islands extraction — the reference's flagship analytical pipeline.

Re-expresses `build_islands_from_scores.py` / `island_worker.py` of the
reference (smooth → find_islands → word range → time range → average
score) as declarative Spark operators:

- Gaussian smoothing (`build_islands_from_scores.py:59-79`): the
  kernel convolution runs as JVM higher-order array functions
  (`transform` + `aggregate`) directly on the `array<double>` score
  column — zero shuffle, whole-stage codegen, no Python in the loop.
  Semantics match the reference exactly: zero-padding at the edges
  (np.convolve over a zero-padded array, mode="valid"), then
  max-normalization when max > 0.
- Run-length segmentation (`build_islands_from_scores.py:82-116`):
  gaps-and-islands fully inside the array domain — candidate structs,
  run-start detection, per-run slice aggregation as higher-order
  array functions; only finished islands are exploded — with the
  reference's exact keep rule `end_index - start_index >=
  min_island_length` (i.e. length >= min+1) and close-at-`i-1`
  semantics. The classic explode -> window -> groupBy restatement is
  kept as `find_islands_window`, the equivalence twin the tests hold
  the array-domain form against.
- Word-range mapping (`build_islands_from_scores.py:119-126`):
  score index i covers words [i+1, i+n]; pure column arithmetic.
- Time mapping (`build_islands_from_scores.py:145-167`): interval-
  overlap join of island word ranges against segment cumulative-word
  intervals (equi key + range predicate), then min(start) /
  max(start+duration) with +-pad and a floor at 0.

Scale notes: smoothing AND segmentation are per-row array math
(embarrassingly parallel, zero shuffle — plan-gated: no Exchange or
Window/Sort from scan to explode); the segment range-join is an
equi-join on the key column with a range
filter, so it hash-joins and never becomes a cartesian product. All
floats that cross the engine boundary are rounded (see plans/registry
float contract).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_THRESHOLD = 0.6       # build_islands_from_scores.py:34
DEFAULT_MIN_ISLAND_LENGTH = 8  # build_islands_from_scores.py:35
DEFAULT_SMOOTH_SIZE = 10       # build_islands_from_scores.py:37
DEFAULT_SMOOTH_SIGMA = 5       # build_islands_from_scores.py:38
DEFAULT_NGRAM_SIZE = 4         # build_islands_from_scores.py:32
TIME_PAD_SECONDS = 5           # build_islands_from_scores.py:40

# Number of decimal places floats are rounded to at engine-comparison
# boundaries (smoothed values feed a >= threshold comparison, so both
# engines must agree bit-for-bit after rounding).
#
# Deliberate contract edge: the convolution is rounded BEFORE
# max-normalization, so score arrays whose every value is < 5e-10
# normalize to zero and produce no islands — the reference (no
# rounding) would normalize by the tiny max instead. Real scores are
# probabilities/log-probs far above this; the determinism is worth the
# divergence (found and pinned by tests/test_properties.py).
SMOOTH_ROUND = 9
SCORE_ROUND = 6


def gaussian_kernel(smooth_size: int = DEFAULT_SMOOTH_SIZE,
                    sigma: float = DEFAULT_SMOOTH_SIGMA) -> list[float]:
    """The reference's kernel (`build_islands_from_scores.py:59-64`):
    exp(-(x-mu)^2 / (2 sigma^2)) for x in [-size, size]; NOT normalized."""
    return [math.exp(-(x * x) / (2.0 * sigma * sigma))
            for x in range(-smooth_size, smooth_size + 1)]


def smooth_scores(df: DataFrame,
                  score_col: str = "score",
                  out_col: str = "smoothed",
                  smooth_size: int = DEFAULT_SMOOTH_SIZE,
                  sigma: float = DEFAULT_SMOOTH_SIGMA) -> DataFrame:
    """Add `out_col`: the Gaussian-smoothed form of array<double>
    `score_col`.

    Matches reference `smooth()` (`build_islands_from_scores.py:67-79`):
    non-finite values scrubbed to 0, zero-padded convolution, then
    divide by the array max when positive. Runs fully JVM-side as
    higher-order array functions — per-row math, no shuffle, no Python.
    Each element is rounded to SMOOTH_ROUND decimals before and after
    normalization so downstream threshold comparisons are
    engine-portable.

    Built as sequential intermediate columns (not one nested
    expression) so the Catalyst expression tree stays linear — each
    step references the previous by name instead of re-inlining its
    subtree.
    """
    kernel = gaussian_kernel(smooth_size, sigma)
    kernel_lit = "array(" + ", ".join(repr(w) + "D" for w in kernel) + ")"
    s = smooth_size
    clean_c = f"__{out_col}_clean"
    conv_c = f"__{out_col}_conv"
    max_c = f"__{out_col}_max"
    out = (
        df
        # scrub non-finite -> 0 (reference :74)
        .withColumn(clean_c, F.expr(
            f"transform({score_col}, x -> "
            f"CASE WHEN isnan(x) OR x = double('inf') OR x = double('-inf') "
            f"THEN 0D ELSE x END)"))
        # zero-padded convolution (reference :75): out-of-range
        # neighbors simply drop out of the index sequence.
        .withColumn(conv_c, F.expr(
            f"transform({clean_c}, (x, i) -> round(aggregate("
            f"  sequence(greatest(0, i - {s}), least(size({clean_c}) - 1, i + {s})),"
            f"  0D,"
            f"  (acc, j) -> acc + element_at({clean_c}, j + 1)"
            f"              * element_at({kernel_lit}, j - i + {s + 1})"
            f"), {SMOOTH_ROUND}))"))
        # max-normalize when max > 0 (reference :76-78)
        .withColumn(max_c, F.array_max(F.col(conv_c)))
        .withColumn(out_col, F.expr(
            f"CASE WHEN {max_c} > 0 THEN "
            f"transform({conv_c}, x -> round(x / {max_c}, {SMOOTH_ROUND})) "
            f"ELSE {conv_c} END"))
        .drop(clean_c, conv_c, max_c)
    )
    return out


def _candidates_expr(score_col: str, smoothed_col: str,
                     threshold: float, above_threshold: bool) -> str:
    """Ordered array of struct(pos0, raw) for the threshold-passing
    positions of one row's score arrays — the shared front half of
    both find_islands implementations."""
    op = ">=" if above_threshold else "<="
    return (
        f"transform(filter(transform({smoothed_col}, (x, i) -> "
        f"struct(i as pos0, x as sm, element_at({score_col}, i + 1) as raw)),"
        f" s -> s.sm {op} {threshold!r}D), s -> struct(s.pos0, s.raw))"
    )


def find_islands(df: DataFrame,
                 keys: list[str],
                 score_col: str = "score",
                 smoothed_col: str = "smoothed",
                 threshold: float = DEFAULT_THRESHOLD,
                 min_island_length: int = DEFAULT_MIN_ISLAND_LENGTH,
                 above_threshold: bool = True) -> DataFrame:
    """Gaps-and-islands over per-key score arrays — fully inside the
    array domain, ZERO shuffle.

    Input: one row per key with `score_col` (raw array<double>) and
    `smoothed_col` (smoothed array<double>, same length). Output: one
    row per island with 0-based `start_index`/`end_index` (inclusive)
    and `average_score` = mean of the RAW scores in the island range
    (reference `average_score_in_range`, build_islands_from_scores.py:170-176),
    rounded to SCORE_ROUND.

    A score array is ONE row, so the classic explode -> window ->
    groupBy restatement (kept as `find_islands_window`, the
    equivalence twin) pays an exchange for locality the data already
    has. Here the whole segmentation runs as higher-order array
    functions on the row: candidate positions are contiguous runs
    exactly when their array index keeps pace with pos0, so run starts
    are the candidates whose predecessor isn't pos0 - 1; each run then
    aggregates its own slice. Only finished islands are exploded —
    per-row math, no exchange anywhere, and bit-identical averages
    (the slice fold accumulates 0.0 + raw left-to-right, the same
    order and initial value as the window twin's partial-avg sum).

    `above_threshold=False` flips the comparison (reference
    `find_islands(above_threshold=False)`, :92-98).
    """
    df, arr = _island_array_parts(df, "isl", score_col, smoothed_col,
                                  threshold, min_island_length,
                                  above_threshold)
    return (
        df.select(*keys, F.explode(F.expr(arr)).alias("z"))
        .select(*keys,
                F.col("z.start_index").cast("long").alias("start_index"),
                F.col("z.end_index").cast("long").alias("end_index"),
                F.col("z.average_score").alias("average_score"))
    )


def _island_array_parts(df: DataFrame,
                        tag: str,
                        score_col: str,
                        smoothed_col: str,
                        threshold: float,
                        min_island_length: int,
                        above_threshold: bool) -> tuple[DataFrame, str]:
    """The per-row island computation for ONE (threshold, min_len)
    config — the core both `find_islands` (explode one config) and
    `find_islands_multi` (label + flatten several configs, one scan)
    are built from. Adds the candidate/run intermediate columns to
    `df` and returns the island-array expression
    (array<struct<start_index,end_index,average_score>>) as a STRING
    over them, for the caller to embed directly in its explode.

    The expression must NOT be materialized as its own column:
    Catalyst's CollapseProject then inlines the whole candidate/run
    tree into one expression whose size multiplies per reference
    (measured: 3.5k -> 190k plan chars, 13x slower on a one-row
    frame). A Generate input referencing the intermediate COLUMNS
    keeps the projection chain linear."""
    cand_c = f"__{tag}_cand"
    runs_c = f"__{tag}_runs"
    df = (
        df
        .withColumn(cand_c, F.expr(_candidates_expr(
            score_col, smoothed_col, threshold, above_threshold)))
        # run starts (1-based indices into cand): the first candidate,
        # plus every candidate whose predecessor is not adjacent.
        # (sequence(1, 0) would yield [1, 0] — descending — so the
        # empty candidate list needs the explicit guard)
        .withColumn(runs_c, F.expr(
            f"if(size({cand_c}) = 0, array(), "
            f"filter(sequence(1, size({cand_c})), i -> i = 1 OR "
            f"element_at({cand_c}, i - 1).pos0 "
            f"!= element_at({cand_c}, i).pos0 - 1))"))
        # one struct per run: [a, b] = its slice of cand; the next
        # run's start (or the end of cand) closes it
        .withColumn(runs_c, F.expr(
            f"transform({runs_c}, (a, k) -> struct(a as a, "
            f"if(k + 2 <= size({runs_c}), "
            f"element_at({runs_c}, k + 2) - 1, size({cand_c})) as b))"))
    )
    islands = (
        f"filter(transform({runs_c}, r -> struct("
        f"element_at({cand_c}, r.a).pos0 as start_index, "
        f"element_at({cand_c}, r.b).pos0 as end_index, "
        f"round(aggregate(slice({cand_c}, r.a, r.b - r.a + 1), 0D, "
        f"(acc, s) -> acc + s.raw) / (r.b - r.a + 1), {SCORE_ROUND}) "
        f"as average_score)), "
        # reference keep rule: end - start >= min length (:110-115)
        f"z -> z.end_index - z.start_index >= {min_island_length})"
    )
    return df, islands


def find_islands_multi(df: DataFrame,
                       keys: list[str],
                       configs: list[tuple[float, int]],
                       score_col: str = "score",
                       smoothed_col: str = "smoothed",
                       above_threshold: bool = True) -> DataFrame:
    """Islands for EVERY (threshold, min_island_length) config in one
    pass over the input — the sweep primitive.

    Segmentation is per-row array math (see `find_islands`), so a
    config sweep does not need one scan of the corpus per config: each
    row computes its island array for every config, the arrays are
    labeled with their config and flattened, and a single explode
    emits config-tagged islands. Output: `keys` + `threshold`
    (double) + `min_len` (long) + the `find_islands` island columns.
    At 100 TB this turns |configs| scans of the (corpus-sized)
    smoothed frame into ONE scan; per-row compute is identical.

    `configs` must be non-empty; (threshold, min_len) pairs should be
    distinct (duplicates would duplicate islands)."""
    if not configs:
        raise ValueError("find_islands_multi needs at least one config")
    if len(set(configs)) != len(configs):
        # A duplicated (threshold, min_len) would emit duplicate island
        # rows, and the sweep pick logic (recommendation_from_sweep /
        # recommend_island_threshold) relies on distinct config keys
        # for its "exactly one row matches the max" invariant.
        raise ValueError("find_islands_multi configs must be distinct")
    labeled = []
    for i, (t, m) in enumerate(configs):
        df, arr = _island_array_parts(df, f"isl{i}", score_col,
                                      smoothed_col, t, int(m),
                                      above_threshold)
        labeled.append(
            f"transform({arr}, z -> struct("
            f"cast({t!r} as double) as threshold, "
            f"cast({int(m)} as bigint) as min_len, "
            f"z.start_index, z.end_index, z.average_score))")
    flat = f"flatten(array({', '.join(labeled)}))"
    return (
        df.select(*keys, F.explode(F.expr(flat)).alias("z"))
        .select(*keys,
                F.col("z.threshold").alias("threshold"),
                F.col("z.min_len").alias("min_len"),
                F.col("z.start_index").cast("long").alias("start_index"),
                F.col("z.end_index").cast("long").alias("end_index"),
                F.col("z.average_score").alias("average_score"))
    )


def find_islands_window(df: DataFrame,
                        keys: list[str],
                        score_col: str = "score",
                        smoothed_col: str = "smoothed",
                        threshold: float = DEFAULT_THRESHOLD,
                        min_island_length: int = DEFAULT_MIN_ISLAND_LENGTH,
                        above_threshold: bool = True) -> DataFrame:
    """The classic explode -> window -> groupBy gaps-and-islands
    restatement — one exchange on the keys. Kept as the independent
    twin the equivalence tests hold `find_islands` against (two
    implementations, one contract); production paths use the
    zero-shuffle array-domain form above."""
    cand = _candidates_expr(score_col, smoothed_col, threshold,
                            above_threshold)
    flagged = (
        df.select(*keys, F.explode(F.expr(cand)).alias("z"))
        .select(*keys, F.col("z.pos0").alias("pos0"),
                F.col("z.raw").alias("raw"))
    )
    w = Window.partitionBy(*keys).orderBy("pos0")
    grouped = flagged.withColumn(
        "island_grp", F.col("pos0") - F.row_number().over(w))
    return (
        grouped.groupBy(*keys, "island_grp")
        .agg(
            F.min("pos0").cast("long").alias("start_index"),
            F.max("pos0").cast("long").alias("end_index"),
            F.round(F.avg("raw"), SCORE_ROUND).alias("average_score"),
        )
        .filter(F.col("end_index") - F.col("start_index") >= min_island_length)
        .drop("island_grp")
    )


def with_word_range(islands: DataFrame,
                    ngram_size: int = DEFAULT_NGRAM_SIZE) -> DataFrame:
    """Score-index range -> 1-based word range: words [i+1, i+n]
    (reference `score_index_to_word_range`, build_islands_from_scores.py:119-126)."""
    return islands.withColumns({
        "word_start": (F.col("start_index") + 1).cast("long"),
        "word_end": (F.col("end_index") + ngram_size).cast("long"),
    })


def with_time_range(islands: DataFrame,
                    segments: DataFrame,
                    key: str,
                    pad_sec: float = TIME_PAD_SECONDS) -> DataFrame:
    """Map island word ranges to time ranges via an interval-overlap
    join against transcript segments (reference `word_range_to_time`,
    build_islands_from_scores.py:145-167).

    `segments` needs: key, seg_start_word, seg_end_word (1-based
    inclusive cumulative-word interval), start_sec, duration_sec.
    Overlap: seg_end_word >= word_start AND seg_start_word <= word_end;
    result time range = [min(start) - pad (floored at 0), max(start +
    duration) + pad]. The equi key keeps this a hash join; the range
    predicate is applied post-match (SURVEY §2.3 J6).
    """
    s = segments
    cond = (
        (islands[key] == s[key])
        & (s.seg_end_word >= islands.word_start)
        & (s.seg_start_word <= islands.word_end)
    )
    island_cols = [c for c in islands.columns]
    joined = islands.join(s, cond, "inner")
    return (
        joined.groupBy(*[islands[c] for c in island_cols])
        .agg(
            F.greatest(F.lit(0.0), F.min("start_sec") - pad_sec)
             .alias("time_start_sec"),
            (F.max(F.col("start_sec") + F.col("duration_sec")) + pad_sec)
             .alias("time_end_sec"),
        )
    )
