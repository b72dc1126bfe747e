"""N-gram model scoring — both designs from SURVEY §7.4.

Option A (primary, used by plans/domain.ngram_model_score): models as
DATA — `(model_id, ngram..., logprob)` count tables; scoring is a
co-partitioned join with a back-off coalesce chain. Scales to 9,511
models x 73k transcripts because no executor ever materializes a
model: the pair matrix shuffles on the n-gram key.

Option B (here): the faithful fallback — one in-memory model per job,
broadcast to executors, scored by an Arrow-vectorized pandas UDF.
This mirrors the reference's hot loop
(`model.score(word, context)`, `client/async_processing_client.py:177-179`)
including the `<s>`-padding and sliding-window prep
(`prep_transcript`/`build_transcript_items`, :163-174), but without
NLTK: the model is a plain dict {(context, word): logprob} with
stupid-backoff — the contract SURVEY §7.3 defines. Use only when a
model genuinely cannot be expressed as a table (bounded by executor
memory — the exact limitation that motivates Option A).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

N_GRAM_SIZE = 4          # client/async_processing_client.py:50 (N_GRAM_SIZE)
PAD_TOKEN = "<s>"        # pad_sequence left-pad, :163-165
BACKOFF_ALPHA = 0.4      # stupid backoff
FLOOR_LOGPROB = -7.0


class NGramModel:
    """Picklable n-gram model: ngram-tuple -> logprob, with
    stupid-backoff scoring. The broadcast-able stand-in for the
    reference's 480 MB pickled NLTK LM (`model_table.model_data`,
    `sql/schema.sql:85-90`).

    `floor` is the all-orders-missed score: FLOOR_LOGPROB for MLE /
    absolute-discount training (the reference contract), or the
    smoothing's own unknown-word mass for Lidstone — flat, with no
    backoff penalty (the alpha penalty models backing off between
    OBSERVED orders; an unseen word never entered any order)."""

    def __init__(self, logprobs: dict[tuple[str, ...], float],
                 floor: float = FLOOR_LOGPROB):
        self.logprobs = logprobs
        self.floor = floor

    @classmethod
    def train(cls, corpus: list[list[str]], n: int = N_GRAM_SIZE,
              smoothing: str = "mle", gamma: float = 0.5,
              discount: float = 0.75) -> "NGramModel":
        """Counts for orders 1..n with left-padding, log10 probs.

        `smoothing` selects the probability estimate — the knob the
        reference's pickled NLTK LMs bake in at training time
        (`client/async_processing_client.py:177-179`), so imported
        models and in-engine training can be made to MATCH
        (round-trip-tested in tests/test_sinks_scoring_external.py):

        - "mle":      c / denom (the SURVEY §7.3 default contract);
        - "lidstone": (c + gamma) / (denom + gamma * V) with V the
          unigram vocabulary size (NLTK Lidstone/Laplace family;
          gamma=1 is Laplace). Sets `floor` to the unknown mass
          log10(gamma / (total + gamma * V));
        - "absolute": (c - discount) / denom for every observed gram
          (0 < discount < 1, so counts of 1 keep positive mass); the
          freed mass is served by the existing stupid-backoff chain
          rather than an interpolated lower-order term.
        """
        if smoothing not in ("mle", "lidstone", "absolute"):
            raise ValueError(f"unknown smoothing: {smoothing!r}")
        counts: dict[tuple[str, ...], int] = {}
        ctx_counts: dict[tuple[str, ...], int] = {}
        total = 0
        vocab: set[str] = set()
        for words in corpus:
            padded = [PAD_TOKEN] * (n - 1) + words
            total += len(words)
            vocab.update(words)
            for order in range(1, n + 1):
                for i in range(n - 1, len(padded)):
                    gram = tuple(padded[i - order + 1:i + 1])
                    counts[gram] = counts.get(gram, 0) + 1
                    ctx_counts[gram[:-1]] = ctx_counts.get(gram[:-1], 0) + 1
        logprobs = {}
        v = len(vocab)
        for gram, c in counts.items():
            denom = ctx_counts[gram[:-1]] if gram[:-1] else total
            if smoothing == "lidstone":
                p = (c + gamma) / (denom + gamma * v)
            elif smoothing == "absolute":
                p = (c - discount) / denom
            else:
                p = c / denom
            logprobs[gram] = round(math.log10(p), 9)
        floor = FLOOR_LOGPROB
        if smoothing == "lidstone" and (total > 0 or v > 0):
            # empty corpus: total == v == 0 would divide by zero; the
            # other modes degrade to an empty model, so must this one
            floor = round(math.log10(gamma / (total + gamma * v)), 9)
        return cls(logprobs, floor=floor)

    def score(self, word: str, context: tuple[str, ...]) -> float:
        """Stupid-backoff: try (ctx, word), back off to shorter
        contexts with an alpha penalty, floor at `self.floor`."""
        penalty = 0.0
        for start in range(len(context) + 1):
            gram = tuple(context[start:]) + (word,)
            lp = self.logprobs.get(gram)
            if lp is not None:
                return round(lp + penalty, 9)
            penalty += math.log10(BACKOFF_ALPHA)
        return getattr(self, "floor", FLOOR_LOGPROB)

    def score_words(self, words: list[str], n: int = N_GRAM_SIZE) -> list[float]:
        """Per-word score array — one score per word, context = the
        n-1 preceding (padded) tokens; mirrors
        `build_transcript_items` + `score_transcript_items`
        (`client/async_processing_client.py:168-179`)."""
        padded = [PAD_TOKEN] * (n - 1) + words
        return [self.score(padded[i], tuple(padded[i - n + 1:i]))
                for i in range(n - 1, len(padded))]


def ngram_table(spark, model: NGramModel) -> DataFrame:
    """Option A's model representation: the model AS a DataFrame of
    (ngram key, order, logprob) rows — what `model_table.model_data
    BYTEA` becomes when pickles are abandoned for tables (the
    reference's own roadmap direction, `ROADMAP.md:61-66`)."""
    rows = [(" ".join(gram), len(gram), lp)
            for gram, lp in model.logprobs.items()]
    from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                                   StructField, StructType)
    schema = StructType([
        StructField("ngram_key", StringType()),
        StructField("ngram_order", IntegerType()),
        StructField("logprob", DoubleType()),
    ])
    return spark.createDataFrame(rows, schema)


def score_with_ngram_table(docs: DataFrame, table: DataFrame,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           n: int = N_GRAM_SIZE,
                           out_col: str = "score",
                           floor: float = FLOOR_LOGPROB) -> DataFrame:
    """Option A scoring: explode per-word n-gram keys, LEFT JOIN the
    model table once per back-off order, coalesce down the chain with
    accumulated alpha penalties, reassemble the per-word score array
    with the ordered-collect contract (SURVEY §7.3).

    Produces bit-identical scores to
    `score_with_broadcast_model` (equivalence-tested) — the same
    contract, executed as distributed joins instead of a broadcast
    model. At production scale the table is partitioned/bucketed by
    ngram_key and no executor holds a model."""
    # per-position keys for orders n..1 over the <s>-padded token array
    keys_struct = ", ".join(
        f"concat_ws(' ', slice(padded, i + {n + 1 - k}, {k})) as k{k}"
        for k in range(1, n + 1))
    exploded = (
        docs.select(
            id_col,
            F.expr(f"concat(array_repeat('{PAD_TOKEN}', {n - 1}),"
                   f" split({text_col}, ' '))").alias("padded"),
            F.expr(f"size(split({text_col}, ' '))").alias("nw"))
        .select(id_col, F.explode(F.expr(
            f"transform(sequence(0, nw - 1),"
            f" i -> struct(i as pos, {keys_struct}))")).alias("z"))
        .select(id_col, "z.*")
    )
    # accumulated penalties exactly as NGramModel.score accumulates them
    penalties = [0.0]
    for _ in range(n - 1):
        penalties.append(penalties[-1] + math.log10(BACKOFF_ALPHA))
    joined = exploded
    for k in range(n, 0, -1):
        tk = (table.filter(F.col("ngram_order") == k)
              .select(F.col("ngram_key").alias(f"k{k}"),
                      F.col("logprob").alias(f"lp{k}")))
        joined = joined.join(tk, f"k{k}", "left")
    branches = [
        F.when(F.col(f"lp{k}").isNotNull(),
               F.round(F.col(f"lp{k}") + F.lit(penalties[n - k]), 9))
        for k in range(n, 0, -1)
    ]
    score = F.coalesce(*branches, F.lit(floor))
    scored = joined.select(id_col, "pos", score.alias("s"))
    return (scored.groupBy(id_col)
            .agg(F.expr("transform(array_sort(collect_list(struct(pos, s))),"
                        " x -> x.s)").alias(out_col)))


def score_with_broadcast_model(docs: DataFrame, model: NGramModel,
                               text_col: str = "text",
                               out_col: str = "score",
                               tokenizer: str = "whitespace") -> DataFrame:
    """Option B: broadcast the model once, score word arrays with an
    Arrow-batched pandas UDF (vectorized transfer; model deserialized
    once per executor, not per row — the Spark form of the reference's
    LRU model cache, `client/async_processing_client.py:336-361`).

    `tokenizer="treebank"` is the NLTK-faithful mode (the reference
    scores over `word_tokenize`, `client/async_processing_client.py:
    163-174`); the default whitespace mode is the engine's
    oracle-checkable contract (SURVEY §7.3). The two agree on
    punctuation-free text — equivalence-tested — and a model trained
    under one tokenization must be scored under the same one."""
    from transcript_analysis_spark.functions.tokenize import TOKENIZERS
    tok = TOKENIZERS[tokenizer]
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(ArrayType(DoubleType()))
    def score_udf(texts: pd.Series) -> pd.Series:
        m = bc.value
        return texts.map(lambda t: m.score_words(tok(t)) if t else [])

    return docs.withColumn(out_col, score_udf(F.col(text_col)))
