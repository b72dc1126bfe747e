"""Byte-pair-encoding merge learning as an iterative DataFrame loop.

BPE tokenizer training (Sennrich et al. 2016) is the canonical
iterative algorithm of a training-data pipeline that Spark has no
built-in for: repeatedly (1) count adjacent symbol pairs across the
vocabulary weighted by word frequency, (2) merge the most frequent
pair, (3) reapply. The scale shape mirrors how production BPE trainers
work on 100 TB corpora: ONE corpus-sized aggregate collapses the text
into a (word, frequency) vocabulary table, and every merge round then
runs on that vocabulary-sized table — corpus-size-INDEPENDENT, like
`operators/components.py`'s contraction loop.

Determinism contract: the winning pair each round is
(max weighted count, then lexicographically smallest (left, right)),
so the learned merge table is reproducible and is pinned against a
pure-Python reference implementation in tests — AND, as of round 6,
against a generated UNROLLED DuckDB oracle (plans/curation.py
`_duck_bpe_rounds`): recursion was never required, only unrolling,
with merge application expressed as boundary-anchored string replace
over separator-wrapped symbols. Both registered BPE queries are now
fully oracle-checked.

The merge application is a left-to-right greedy fold over each word's
symbol array (leftmost occurrence first, no overlap), the standard BPE
apply order, expressed as a JVM higher-order `aggregate` — no Python
in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def _sql_quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(left: str, right: str, merged: str) -> str:
    """Fold syms left-to-right, merging adjacent (left, right) into
    merged — leftmost-first, non-overlapping (a freshly merged symbol
    is never the left side of another merge in the same pass)."""
    a, b, ab = _sql_quote(left), _sql_quote(right), _sql_quote(merged)
    return (
        "aggregate(syms, cast(array() as array<string>),"
        " (acc, s) -> CASE"
        " WHEN size(acc) = 0 THEN array(s)"
        f" WHEN element_at(acc, -1) = '{a}' AND s = '{b}'"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array('{ab}'))"
        " ELSE concat(acc, array(s)) END)"
    )


def word_frequencies(docs: DataFrame) -> DataFrame:
    """(word, weight) vocabulary table — the one corpus-sized
    aggregate; everything after runs on vocabulary cardinality."""
    return (docs.select(F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("weight")))


def learn_bpe_merges(docs: DataFrame, n_merges: int = 10) -> list[Row]:
    """Learn `n_merges` BPE merges from a (doc_id, text) frame.

    Returns driver-side rows (rank, left, right, merged,
    weighted_count) — the merge table is O(n_merges) and is the
    decision sequence itself, so it lives on the driver like the
    loop that produced it."""
    spark = docs.sparkSession
    vocab = (word_frequencies(docs)
             .select(F.split("word", "").alias("syms"), "weight")
             .localCheckpoint(eager=True))

    merges: list[Row] = []
    for rank in range(1, n_merges + 1):
        pairs = (vocab.select(F.explode(F.expr(
            "CASE WHEN size(syms) >= 2 THEN"
            " transform(sequence(1, size(syms) - 1),"
            " i -> struct(element_at(syms, i) as l,"
            "             element_at(syms, i + 1) as r))"
            " ELSE array() END")).alias("p"), "weight")
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg(F.sum("weight").alias("weighted_count")))
        top = (pairs.orderBy(F.desc("weighted_count"), F.asc("left"),
                             F.asc("right"))
               .limit(1).collect())
        if not top:
            break
        t = top[0]
        merged = t["left"] + t["right"]
        merges.append(Row(rank=rank, left=t["left"], right=t["right"],
                          merged=merged,
                          weighted_count=int(t["weighted_count"])))
        vocab = (vocab.select(
            F.expr(_merge_expr(t["left"], t["right"], merged))
             .alias("syms"), "weight")
            .localCheckpoint(eager=True))
    return merges


def apply_bpe(docs: DataFrame, merges: list[Row]) -> DataFrame:
    """Encode every document with a learned merge table: per-word
    char split, merges applied in learned order, tokens counted.
    Map-only JVM array math over the corpus (the merge table is a
    constant folded into the expression tree — nothing broadcast,
    nothing shuffled)."""
    # fold each word's symbol array through every merge in order
    word_expr = "split(w, '')"
    for m in merges:
        a, b, ab = (_sql_quote(m["left"]), _sql_quote(m["right"]),
                    _sql_quote(m["merged"]))
        word_expr = (
            f"aggregate({word_expr}, cast(array() as array<string>),"
            " (acc, s) -> CASE"
            " WHEN size(acc) = 0 THEN array(s)"
            f" WHEN element_at(acc, -1) = '{a}' AND s = '{b}'"
            f" THEN concat(slice(acc, 1, size(acc) - 1), array('{ab}'))"
            " ELSE concat(acc, array(s)) END)")
    enc = docs.select("doc_id", F.expr(
        f"transform(filter(split(text, ' '), w -> w != ''),"
        f" w -> {word_expr})").alias("enc"))
    return enc.select(
        "doc_id",
        F.expr("cast(size(enc) as bigint)").alias("n_words"),
        F.expr("cast(aggregate(enc, 0,"
               " (a, toks) -> a + size(toks)) as bigint)")
         .alias("n_subword_tokens"),
        F.expr("cast(aggregate(enc, 0,"
               " (a, toks) -> a + size(filter(toks,"
               " t -> length(t) >= 2))) as bigint)")
         .alias("n_merged_tokens"),
    )
