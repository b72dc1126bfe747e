"""Chunkers — the reference's two chunking strategies (SURVEY §2.5 W7,
§2.10 F9), Spark-first.

1. Word-window chunking (`embed_transcripts_8values.py:61-73`): fixed
   window/stride — pure `sequence()`+`slice()` array ops, fully
   SQL-expressible (registered with an oracle in plans/domain.py as
   `word_window_chunks`).

2. Greedy token-bounded chunking
   (`embed_transcripts_to_vector_db.py:265-360`): accumulate segments
   until the token budget, split oversized segments, merge undersized
   tails. Inherently sequential per document -> grouped-map
   `applyInPandas` (cheap: one group = one document's segments), the
   pattern SURVEY §2.5 prescribes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType)

CHUNKS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("chunk_index", IntegerType()),
    StructField("start_word", IntegerType()),   # 1-based inclusive
    StructField("end_word", IntegerType()),     # 1-based inclusive
    StructField("n_tokens", IntegerType()),
    StructField("text", StringType()),
])


def est_tokens(word: str) -> int:
    """BPE-ish proxy: ceil(len/4) subword pieces
    (mirrors `embed_transcripts_to_vector_db.py:53-74`'s whitespace
    proxy contract; swap for a real tokenizer pandas_udf in prod)."""
    return max(1, -(-len(word) // 4))


def greedy_chunk_words(words: list[str], max_tokens: int = 60,
                       min_tail: int = 15) -> list[tuple[int, int, int, str]]:
    """Greedy accumulate words until > max_tokens, then cut; a final
    chunk smaller than min_tail merges into the previous one
    (reference merge-undersized-tail, `embed_transcripts_to_vector_db.py:330-346`).
    Returns (start_word, end_word, n_tokens, text) 1-based inclusive."""
    chunks: list[tuple[int, int, int, str]] = []
    start = 0
    toks = 0
    for i, w in enumerate(words):
        t = est_tokens(w)
        if toks + t > max_tokens and toks > 0:
            chunks.append((start + 1, i, toks, " ".join(words[start:i])))
            start, toks = i, 0
        toks += t
    if toks > 0:
        if chunks and toks < min_tail:
            ps, _, pt, _ = chunks[-1]
            chunks[-1] = (ps, len(words), pt + toks,
                          " ".join(words[ps - 1:]))
        else:
            chunks.append((start + 1, len(words), toks,
                           " ".join(words[start:])))
    return chunks


def token_bounded_chunks(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         max_tokens: int = 60,
                         min_tail: int = 15) -> DataFrame:
    """Grouped-map chunker: one pandas group per document. The group
    is tiny (one row in; the per-doc word list), so executor memory is
    bounded regardless of corpus size — the shuffle key is `doc_id`,
    which is unique, so skew is impossible."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            words = r[text_col].split(" ")
            for ci, (s, e, t, txt) in enumerate(
                    greedy_chunk_words(words, max_tokens, min_tail)):
                rows.append((r[id_col], ci, s, e, t, txt))
        return pd.DataFrame(rows, columns=[
            "doc_id", "chunk_index", "start_word", "end_word",
            "n_tokens", "text"])

    return (docs.select(id_col, text_col)
            .groupBy(id_col)
            .applyInPandas(run, CHUNKS_SCHEMA))
