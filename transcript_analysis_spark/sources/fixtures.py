"""Domain fixtures — the transcript/channel/video shapes of FIXTURES.md,
generated deterministically (seed 42).

These are the reference's own table shapes (`sql/schema.sql`): caption
segments with (start, duration, text, text_formatted, word_count,
cum_word_count), failure-marker rows (start = -1), videos without
transcripts — everything the incremental anti-join and the scoring
pipeline exercise. Used by tests (the DuckDB oracle only sees the
driver corpus, so these feed pytest-checked pipelines, mirroring the
reference's FakeModel/FakePool strategy, `test_support.py:85-188`).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, LongType, StringType,
                               StructField, StructType)

VOCAB = ("the quick brown fox jumps over lazy dog and then runs far "
         "away to find some food in deep dark forest near old river "
         "bank where tall trees grow very fast every spring").split()

SEGMENT_SCHEMA = StructType([
    StructField("vid_id", LongType()),
    StructField("start", DoubleType()),
    StructField("duration", DoubleType()),
    StructField("text", StringType()),
    StructField("text_formatted", StringType()),
    StructField("word_count", IntegerType()),
    StructField("cum_word_count", IntegerType()),
])

VIDEO_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("channel_id", LongType()),
    StructField("yt_vid_id", StringType()),
])

FAILURE_TEXT = "No transcript available"   # maintain_database.py:513


def make_fixtures(spark: SparkSession, n_channels: int = 4,
                  n_videos: int = 40, seed: int = 42
                  ) -> tuple[DataFrame, DataFrame]:
    """Returns (videos, segments).

    Per FIXTURES.md: ~10% of videos have no transcript rows (pending
    anti-join), ~5% only the failure-marker row (start=-1, word_count
    0); the rest get 5-20 segments of 3-9 words with exact running
    cum_word_count.
    """
    rng = random.Random(seed)
    videos = [(v, v % n_channels + 1, f"vid{v:08d}xyz"[:11])
              for v in range(1, n_videos + 1)]
    segments: list[tuple] = []
    for v, _, _ in videos:
        roll = rng.random()
        if roll < 0.10:
            continue  # no transcript at all
        if roll < 0.15:
            segments.append((v, -1.0, 0.0, FAILURE_TEXT, "", 0, 0))
            continue
        t, cum = 0.0, 0
        for _ in range(rng.randint(5, 20)):
            words = [rng.choice(VOCAB) for _ in range(rng.randint(3, 9))]
            raw = " ".join(words)
            # raw text carries the P1 normalization targets
            deco = f"[Music] {raw.capitalize()}," if rng.random() < 0.3 else raw
            dur = round(1.0 + rng.random() * 4.0, 2)
            cum += len(words)
            segments.append((v, round(t, 2), dur, deco, raw, len(words), cum))
            t += dur
    return (spark.createDataFrame(videos, VIDEO_SCHEMA),
            spark.createDataFrame(segments, SEGMENT_SCHEMA))


def assemble_transcripts(segments: DataFrame) -> DataFrame:
    """Ordered transcript assembly (A9, reference
    `client/async_processing_client.py:251-260`): valid segments only
    (P2/P4), ordered by cum_word_count, concatenated with the
    sort_array(collect_list(struct)) contract."""
    valid = segments.filter((F.col("start") >= 0) & (F.col("word_count") > 0))
    return (
        valid.groupBy("vid_id")
        .agg(F.expr(
            "concat_ws(' ', transform(array_sort(collect_list("
            "struct(cum_word_count, text_formatted))), s -> s.text_formatted))")
            .alias("text"),
            F.max("cum_word_count").alias("total_words"))
    )
