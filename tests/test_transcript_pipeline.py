"""Reference entry point #1 end-to-end on transcript-shaped fixtures
(SURVEY §3.1): segments -> ordered assembly -> 4-gram scoring (both
model representations, proven equivalent) -> islands with real
segment time mapping.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from transcript_analysis_spark.operators import islands as isl
from transcript_analysis_spark.operators.scoring import (
    NGramModel, ngram_table, score_with_broadcast_model,
    score_with_ngram_table)
from transcript_analysis_spark.sources.fixtures import (FAILURE_TEXT,
                                                        assemble_transcripts,
                                                        make_fixtures)
from transcript_analysis_spark.streaming.windows import incremental_pending


def test_fixture_shapes(spark):
    videos, segments = make_fixtures(spark)
    assert videos.count() == 40
    # failure markers present, excluded by P4
    markers = segments.filter(F.col("start") == -1)
    assert markers.count() >= 1
    assert {r.text for r in markers.collect()} == {FAILURE_TEXT}
    # cum_word_count is an exact running sum (A8 re-derivation check)
    w = (Window.partitionBy("vid_id").orderBy("start")
         .rowsBetween(Window.unboundedPreceding, 0))
    valid = segments.filter(F.col("start") >= 0)
    rederived = valid.withColumn("cum2", F.sum("word_count").over(w))
    assert rederived.filter(F.col("cum2") != F.col("cum_word_count")).count() == 0


def test_pending_anti_join_on_fixtures(spark):
    """T1/J4 on the real shape: videos lacking any valid transcript."""
    videos, segments = make_fixtures(spark)
    have = (segments.filter((F.col("start") >= 0) & (F.col("word_count") > 0))
            .select(F.col("vid_id").alias("id")).distinct())
    pending = incremental_pending(videos.select("id"), have, ["id"])
    n_pending = pending.count()
    assert n_pending >= 1                      # some videos lack transcripts
    assert n_pending + have.count() == 40


def test_scoring_join_equals_broadcast(spark):
    """SURVEY §7.4: Option A (models as data, distributed join) must
    produce bit-identical score arrays to Option B (broadcast model +
    pandas UDF) — same contract, different physical plan."""
    videos, segments = make_fixtures(spark)
    transcripts = assemble_transcripts(segments).withColumnRenamed(
        "vid_id", "doc_id")
    corpus = [r.text.split(" ") for r in transcripts.limit(10).collect()]
    model = NGramModel.train(corpus)
    via_broadcast = {r.doc_id: r.score for r in
                     score_with_broadcast_model(transcripts, model)
                     .select("doc_id", "score").collect()}
    table = ngram_table(spark, model)
    via_join = {r.doc_id: r.score for r in
                score_with_ngram_table(transcripts, table)
                .select("doc_id", "score").collect()}
    assert via_join.keys() == via_broadcast.keys()
    for k in via_join:
        assert via_join[k] == via_broadcast[k], f"doc {k} diverges"
    # scores are one-per-word (scoring contract, FIXTURES.md)
    words = {r.doc_id: r.total_words for r in transcripts.collect()}
    for k, arr in via_join.items():
        assert len(arr) == words[k]


def test_full_pipeline_segments_to_islands(spark):
    """segments -> transcripts -> score arrays -> smooth -> islands ->
    time ranges from the REAL cum_word_count intervals (J6/W6)."""
    videos, segments = make_fixtures(spark)
    transcripts = assemble_transcripts(segments).withColumnRenamed(
        "vid_id", "doc_id")
    model = NGramModel.train(
        [r.text.split(" ") for r in transcripts.limit(10).collect()])
    scored = score_with_ngram_table(
        transcripts, ngram_table(spark, model)).withColumn(
        "model_id", F.lit(1))
    # logprobs are negative; islands finder supports lower-is-better via
    # above_threshold=False, but mirror the reference: smooth normalizes
    # by max, so shift scores positive first (exp10 = probability)
    probs = scored.withColumn(
        "score", F.expr("transform(score, x -> pow(10D, x))"))
    sm = isl.smooth_scores(probs, score_col="score", out_col="smoothed")
    found = isl.find_islands(sm, keys=["doc_id", "model_id"],
                             score_col="score", smoothed_col="smoothed",
                             min_island_length=3)
    ranged = isl.with_word_range(found)
    # segment word intervals from cum_word_count (prev cum + 1 = first word)
    w = Window.partitionBy("vid_id").orderBy("start")
    segs = (segments.filter((F.col("start") >= 0) & (F.col("word_count") > 0))
            .withColumn("prev_cum",
                        F.coalesce(F.lag("cum_word_count").over(w), F.lit(0)))
            .select(F.col("vid_id").alias("doc_id"),
                    (F.col("prev_cum") + 1).cast("long").alias("seg_start_word"),
                    F.col("cum_word_count").cast("long").alias("seg_end_word"),
                    F.col("start").alias("start_sec"),
                    F.col("duration").alias("duration_sec")))
    timed = isl.with_time_range(ranged, segs, key="doc_id")
    rows = timed.collect()
    assert rows, "pipeline produced no islands on fixture corpus"
    for r in rows:
        assert r.time_start_sec >= 0.0
        assert r.time_end_sec > r.time_start_sec
        assert r.word_start == r.start_index + 1
        assert r.word_end == r.end_index + 4


def test_fourgram_query_matches_python_model(spark):
    """Three-way validation: the in-query-trained fourgram_model_score
    (already oracle-checked vs DuckDB) must also equal the Python
    NGramModel trained on the same corpus with the same contract."""
    from transcript_analysis_spark.plans import all_queries
    sf = "/root/testdata/sf0.001"
    got = {r.doc_id: (r.avg_logprob, r.n_scored)
           for r in all_queries()["fourgram_model_score"].fn(spark, sf).collect()}
    docs = {r.doc_id: r.text.split(" ") for r in
            spark.read.parquet(f"{sf}/documents.parquet").collect()}
    model = NGramModel.train(list(docs.values()))
    for doc_id in list(docs)[:40]:
        scores = model.score_words(docs[doc_id])
        scaled = sum(int(round(s * 1e9)) for s in scores)
        exp = round(scaled / (len(scores) * 1e9), 6)
        assert got[doc_id][1] == len(scores)
        assert abs(got[doc_id][0] - exp) < 1e-9, (
            f"doc {doc_id}: query={got[doc_id][0]} python={exp}")
