"""Semantics tests for the pandas-operator surface (the rows-only
registry entries): greedy chunker invariants, multimodal plumbing.
"""

from __future__ import annotations

import pytest

from transcript_analysis_spark.operators import multimodal as mm
from transcript_analysis_spark.operators.chunking import (
    est_tokens, greedy_chunk_words, token_bounded_chunks)

SF_DIR = "/root/testdata/sf0.001"


# --- greedy chunker: pure-python core -----------------------------------

def test_greedy_chunker_partitions_words():
    words = [f"w{i:03d}" for i in range(137)]
    chunks = greedy_chunk_words(words, max_tokens=20, min_tail=5)
    # chunks tile the word range exactly, in order, no overlap
    assert chunks[0][0] == 1
    assert chunks[-1][1] == len(words)
    for (s1, e1, _, _), (s2, e2, _, _) in zip(chunks, chunks[1:]):
        assert s2 == e1 + 1
    # token budget respected (single oversized word is the only exception)
    for s, e, t, txt in chunks[:-1]:
        assert t <= 20
        assert txt == " ".join(words[s - 1:e])
    # token counts consistent
    for s, e, t, _ in chunks:
        assert t == sum(est_tokens(w) for w in words[s - 1:e])


def test_greedy_chunker_merges_small_tail():
    # 11 one-token words, budget 5 -> tail of 1 merges into previous
    words = ["ab"] * 11
    chunks = greedy_chunk_words(words, max_tokens=5, min_tail=3)
    assert chunks[-1][1] == 11
    assert all(len(c[3].split(" ")) == c[1] - c[0] + 1 for c in chunks)
    # no chunk smaller than min_tail except when it's the only one
    assert all(c[2] >= 3 for c in chunks)


def test_greedy_chunker_empty_and_single():
    assert greedy_chunk_words([], 10, 2) == []
    assert greedy_chunk_words(["hello"], 10, 2) == [(1, 1, 2, "hello")]


# --- grouped-map on Spark ----------------------------------------------

def test_token_bounded_chunks_spark(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    out = token_bounded_chunks(docs).collect()
    assert out
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_index)
        words = texts[doc_id].split(" ")
        assert chunks[0].start_word == 1
        assert chunks[-1].end_word == len(words)
        rebuilt = " ".join(c.text for c in chunks)
        assert rebuilt == texts[doc_id]


# --- multimodal ---------------------------------------------------------

def test_media_schema(spark):
    media = mm.synthetic_media(spark, SF_DIR)
    def shape(schema):  # names+types, ignoring nullability
        return [(f.name, f.dataType.simpleString()) for f in schema.fields]
    assert shape(media.schema) == shape(mm.MEDIA_SCHEMA)
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_deterministic(spark):
    media = mm.synthetic_media(spark, SF_DIR).limit(20)
    a = {r.media_id: r.features for r in mm.extract_features(media).collect()}
    b = {r.media_id: r.features for r in mm.extract_features(media).collect()}
    assert a == b
    assert all(len(v) == mm.FEATURE_DIM for v in a.values())
    # features are real numbers derived from payload bytes
    assert any(any(x != 0 for x in v) for v in a.values())


def test_real_codec_path_raises(spark):
    media = mm.synthetic_media(spark, SF_DIR).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.extract_features(media, use_real_codecs=True).collect()


def test_frame_samples_only_video(spark):
    media = mm.synthetic_media(spark, SF_DIR)
    frames = mm.sample_frames(media)
    video_ids = {r.media_id for r in
                 media.filter("kind = 'video'").select("media_id").collect()}
    got_ids = {r.media_id for r in frames.select("media_id").distinct().collect()}
    assert got_ids <= video_ids
    assert frames.count() > 0
