"""F2 tokenizer modes: the NLTK-faithful Penn Treebank tokenizer vs
the engine's whitespace contract (SURVEY §7.3; reference
`client/async_processing_client.py:163-174`)."""

from __future__ import annotations

from transcript_analysis_spark.functions.tokenize import (
    treebank_tokenize, whitespace_tokenize)

SF_DIR = "/root/testdata/sf0.001"


def test_treebank_splits_contractions_and_punctuation():
    assert treebank_tokenize("don't stop.") == ["do", "n't", "stop", "."]
    assert treebank_tokenize("I'll go; you'll stay") == \
        ["I", "'ll", "go", ";", "you", "'ll", "stay"]
    assert treebank_tokenize("cannot gonna") == ["can", "not", "gon", "na"]


def test_treebank_quote_convention():
    assert treebank_tokenize('He said, "hello there!"') == \
        ["He", "said", ",", "``", "hello", "there", "!", "''"]


def test_treebank_keeps_internal_periods():
    # sentence-final period splits; internal abbreviation/number dots stay
    assert treebank_tokenize("pi is 3.14 today.") == \
        ["pi", "is", "3.14", "today", "."]


def test_treebank_splits_sentence_internal_final_periods():
    """nltk.word_tokenize Punkt-splits sentences before the PTB rules,
    so a period ending a sentence MID-string detaches too — the normal
    case for multi-sentence transcripts."""
    assert treebank_tokenize("hello. world") == ["hello", ".", "world"]
    assert treebank_tokenize("First sentence! Second one? Third.") == \
        ["First", "sentence", "!", "Second", "one", "?", "Third", "."]


def test_treebank_sentence_split_spares_abbreviations():
    # fixed abbreviation list + single initials + dotted acronyms are
    # NOT sentence boundaries (documented residual gap vs Punkt: the
    # list is fixed, not corpus-learned)
    assert treebank_tokenize("Mr. Smith went home. Then he slept.") == \
        ["Mr.", "Smith", "went", "home", ".", "Then", "he", "slept", "."]
    assert treebank_tokenize("the U.S. team won. great") == \
        ["the", "U.S.", "team", "won", ".", "great"]


def test_modes_agree_on_punctuation_free_text(spark):
    docs = [r.text for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").limit(50).collect()]
    checked = 0
    for t in docs:
        if any(c in t for c in ".,;:!?\"'()[]{}"):
            continue
        assert treebank_tokenize(t) == whitespace_tokenize(t), t[:80]
        checked += 1
    assert checked > 0, "corpus sample had no punctuation-free docs"


def test_tokenize_udf_column_matches_python(spark):
    """The standalone tokenizer column (corpus-prep surface) must
    produce exactly what the pure-Python tokenizer produces."""
    from transcript_analysis_spark.functions.tokenize import tokenize_udf
    texts = ["don't stop.", "plain words only", 'say "hi" now!']
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "text"])
    got = {r.i: r.toks for r in
           df.select("i", tokenize_udf("treebank")("text").alias("toks"))
           .collect()}
    assert got == {i: treebank_tokenize(t) for i, t in enumerate(texts)}


def test_scoring_equivalent_on_clean_text_divergent_on_punctuated(spark):
    from transcript_analysis_spark.operators.scoring import (
        NGramModel, score_with_broadcast_model)
    clean = "the quick brown fox jumps over the lazy dog"
    punct = "the quick, brown fox can't jump."
    model = NGramModel.train([clean.split(" "), punct.split(" ")])
    docs = spark.createDataFrame(
        [(1, clean), (2, punct)], ["doc_id", "text"])
    ws = {r.doc_id: r.score for r in
          score_with_broadcast_model(docs, model).collect()}
    tb = {r.doc_id: r.score for r in
          score_with_broadcast_model(docs, model,
                                     tokenizer="treebank").collect()}
    # punctuation-free doc: identical score arrays under both modes
    assert ws[1] == tb[1]
    # punctuated doc: treebank yields MORE tokens (split punctuation),
    # so the score arrays must differ in length
    assert len(tb[2]) > len(ws[2])
