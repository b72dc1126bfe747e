"""Property-based tests (hypothesis): the Spark operators against
independent pure-Python/NumPy references on arbitrary inputs.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StructField,
                               StructType)

from tests.test_islands import SCHEMA, ref_find_islands, ref_smooth
from transcript_analysis_spark.operators import islands as isl
from transcript_analysis_spark.operators.chunking import (est_tokens,
                                                          greedy_chunk_words)

# one shared spark session comes from conftest; hypothesis drives data


scores_strategy = st.lists(
    st.one_of(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        st.just(float("nan")),
        st.just(float("inf")),
    ),
    min_size=1, max_size=120,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(arrays=st.lists(scores_strategy, min_size=1, max_size=6))
def test_islands_match_numpy_reference(spark, arrays):
    rows = [(i, 0, [float(x) for x in arr]) for i, arr in enumerate(arrays)]
    df = spark.createDataFrame(rows, SCHEMA)
    sm = isl.smooth_scores(df, score_col="score", out_col="smoothed")
    found = isl.find_islands(sm, keys=["vid_id", "model_id"],
                             score_col="score", smoothed_col="smoothed")
    got: dict[int, list] = {}
    rows_array = found.collect()
    for r in rows_array:
        got.setdefault(r.vid_id, []).append((r.start_index, r.end_index))
    for v in got.values():
        v.sort()
    for i, arr in enumerate(arrays):
        exp = ref_find_islands(contract_smooth(arr))
        assert got.get(i, []) == exp, (
            f"array {i}: got {got.get(i, [])}, expected {exp}")
    # same random inputs through the window-restatement twin: all three
    # implementations (array-domain, window, numpy reference) must agree
    # — average_score bit-for-bit too (repr distinguishes nan / -0.0)
    twin = isl.find_islands_window(sm, keys=["vid_id", "model_id"],
                                   score_col="score",
                                   smoothed_col="smoothed").collect()
    norm = lambda rs: sorted(tuple(repr(v) for v in r) for r in rs)  # noqa: E731
    assert norm(map(tuple, rows_array)) == norm(map(tuple, twin))


def contract_smooth(values, size=10, sigma=5):
    """NumPy mirror of the ENGINE's documented rounding contract
    (operators/islands.py): convolution rounded to 9dp BEFORE
    max-normalization, normalized values rounded to 9dp. This differs
    from the reference only for pathological magnitudes (< 5e-10),
    where the engine deliberately treats scores as zero."""
    x = np.arange(-size, size + 1, dtype=float)
    kernel = np.exp(-(x ** 2) / (2 * sigma ** 2))
    v = np.asarray(values, dtype=float)
    v = np.where(np.isfinite(v), v, 0.0)
    padded = np.concatenate((np.zeros(size), v, np.zeros(size)))
    conv = np.round(np.convolve(padded, kernel, mode="valid"), 9)
    m = conv.max()
    if m > 0:
        conv = np.round(conv / m, 9)
    return conv


words_strategy = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=12),
    min_size=0, max_size=300)


@settings(max_examples=50, deadline=None)
@given(words=words_strategy,
       max_tokens=st.integers(min_value=4, max_value=80),
       min_tail=st.integers(min_value=1, max_value=10))
def test_chunker_invariants(words, max_tokens, min_tail):
    chunks = greedy_chunk_words(words, max_tokens=max_tokens,
                                min_tail=min_tail)
    if not words:
        assert chunks == []
        return
    # tiles the doc exactly
    assert chunks[0][0] == 1
    assert chunks[-1][1] == len(words)
    for (s1, e1, _, _), (s2, e2, _, _) in zip(chunks, chunks[1:]):
        assert s2 == e1 + 1
    for s, e, t, txt in chunks:
        assert txt == " ".join(words[s - 1:e])
        assert t == sum(est_tokens(w) for w in words[s - 1:e])
    # budget: every non-final chunk within budget unless a single word
    # exceeds it; final chunk may exceed only via tail-merge
    for s, e, t, _ in chunks[:-1]:
        assert t <= max_tokens or s == e


# --- tokenizer mode properties ------------------------------------------

word_strategy = st.text(alphabet="abcdefghijklmnopqrstuvwxyz",
                        min_size=1, max_size=10)


@settings(max_examples=50, deadline=None)
@given(words=st.lists(word_strategy, min_size=1, max_size=30))
def test_treebank_equals_whitespace_on_clean_words(words):
    """On punctuation-free lowercase words, the NLTK-faithful mode
    must be EXACTLY the whitespace contract (this is the equivalence
    that lets every oracle keep whitespace tokenization)."""
    from transcript_analysis_spark.functions.tokenize import (
        treebank_tokenize, whitespace_tokenize)
    text = " ".join(words)
    assert treebank_tokenize(text) == whitespace_tokenize(text)


@settings(max_examples=30, deadline=None)
@given(words=st.lists(word_strategy, min_size=1, max_size=15))
def test_treebank_contraction_roundtrip(words):
    """Appending a contraction always splits exactly one extra token
    off the final word."""
    from transcript_analysis_spark.functions.tokenize import \
        treebank_tokenize
    base = " ".join(words)
    toks = treebank_tokenize(base + " can't")
    assert toks[-2:] == ["ca", "n't"]
    assert toks[:-2] == base.split(" ")


# --- ARPA round-trip property -------------------------------------------

@settings(max_examples=15, deadline=None)
@given(corpus=st.lists(
    st.lists(word_strategy, min_size=1, max_size=8),
    min_size=1, max_size=6))
def test_arpa_roundtrip_preserves_logprobs(corpus, tmp_path_factory):
    """Train → ARPA text → parse: the model table must carry every
    (ngram, logprob) bit-for-bit (float repr round-trips losslessly)."""
    import pyarrow.parquet as pq

    from transcript_analysis_spark.operators.scoring import NGramModel
    from transcript_analysis_spark.sources import model_import as mi
    model = NGramModel.train(corpus)
    d = tmp_path_factory.mktemp("arpa")
    arpa, out = str(d / "m.arpa"), str(d / "m.parquet")
    mi.export_model_arpa(model, arpa)
    n = mi.import_arpa_model(arpa, model_id=1, out_path=out)
    assert n == len(model.logprobs)
    tbl = pq.read_table(out).to_pylist()
    got = {(r["ngram_key"], r["ngram_order"]): r["logprob"] for r in tbl}
    exp = {(" ".join(g), len(g)): lp for g, lp in model.logprobs.items()}
    assert got == exp


# --- ingest primitives (pure Python, no Spark needed) -------------------

cue_text_strategy = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=" ,.!?'"),
    min_size=1, max_size=60).filter(
        lambda s: s.strip() and "-->" not in s
        and not s.strip().isdigit()
        and not s.strip().startswith(("WEBVTT", "Kind:")))


@settings(max_examples=50, deadline=None)
@given(cues=st.lists(
    st.tuples(cue_text_strategy,
              st.integers(min_value=0, max_value=9_000_000),   # start ms
              st.integers(min_value=1, max_value=600_000)),    # duration ms
    min_size=1, max_size=20))
@example(
    cues=[('0  0', 0, 1)],
).via('discovered failure')
def test_vtt_render_parse_roundtrip(cues):
    """Any cue list survives render -> parse with text exact and
    timings to the millisecond (the parser is the reference's own
    fallback grammar — a lossy parse would silently corrupt every
    fallback transcript)."""
    from transcript_analysis_spark.sources.ingest import parse_vtt_text

    def ts(ms: int) -> str:
        h, rem = divmod(ms, 3_600_000)
        m, rem = divmod(rem, 60_000)
        return f"{h:02d}:{m:02d}:{rem / 1000:06.3f}"

    lines = ["WEBVTT", "Kind: captions", ""]
    expected = []
    for n, (text, start_ms, dur_ms) in enumerate(cues, 1):
        lines += [str(n), f"{ts(start_ms)} --> {ts(start_ms + dur_ms)}",
                  text, ""]
        expected.append((" ".join(text.split()),
                         start_ms / 1000, dur_ms / 1000))
    parsed = parse_vtt_text("\n".join(lines))
    assert len(parsed) == len(expected)
    for (pt, ps, pdur), (et, es, ed) in zip(parsed, expected):
        # parser joins multi-line cue text with single spaces
        assert pt == " ".join(et.split())
        assert abs(ps - es) < 1e-6
        assert abs(pdur - ed) < 1e-6


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_format_segment_text_contracts(s):
    """Normalization invariants on arbitrary input: idempotent,
    lowercase, never leaves punctuation, word_count consistent."""
    from transcript_analysis_spark.sources.ingest import format_segment_text
    t, wc = format_segment_text(s)
    t2, wc2 = format_segment_text(t)
    assert (t2, wc2) == (t, wc)            # idempotent
    assert t == t.lower()
    assert wc == len(t.split())


def ref_pack(tokens: list[int], budget: int) -> list[tuple[int, int]]:
    """Pure-Python greedy next-fit: (seq_no, seq_offset) per item."""
    out = []
    seq, fill = 0, 0
    for t in tokens:
        if fill > 0 and fill + t > budget:
            seq, fill = seq + 1, 0
        out.append((seq, fill))
        fill += t
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.tuples(st.sampled_from(["en", "de"]),
              st.integers(min_value=1, max_value=300)),
    min_size=1, max_size=80))
def test_sequence_packing_matches_python_reference(spark, docs):
    """The grouped-map packer against the pure-Python walk on
    arbitrary (lang, n_tokens) streams — including docs far over the
    budget."""
    from transcript_analysis_spark.plans.scale_ops import PACK_BUDGET_TOKENS

    rows = [(lang, i, "w " * max(1, t))   # text with exactly t words
            for i, (lang, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    # drives the REAL grouped-map body the registered queries use
    import pandas as pd
    from pyspark.sql import functions as F

    sized = df.select("lang", "doc_id",
                      F.size(F.split(F.trim("text"), " ")).cast("long")
                       .alias("n_tokens"))

    from transcript_analysis_spark.plans.scale_ops import greedy_pack_pandas

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return greedy_pack_pandas(pdf)[
            ["lang", "doc_id", "n_tokens", "seq_no", "seq_offset"]]

    got = (sized.groupBy("lang").applyInPandas(
        pack, "lang string, doc_id long, n_tokens long, "
              "seq_no long, seq_offset long").collect())

    per_lang: dict[str, list] = {}
    for i, (lang, t) in enumerate(docs):
        per_lang.setdefault(lang, []).append((i, t))
    expect = {}
    for lang, items in per_lang.items():
        items.sort()
        packed = ref_pack([t for _, t in items], PACK_BUDGET_TOKENS)
        for (doc_id, t), (s, o) in zip(items, packed):
            expect[(lang, doc_id)] = (t, s, o)
    assert len(got) == len(expect)
    for r in got:
        assert expect[(r["lang"], r["doc_id"])] == (
            r["n_tokens"], r["seq_no"], r["seq_offset"])
