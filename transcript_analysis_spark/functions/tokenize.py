"""Tokenization modes for LM scoring (SURVEY §2.10 F2).

The engine's default contract is whitespace splitting (SURVEY §7.3:
deterministic, SQL-expressible, oracle-checkable). The reference
scores over `nltk.word_tokenize` + `pad_sequence`
(`client/async_processing_client.py:163-174`), so score arrays ported
from a live reference deployment are tokenized by the Penn Treebank
rules. This module provides that faithful mode WITHOUT an NLTK
dependency: `treebank_tokenize` implements the published Penn
Treebank tokenizer rule set (the public-domain `tokenizer.sed`
contract that NLTK's TreebankWordTokenizer also implements) in pure
Python, exposed as an Arrow-batched pandas UDF for the scoring path.

On punctuation-free text the two modes are identical (equivalence-
tested), so every oracle-checked query keeps the whitespace contract;
the treebank mode exists for parity with reference-produced data.
"""

from __future__ import annotations

import re

import pandas as pd

# Rule order follows the published PTB sed script: quotes, then
# punctuation, then contractions. Each entry is (compiled pattern,
# replacement) applied in sequence with spaces as the separator.
_STARTING_QUOTES = [
    (re.compile(r"^\""), r"`` "),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # final period: only split when it ends the string (possibly
    # followed by closing brackets/quotes) — internal periods as in
    # "U.S." or "3.14" stay attached
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_BRACKETS = [
    (re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
]

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

# MacIntyre contractions (the PTB special cases)
_CONTRACTIONS = [
    re.compile(r"(?i)\b(can)(?#X)(not)\b"),
    re.compile(r"(?i)\b(d)(?#X)('ye)\b"),
    re.compile(r"(?i)\b(gim)(?#X)(me)\b"),
    re.compile(r"(?i)\b(gon)(?#X)(na)\b"),
    re.compile(r"(?i)\b(got)(?#X)(ta)\b"),
    re.compile(r"(?i)\b(lem)(?#X)(me)\b"),
    re.compile(r"(?i)\b(mor)(?#X)('n)\b"),
    re.compile(r"(?i)\b(wan)(?#X)(na)\s"),
]


# Sentence-boundary splitter. The reference runs nltk.word_tokenize,
# which Punkt-splits sentences BEFORE applying the Treebank rules, so
# a sentence-INTERNAL final period must detach ("hello. world" ->
# ["hello", ".", "world"]). A boundary is a .!? terminator (optionally
# followed by closing quotes/brackets) followed by whitespace, unless
# the word before the terminator is a known abbreviation or a single
# letter (initials, "U.S."-style splits). Residual gap vs Punkt:
# Punkt LEARNS its abbreviation list and collocation statistics from
# the corpus unsupervised; this splitter uses a fixed common-English
# list, so a domain-specific abbreviation ("approx. two") over-splits
# here where a Punkt model trained on matching text might not.
_SENT_BOUNDARY = re.compile(
    r"(?:(?<=[.!?])|(?<=[.!?][\"'\)\]\}]))\s+")
_PRECEDING_WORD = re.compile(r"([\w.]+)[.!?][\"'\)\]\}]*$")
_ABBREVIATIONS = frozenset(
    "mr mrs ms dr prof rev sr jr st vs etc al inc ltd co corp fig "
    "no vol dept est approx min max sec hr".split())


def _split_sentences(text: str) -> list[str]:
    parts, last = [], 0
    for m in _SENT_BOUNDARY.finditer(text):
        head = _PRECEDING_WORD.search(text, 0, m.start())
        if head:
            w = head.group(1).rstrip(".").lower()
            if (w in _ABBREVIATIONS or (len(w) == 1 and w.isalpha())
                    or "." in w):  # dotted acronyms: U.S., i.e., Ph.D.
                continue
        parts.append(text[last:m.start()])
        last = m.end()
    parts.append(text[last:])
    return [p for p in parts if p]


def _ptb_tokenize_segment(text: str) -> list[str]:
    """The published PTB rule set applied to ONE sentence."""
    for pattern, sub in _STARTING_QUOTES:
        text = pattern.sub(sub, text)
    for pattern, sub in _PUNCTUATION:
        text = pattern.sub(sub, text)
    for pattern, sub in _BRACKETS:
        text = pattern.sub(sub, text)
    text = " " + text + " "
    for pattern, sub in _ENDING_QUOTES:
        text = pattern.sub(sub, text)
    for pattern in _CONTRACTIONS:
        text = pattern.sub(r" \1 \2 ", text)
    return text.split()


def treebank_tokenize(text: str) -> list[str]:
    """NLTK-word_tokenize-faithful tokenization: sentence-split first
    (so sentence-internal final periods detach, as Punkt+Treebank
    does), then the Penn Treebank rules per sentence — punctuation
    split off, contractions split (don't -> do n't), quotes converted
    to ``/'' pairs."""
    return [t for seg in _split_sentences(text)
            for t in _ptb_tokenize_segment(seg)]


def whitespace_tokenize(text: str) -> list[str]:
    """The engine's default oracle-checkable contract."""
    return text.split(" ") if text else []


TOKENIZERS = {
    "whitespace": whitespace_tokenize,
    "treebank": treebank_tokenize,
}


def tokenize_udf(mode: str = "whitespace"):
    """Arrow-batched tokenizer column: text -> array<string>.
    `mode` is resolved once at definition; the tokenizer callable
    ships to executors inside the UDF closure."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    tok = TOKENIZERS[mode]

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: tok(t) if t else [])

    return _tok
