"""Property tests for the engine's portable primitives: the
polynomial char hash / MinHash signatures against a pure-Python
mirror, and the integer half-up rounding against exact Fraction
arithmetic.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transcript_analysis_spark.functions.rounding import (duck_round_ratio,
                                                          spark_round_ratio)
from transcript_analysis_spark.plans.data_pipeline import (MINHASH_A,
                                                           MINHASH_B, MOD,
                                                           spark_char_hash)


def py_char_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % MOD
    return h


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(st.text(alphabet="abcdefg hij", min_size=1, max_size=40),
                      min_size=1, max_size=8))
def test_char_hash_matches_python(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "t"])
    got = {r.i: r.h for r in
           df.select("i", F.expr(spark_char_hash("t")).alias("h")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_char_hash(t)


def test_minhash_signature_matches_python(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(25)
    from transcript_analysis_spark.plans import all_queries
    sig = {r.doc_id: [getattr(r, f"mh{i}") for i in range(8)]
           for r in all_queries()["minhash_signatures"]
           .fn(spark, "/root/testdata/sf0.001").collect()}
    for r in docs.collect():
        words = r.text.split(" ")
        shingles = {" ".join(words[i:i + 3]) for i in range(len(words) - 2)}
        if not shingles:
            continue
        hs = [py_char_hash(sh) for sh in shingles]
        exp = [min((a * h + b) % MOD for h in hs)
               for a, b in zip(MINHASH_A, MINHASH_B)]
        assert sig[r.doc_id] == exp, f"doc {r.doc_id}"


def test_shingles_short_documents(spark, tmp_path):
    """Docs under 3 words must yield ZERO shingles, not crash:
    sequence(1, 0) in Spark is the DESCENDING [1, 0] and slice(words,
    0, 3) throws INVALID_PARAMETER_VALUE.START without the size guard
    (found by the round-1 advisor; latent in all MinHash/Jaccard
    queries on any short document)."""
    import pandas as pd

    from transcript_analysis_spark.plans.data_pipeline import _spark_shingles
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["one", "two words", "now three words", ""],
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
        "n_chars": [3, 9, 15, 0],
    })
    pdf.to_parquet(str(tmp_path / "documents.parquet"))
    rows = _spark_shingles(spark, str(tmp_path)).collect()
    got = {(r.doc_id, r.shingle) for r in rows}
    assert got == {(3, "now three words")}


def exact_round_half_up(n: int, d: int, digits: int) -> float:
    """Ground truth via Fraction: half-up (away from zero)."""
    s = 10 ** digits
    fr = Fraction(n, d) * s
    sign = -1 if fr < 0 else 1
    fr = abs(fr)
    q = fr.numerator // fr.denominator
    rem = fr - q
    if rem >= Fraction(1, 2):
        q += 1
    return sign * q / s


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(min_value=-10**9, max_value=10**9),
       d=st.integers(min_value=1, max_value=10**6),
       digits=st.sampled_from([2, 3, 4, 6]))
def test_round_ratio_matches_fraction(spark, n, d, digits):
    import duckdb
    row = (spark.range(1)
           .select(spark_round_ratio(str(n), str(d), digits).alias("v"))
           .first())
    exp = exact_round_half_up(n, d, digits)
    assert row.v == exp, f"spark {row.v} != {exp} for {n}/{d}@{digits}"


def test_round_ratio_duck_equals_spark_on_boundaries(spark):
    import duckdb
    con = duckdb.connect()
    cases = [(8149, 16000, 6), (65192, 128000, 6), (-8149, 16000, 6),
             (1, 3, 6), (5, 2, 2), (-5, 2, 2), (509313, 1000000, 6),
             (1, 16, 4), (3, 32, 4), (7, 128, 6)]
    for n, d, k in cases:
        sv = (spark.range(1)
              .select(spark_round_ratio(str(n), str(d), k).alias("v"))
              .first().v)
        dv = con.execute(
            f"SELECT {duck_round_ratio(str(n), str(d), k)}").fetchone()[0]
        assert sv == dv == exact_round_half_up(n, d, k), (n, d, k, sv, dv)


def test_round_ratio_wide_overflow_regime(spark):
    """The int64-overflow regime the ADVICE flagged: with
    w_q = round(sqrt(tokens)*1e6), 2*(w_q*budget)*1e6 exceeds int64
    once tokens > ~53k. The wide (DECIMAL(38,0)/HUGEINT) variants must
    stay exact there — checked three-way vs Fraction ground truth —
    while also agreeing with the bigint variants in the small regime.
    """
    import duckdb
    from transcript_analysis_spark.functions.rounding import (
        duck_round_ratio_wide, spark_round_ratio_wide)
    con = duckdb.connect()
    B = 20_000
    # tokens per source: small regime, just past the int64 cliff,
    # sf1-ish, and a 100TB-ish 10^13-token source
    for tokens, wsum_sources in [(1_000, 5), (60_000, 5),
                                 (5_000_000, 7), (10**13, 12)]:
        import math
        w_q = round(math.sqrt(tokens) * 1e6)
        wsum = w_q * wsum_sources          # symmetric sources
        n, d = w_q * B, wsum * tokens
        exp = exact_round_half_up(n, d, 6)
        sv = (spark.range(1)
              .select(spark_round_ratio_wide(
                  f"cast({w_q} as decimal(38,0)) * {B}",
                  f"cast({wsum} as decimal(38,0)) * {tokens}", 6)
                  .alias("v")).first().v)
        dv = con.execute(
            "SELECT " + duck_round_ratio_wide(
                f"CAST({w_q} AS HUGEINT) * {B}",
                f"CAST({wsum} AS HUGEINT) * {tokens}", 6)).fetchone()[0]
        assert sv == dv == exp, (tokens, sv, dv, exp)


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(min_value=-10**27, max_value=10**27),
       d=st.integers(min_value=1, max_value=10**27),
       digits=st.sampled_from([2, 4, 6]))
def test_round_ratio_wide_matches_fraction(spark, n, d, digits):
    """Property check across 128-bit magnitudes (quotient capped to
    int64 by construction: |n/d| <= 10^6 here)."""
    from transcript_analysis_spark.functions.rounding import (
        spark_round_ratio_wide)
    if abs(n) // d > 10**6:        # keep the rounded quotient in int64
        n = n % (d * 10**6 + 1)
    sv = (spark.range(1)
          .select(spark_round_ratio_wide(
              f"cast({n} as decimal(38,0))",
              f"cast({d} as decimal(38,0))", digits).alias("v"))
          .first().v)
    assert sv == exact_round_half_up(n, d, digits), (n, d, digits, sv)
