"""Overflow-regime canaries for the wide-decimal algebra (r10 verdict
item 4).

The repo documents exact breach boundaries for its DECIMAL(38,0)
members (power_iteration_top_pc's corpus sums, classifier_kappa_report's
n^2 rational, calibration_report's probe_swing cross-multiplication)
but the scale sweeps only run to 64x. These canaries prove, with
synthetic literals pinned JUST BELOW and JUST ABOVE each documented
limit, that

  (a) the math stays EXACT below the boundary (vs Python's unbounded
      integers as the oracle), and
  (b) past the boundary the engine fails LOUDLY — Spark 4's ANSI mode
      raises NUMERIC_VALUE_OUT_OF_RANGE — never a silent wrap or NULL.

(b) depends on `spark.sql.ansi.enabled` staying true (the Spark 4
default; the session factory does not override it). If a future
config change turned ANSI off, decimal overflow would return NULL
(non-ANSI semantics) and these canaries fail — which is the point:
the wide algebra's "cannot wrap silently" claim would no longer hold.

Boundary arithmetic used below (spark_round_ratio_wide, digits=k):
the widest intermediate is 2*|n|*10^k + d in DECIMAL(38,0), so the
breach sits at |n| ~= 10^38 / (2*10^k).
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from transcript_analysis_spark.functions.rounding import (
    spark_round_ratio_wide)

OVERFLOW_MARKER = "NUMERIC_VALUE_OUT_OF_RANGE"


def _round_half_up(fr: Fraction, digits: int) -> float:
    """Python-integer oracle for the engines' half-up ratio rounding."""
    s = 10 ** digits
    n, d = fr.numerator, fr.denominator
    sign = -1 if n < 0 else 1
    return sign * ((2 * abs(n) * s + d) // (2 * d)) / s


def test_ansi_mode_is_on_so_overflow_is_loud(spark):
    """The regime pin: ANSI enabled (Spark 4 default, relied on by
    every wide-decimal docstring's 'cannot wrap silently' claim), and
    a DECIMAL(38,0) crossing 38 digits raises — it does not wrap and
    does not NULL."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with pytest.raises(Exception, match=OVERFLOW_MARKER):
        spark.sql(
            "SELECT CAST(99999999999999999999999999999999999999"
            " AS DECIMAL(38,0)) * CAST(10 AS DECIMAL(38,0)) AS r"
        ).collect()


def test_wide_corpus_sum_regime_boundary(spark):
    """power_iteration_top_pc's _wide regime (plans/sketches.py): the
    only unbounded accumulation is the corpus-sum of per-row int64
    dots in DECIMAL(38,0). Exact at 10^38 - 9 (nine rows of
    1.11e37); one more row crosses 10^38 and must raise, not wrap."""
    term = "11100000000000000000000000000000000000"  # 1.11e37
    below = spark.range(9).selectExpr(
        f"CAST({term} AS DECIMAL(38,0)) AS v")
    [row] = below.selectExpr("CAST(SUM(v) AS STRING) AS s").collect()
    assert row.s == "99900000000000000000000000000000000000"  # exact
    above = spark.range(10).selectExpr(
        f"CAST({term} AS DECIMAL(38,0)) AS v")
    with pytest.raises(Exception, match=OVERFLOW_MARKER):
        above.selectExpr("SUM(v) AS s").collect()


def test_kappa_rational_boundary(spark):
    """classifier_kappa_report (plans/curation.py): kappa cleared of
    denominators is (n*agree - ap*pp - an*pn) / (n^2 - ap*pp - an*pn),
    rounded wide at 6 digits. Products of two int64 counts always fit
    DECIMAL(38,0) (max 8.5e37 < 1e38), so the member's true boundary
    is the ROUNDING multiply: 2*|num|*10^6 <= 1e38 -> |num| <= 5e31,
    i.e. n_total ~ 1.1e16 docs for a balanced matrix (num = 0.4*n^2
    below). Measured here: exact at n = 9.6e15, loud at n = 1.2e16."""
    def kappa_df(n: int):
        ap = pp = an = pn = n // 2
        agree = (n * 9) // 10
        return spark.createDataFrame(
            [(n, agree, ap, pp, an, pn)],
            "n long, agree long, ap long, pp long, an long, pn long")

    num = ("cast(n as decimal(38,0)) * agree"
           " - cast(ap as decimal(38,0)) * pp"
           " - cast(an as decimal(38,0)) * pn")
    den = ("cast(n as decimal(38,0)) * n"
           " - cast(ap as decimal(38,0)) * pp"
           " - cast(an as decimal(38,0)) * pn")

    n_below = 9_600_000_000_000_000          # 9.6e15
    [row] = (kappa_df(n_below)
             .select(spark_round_ratio_wide(num, den, 6).alias("kappa"))
             .collect())
    exact = Fraction(
        n_below * (n_below * 9 // 10) - 2 * (n_below // 2) ** 2,
        n_below * n_below - 2 * (n_below // 2) ** 2)
    assert row.kappa == _round_half_up(exact, 6) == 0.8

    n_above = 12_000_000_000_000_000         # 1.2e16
    with pytest.raises(Exception, match=OVERFLOW_MARKER):
        (kappa_df(n_above)
         .select(spark_round_ratio_wide(num, den, 6).alias("kappa"))
         .collect())


def test_probe_swing_rational_boundary(spark):
    """calibration_report's probe_swing (operators/eightvalues.py):
    num = for_sum*against_n - against_sum*for_n rounded wide at 4
    digits -> boundary |num| ~= 5e33. With answers in 1..5, num =
    for_n*against_n*(mean_for - mean_against), so the breach sits
    around for_n = against_n ~ 3.5e16 answers per mode. Measured:
    exact at 1e16 per mode (num = 4e32), loud at 1e17 (num = 4e34)."""
    def swing_df(per_mode: int):
        return spark.createDataFrame(
            [(5 * per_mode, per_mode, 1 * per_mode, per_mode)],
            "for_sum long, for_n long, against_sum long, against_n long")

    num = ("cast(for_sum as decimal(38,0)) * against_n"
           " - cast(against_sum as decimal(38,0)) * for_n")
    den = "cast(for_n as decimal(38,0)) * against_n"

    below = 10_000_000_000_000_000           # 1e16 answers per mode
    [row] = (swing_df(below)
             .select(spark_round_ratio_wide(num, den, 4).alias("swing"))
             .collect())
    exact = Fraction(5 * below * below - below * below, below * below)
    assert row.swing == _round_half_up(exact, 4) == 4.0

    above = 100_000_000_000_000_000          # 1e17
    with pytest.raises(Exception, match=OVERFLOW_MARKER):
        (swing_df(above)
         .select(spark_round_ratio_wide(num, den, 4).alias("swing"))
         .collect())


def test_int64_form_would_wrap_where_wide_is_exact(spark):
    """Why the wide algebra exists: the SAME kappa numerator in plain
    int64 wraps silently at a scale the wide form handles exactly.
    Spark's bigint multiply is unchecked even under ANSI... is it? —
    pinned here: if bigint multiply ever starts raising too, the
    wide forms become redundant and this documents the change."""
    n = 4_000_000_000  # n*n = 1.6e19 > int64 max
    df = spark.createDataFrame([(n,)], "n long")
    wide = df.selectExpr(
        "CAST(cast(n as decimal(38,0)) * n AS STRING) AS s")
    assert wide.collect()[0].s == str(n * n)
    try:
        [row] = df.selectExpr("n * n AS s").collect()
        # non-ANSI-style silent wrap (two's complement)
        assert row.s == (n * n) - (1 << 64)
    except Exception as e:  # ANSI caught it: also loud, also fine
        assert "ARITHMETIC_OVERFLOW" in str(e) or OVERFLOW_MARKER in str(e)
