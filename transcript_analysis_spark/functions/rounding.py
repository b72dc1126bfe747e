"""Engine-portable half-up rounding of exact integer ratios.

The hazard (found by the sf0.1 sweep, pinned in text_quality_scores):
when a query output is a ratio of exact integers N/D, its true decimal
expansion can terminate EXACTLY on a round-half boundary
(e.g. 8149/16000 = 0.5093125 at 6dp). Spark's ROUND (exact BigDecimal
of the double, HALF_UP) and DuckDB's ROUND (scaled multiply through
doubles) can then disagree by one last digit.

Fix: perform the half-up rounding in integer arithmetic —

    round_k(N/D) = sign(N) * ((2*|N|*10^k + D) // (2*D)) / 10^k

Integer floor-division of non-negative operands is identical in both
engines (Spark `div` truncates, DuckDB `//` floors — equal for
non-negatives, hence the sign decomposition). The final /10^k is one
deterministic double division of exact integers.

Only for INTEGER numerators/denominators; ratios of accumulated
doubles are binary rationals whose decimal expansions terminate far
beyond the rounding digit and cannot sit on a decimal half-boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _mults(digits: int, n_prescale: int) -> tuple[int, int, int]:
    """Split the 10^digits scaling between numerator and denominator.

    When the numerator is ALREADY a 10^n_prescale-scaled integer (e.g.
    per-term logps stored as round(logp*1e9)), multiplying it again by
    10^digits overflows int64 for large sums (|N| > ~4.6e12 at 6
    digits).  The true value is N / (10^prescale * C); rounding it to
    `digits` only needs the NET factor 10^(digits - prescale), which we
    apply to whichever side keeps both operands small."""
    if n_prescale <= digits:
        return 10 ** (digits - n_prescale), 1, 10 ** digits
    return 1, 10 ** (n_prescale - digits), 10 ** digits


def spark_round_ratio(n: str, d: str, digits: int,
                      n_prescale: int = 0) -> Column:
    """Half-up round of integer-expression ratio n/d to `digits`,
    as an engine-portable Spark Column (n, d are SQL expression
    strings yielding integers; d > 0).  With `n_prescale` = p, the
    ratio interpreted is n / (10^p * d) — pass the raw count as d
    instead of count*10^p to stay far from int64 overflow."""
    nm, dm, s = _mults(digits, n_prescale)
    q = (f"(CASE WHEN ({n}) < 0 THEN -1 ELSE 1 END) * "
         f"((2 * abs(cast(({n}) as bigint)) * {nm} + ({d}) * {dm})"
         f" div (2 * ({d}) * {dm}))")
    return (F.expr(q).cast("double") / F.lit(float(s)))


def duck_round_ratio(n: str, d: str, digits: int,
                     n_prescale: int = 0) -> str:
    """Same contract as SQL text for the DuckDB oracle."""
    nm, dm, s = _mults(digits, n_prescale)
    return (f"(CAST((CASE WHEN ({n}) < 0 THEN -1 ELSE 1 END) * "
            f"((2 * abs(CAST(({n}) AS BIGINT)) * {nm} + ({d}) * {dm})"
            f" // (2 * ({d}) * {dm})) "
            f"AS DOUBLE) / {s})")


# --- wide variants: DECIMAL(38,0) / HUGEINT -------------------------------
#
# The bigint variants above overflow once 2*|n|*10^digits exceeds
# ~9.2e18 — e.g. temperature_mixture_plan's sample_rate numerator
# w_q * budget with w_q = round(sqrt(tokens)*1e6) blows past int64 as
# soon as one source holds >~53k tokens (Spark non-ANSI would wrap
# SILENTLY while DuckDB errors). The wide variants run the identical
# half-up algebra in 128-bit integers: Spark DECIMAL(38,0) (whose
# `div` returns the exact integral quotient) and DuckDB HUGEINT.
# Headroom is ~1e37 on both engines — safe past 10^13-token sources.
#
# Caller contract: if n or d is itself a PRODUCT that can exceed
# int64, cast its first factor wide in the expression you pass in
# (e.g. ``cast(w_q as decimal(38,0)) * budget``) so the
# multiplication happens in 128-bit from the start. The rounded
# quotient itself must fit int64 (Spark's decimal `div` returns
# BIGINT) — true for any ratio rounded to <= 12 digits.


def spark_round_ratio_wide(n: str, d: str, digits: int) -> Column:
    s = 10 ** digits
    q = (f"(CASE WHEN ({n}) < 0 THEN -1 ELSE 1 END) * "
         f"((2 * abs(cast(({n}) as decimal(38,0))) * {s}"
         f" + cast(({d}) as decimal(38,0)))"
         f" div (2 * cast(({d}) as decimal(38,0))))")
    return (F.expr(q).cast("double") / F.lit(float(s)))


def duck_round_ratio_wide(n: str, d: str, digits: int) -> str:
    s = 10 ** digits
    return (f"(CAST((CASE WHEN ({n}) < 0 THEN -1 ELSE 1 END) * "
            f"((2 * abs(CAST(({n}) AS HUGEINT)) * {s}"
            f" + CAST(({d}) AS HUGEINT))"
            f" // (2 * CAST(({d}) AS HUGEINT))) "
            f"AS DOUBLE) / {s})")


def spark_round_ratio_wide_q(n: str, d: str, digits: int) -> Column:
    """The wide variant's INTEGER quotient — round(n/d * 10^digits) as
    a BIGINT column, before the final float division. For callers that
    keep computing in exact integers (e.g. splitting a quantized rate
    into whole copies + a fractional ppm threshold)."""
    q = (f"(CASE WHEN ({n}) < 0 THEN -1 ELSE 1 END) * "
         f"((2 * abs(cast(({n}) as decimal(38,0))) * {10 ** digits}"
         f" + cast(({d}) as decimal(38,0)))"
         f" div (2 * cast(({d}) as decimal(38,0))))")
    return F.expr(q).cast("long")


def duck_round_ratio_wide_q(n: str, d: str, digits: int) -> str:
    return (f"CAST((CASE WHEN ({n}) < 0 THEN -1 ELSE 1 END) * "
            f"((2 * abs(CAST(({n}) AS HUGEINT)) * {10 ** digits}"
            f" + CAST(({d}) AS HUGEINT))"
            f" // (2 * CAST(({d}) AS HUGEINT))) AS BIGINT)")
