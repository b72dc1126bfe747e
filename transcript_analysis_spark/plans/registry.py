"""Query registry — single source of truth for the engine's query surface.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables. ``__spark_entry__.py``, ``bench.py``, and the test suite all
read this registry, so a query is "done" exactly when it appears here
with both halves and passes the oracle comparison.

Column-name contract: the driver's compare sorts columns by name before
hashing, so every computed column is aliased identically in the Spark
plan and the oracle SQL.

Float contract: Spark and DuckDB may differ in the last ulp of a
double (summation order is engine-chosen), so any floating-point
output column is explicitly ``round()``-ed to a fixed scale on BOTH
sides. Integer/decimal arithmetic is kept exact end-to-end.
Integer-RATIO outputs must NOT use plain round() — their decimal
expansion can terminate exactly on a round-half boundary where the
engines' round() implementations disagree; use
``functions/rounding.py`` (integer half-up rounding) instead. Every
query is validated at both sf0.01 and sf0.1
(tools/check_correctness.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None          # DuckDB SQL; None => rows-only check
    headline: bool = False             # included in bench.py
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(name: str, oracle: str | None = None, *, headline: bool = False,
             tags: tuple[str, ...] = (), doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle,
                                headline=headline, doc=doc or (fn.__doc__ or ""),
                                tags=tuple(tags))
        return fn
    return deco


def _load_all() -> None:
    # Import side effect: each module registers its queries.
    from transcript_analysis_spark.plans import (  # noqa: F401
        relational,
        domain,
        data_pipeline,
        streaming_batch,
        scale_ops,
        curation,
        warehouse,
        sketches,
        graph,
        selection,
        ann_sweep,
    )


# External correctness harnesses sample the head of the registry, so
# iteration order is part of the verification contract. The order is
# DERIVED, not hand-curated (the hand-maintained list demonstrably
# dropped a query — `pq_topk_adc` never earned a harness row through
# round 5): `_derive_driver_priority()` reads the recorded
# CORRECTNESS_r*.json results and surfaces (a) queries with no
# harness row in any round first, then (b) everything else ordered by
# the round of its most recent check, oldest first. Registration
# (file) order breaks ties for determinism. A query can therefore
# never be permanently shadowed: once checked it rotates to the back
# and the next unchecked/stalest names move up.


_CHECK_ROUNDS_CACHE: dict[tuple, dict[str, tuple[int, bool, bool]]] = {}


def _recorded_check_rounds() -> dict[str, tuple[int, bool, bool]]:
    """name -> (latest harness round, red_in_that_round, rows_only).

    A row is RED when the harness recorded an explicit mismatch
    (rows/schema/hash False — ``None`` means not comparable, e.g.
    rows-only queries, and is NOT red). ``rows_only`` is True when the
    latest row was an ``err: "no_oracle"`` rows-only check — a weaker
    result that a later-registered oracle should supersede (see
    ``_derive_driver_priority``). Reads ``CORRECTNESS_r*.json``
    from the repo root (two levels above this package); missing or
    corrupt files are skipped — worst case the order degrades to pure
    registration order, never an error. Memoized per file set/mtime so
    hot callers (the HTTP shell hits all_queries() per request) don't
    re-parse on every call.
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    paths = sorted(root.glob("CORRECTNESS_r*.json"))
    try:
        cache_key = tuple((str(p), p.stat().st_mtime_ns) for p in paths)
    except OSError:
        cache_key = None
    if cache_key is not None and cache_key in _CHECK_ROUNDS_CACHE:
        return _CHECK_ROUNDS_CACHE[cache_key]

    latest: dict[str, tuple[int, bool, bool]] = {}
    for path in paths:
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            red = isinstance(row, dict) and any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match"))
            rows_only = (isinstance(row, dict)
                         and row.get("err") == "no_oracle")
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, red, rows_only)
    if cache_key is not None:
        _CHECK_ROUNDS_CACHE.clear()
        _CHECK_ROUNDS_CACHE[cache_key] = latest
    return latest


def _derive_driver_priority(
        registered: list[str],
        latest: dict[str, tuple] | None = None,
        oracled: set[str] | None = None) -> list[str]:
    if latest is None:
        latest = _recorded_check_rounds()
    if oracled is None:
        oracled = {n for n, q in _REGISTRY.items() if q.oracle is not None}
    reg_pos = {n: i for i, n in enumerate(registered)}

    # Tier 0: RED in the most recent check (a recorded failure must
    # re-earn a green row next round — the property the old hand list
    # provided for session_windows_per_user). Tier 1: never
    # *meaningfully* checked — no recorded row at all, OR the latest
    # row was a rows-only `err: no_oracle` check for a query that NOW
    # registers an oracle (the oracle was added after the last check
    # and has never earned a hash row — round-6 verdict item: the BPE
    # pair would otherwise wait ~2 rounds behind stale-green queries).
    # Tier 2: green — stalest check first. Registration order breaks
    # ties within every tier.
    def key(n: str):
        rec = latest.get(n)
        if rec is None:
            return (1, 0, reg_pos[n])
        rnd, red, *rest = rec
        rows_only = bool(rest[0]) if rest else False
        if red:
            return (0, rnd, reg_pos[n])
        if rows_only and n in oracled:
            return (1, rnd, reg_pos[n])
        return (2, rnd, reg_pos[n])

    return sorted(registered, key=key)


def all_queries() -> dict[str, Query]:
    _load_all()
    order = _derive_driver_priority(list(_REGISTRY))
    return {n: _REGISTRY[n] for n in order}


def get_query(name: str) -> Query:
    _load_all()
    return _REGISTRY[name]
