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


def _recorded_check_rounds() -> dict[str, int]:
    """name -> latest harness round that recorded a result for it.

    Reads ``CORRECTNESS_r*.json`` from the repo root (two levels above
    this package). Missing/corrupt files are skipped — worst case the
    order degrades to pure registration order, never an error.
    """
    import json
    import re
    from pathlib import Path

    latest: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
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
        for name in data:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _derive_driver_priority(registered: list[str],
                            latest: dict[str, int] | None = None) -> list[str]:
    if latest is None:
        latest = _recorded_check_rounds()
    reg_pos = {n: i for i, n in enumerate(registered)}
    # Never-checked first (registration order), then ascending by the
    # round of the most recent check (stalest first).
    return sorted(registered,
                  key=lambda n: (latest.get(n, 0), reg_pos[n]))


def all_queries() -> dict[str, Query]:
    _load_all()
    order = _derive_driver_priority(list(_REGISTRY))
    return {n: _REGISTRY[n] for n in order}


def get_query(name: str) -> Query:
    _load_all()
    return _REGISTRY[name]
