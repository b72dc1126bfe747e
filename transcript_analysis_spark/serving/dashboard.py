"""Dashboard serving layer — the engine-side half of the reference's
dashboard server (`server/dashboard.py:41-56`): a TTL result cache in
front of the registered aggregate queries plus a statement timeout,
re-expressed for Spark (job-group cancellation instead of Postgres
`statement_timeout`).

The HTTP shell stays out of engine scope (SURVEY verdict); anything
that can call Python can serve these results. `collect()` here is the
serving edge, not an operator path: every dashboard query is a small
aggregate (bounded rows by construction), which is exactly when
driver materialization is correct.
"""

from __future__ import annotations

import threading
import time
import uuid


class QueryTimeout(Exception):
    """Raised when a dashboard query exceeds its statement timeout
    (the Spark analog of the reference's `SET statement_timeout`)."""


class DashboardService:
    """TTL-cached, timeout-bounded access to registered queries.

    - `ttl_sec` mirrors the reference's cache window: repeated
      dashboard refreshes within the TTL serve the cached rows and
      never touch the cluster.
    - `timeout_sec` cancels the underlying Spark job group, so a
      runaway query cannot pin executors (interruptOnCancel=True).
    - `clock` is injectable for deterministic tests.
    """

    def __init__(self, spark, sf_dir: str, ttl_sec: float = 60.0,
                 clock=time.monotonic):
        self._spark = spark
        self._sf_dir = sf_dir
        self._ttl = ttl_sec
        self._clock = clock
        self._cache: dict[str, tuple[float, list]] = {}
        self._lock = threading.Lock()

    def run(self, name: str, timeout_sec: float | None = None,
            force_refresh: bool = False) -> tuple[list, bool]:
        """Run (or serve from cache) a registered query. Returns
        (rows, was_cache_hit)."""
        now = self._clock()
        with self._lock:
            hit = self._cache.get(name)
            if hit and hit[0] > now and not force_refresh:
                return hit[1], True
        from transcript_analysis_spark.plans import all_queries
        df = all_queries()[name].fn(self._spark, self._sf_dir)
        rows = self._collect_with_timeout(df, timeout_sec, name)
        with self._lock:
            self._cache[name] = (self._clock() + self._ttl, rows)
        return rows, False

    def invalidate(self, name: str | None = None) -> None:
        with self._lock:
            if name is None:
                self._cache.clear()
            else:
                self._cache.pop(name, None)

    def _collect_with_timeout(self, df, timeout_sec, tag: str) -> list:
        if not timeout_sec:
            return df.collect()
        sc = self._spark.sparkContext
        group = f"dashboard-{tag}-{uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, f"dashboard query {tag}",
                       interruptOnCancel=True)
        cancelled = threading.Event()

        def cancel():
            cancelled.set()
            sc.cancelJobGroup(group)

        timer = threading.Timer(timeout_sec, cancel)
        timer.start()
        try:
            return df.collect()
        except Exception as exc:  # noqa: BLE001 — classify below
            if cancelled.is_set():
                raise QueryTimeout(
                    f"query {tag!r} exceeded {timeout_sec}s and was "
                    f"cancelled") from exc
            raise
        finally:
            timer.cancel()
            sc.setJobGroup(None, None)
