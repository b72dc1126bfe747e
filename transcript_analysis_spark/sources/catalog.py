"""Multi-table consistent snapshots — the catalog layer above the
versioned store.

The reference gets cross-table atomicity for free from Postgres
transactions: videos, transcripts, and score rows land in ONE commit,
and a reader can never observe a transcript whose video row is
missing (maintain_database.py writes related tables inside single
connections). `sources/versioned.py` gives each table its own ACID
history, but two tables' latest versions can interleave — the one
consistency property the per-table design cannot express. This module
closes it the way the lakehouse engines do a transaction log: a
CATALOG is a numbered sequence of immutable manifest files, each
pinning {table root -> committed version} for every table in the
group.

Protocol (all building on the versioned store's own primitives):

- ``commit_catalog`` writes manifest ``c_N`` under the catalog's
  write lock (same lease/takeover semantics as a table's
  ``_WRITE_LOCK``) after an optimistic base check — the multi-table
  :class:`StaleCatalogError` twin of ``StaleBaseError``.
- Writers FIRST commit each table's new version through
  ``commit_version`` (per-table protocol, unchanged), THEN flip the
  catalog manifest. A crash in between leaves committed-but-
  unreferenced table versions: invisible to every catalog reader,
  reclaimed by each table's ``vacuum_versions`` once superseded.
- Readers resolve ONE manifest (``read_catalog``) and read every
  table at its pinned version via ``read_snapshot`` — immutable
  files, so the cross-table view stays consistent for the whole scan
  regardless of concurrent commits (snapshot isolation across
  tables).
- ``transact`` packages the read-derive-commit-retry loop: the
  caller's function receives the pinned snapshot mapping and returns
  the new table versions; a concurrent catalog commit forces a clean
  retry against the fresh manifest, so no transaction is ever
  silently lost.

At 100 TB the manifest is O(#tables) bytes regardless of data volume
— the flip is one small atomic file creation, never a data rewrite.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from transcript_analysis_spark.sources.versioned import (
    ConcurrentWriterError,
    _fs,
    _release_lock,
    _with_write_lock,
    read_snapshot,
)

_MANIFEST_PREFIX = "c_"


class StaleCatalogError(ConcurrentWriterError):
    """The catalog advanced since this transaction's snapshot was
    pinned — re-read, re-derive, retry (multi-table lost-update
    guard)."""


def _manifest_path(root: str, c: int) -> str:
    return f"{root.rstrip('/')}/{_MANIFEST_PREFIX}{c:08d}.json"


def _list_manifests(jvm, fs, root: str) -> list[int]:
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if name.startswith(_MANIFEST_PREFIX) and name.endswith(".json"):
            try:
                out.append(int(name[len(_MANIFEST_PREFIX):-5]))
            except ValueError:
                pass
    return sorted(out)


def latest_catalog(spark: SparkSession, root: str) -> int | None:
    jvm, fs, _ = _fs(spark, root)
    ms = _list_manifests(jvm, fs, root)
    return ms[-1] if ms else None


def read_catalog(spark: SparkSession, root: str,
                 c: int | None = None) -> dict[str, int]:
    """The pinned {table root -> version} mapping of manifest ``c``
    (default: latest). Manifests are immutable — resolving once gives
    a consistent cross-table view for the reader's whole lifetime."""
    if c is None:
        c = latest_catalog(spark, root)
        if c is None:
            return {}
    jvm, fs, _ = _fs(spark, root)
    path = jvm.org.apache.hadoop.fs.Path(_manifest_path(root, c))
    stream = fs.open(path)
    try:
        # py4j cannot fill a Java byte[] in place — drain JVM-side
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return dict(json.loads(data.decode("utf-8"))["tables"])


def read_catalog_table(spark: SparkSession, catalog_root: str,
                       table_root: str,
                       c: int | None = None) -> DataFrame:
    """One table at the version the manifest pins — never the table's
    own (possibly newer) latest."""
    pinned = read_catalog(spark, catalog_root, c)
    if table_root not in pinned:
        raise KeyError(f"{table_root} not in catalog {catalog_root} "
                       f"manifest {c}")
    return read_snapshot(spark, table_root, pinned[table_root])


def commit_catalog(spark: SparkSession, root: str,
                   tables: dict[str, int],
                   base_catalog: int | None | object = None,
                   _unchecked: bool = False) -> int:
    """Publish a new manifest pinning ``tables``. With
    ``base_catalog`` (the manifest this transaction derived from;
    None for "catalog was empty"), the commit is rejected with
    :class:`StaleCatalogError` if another manifest landed since — the
    check runs under the catalog's write lock, so check+publish is
    atomic. Pass ``_unchecked=True`` to skip the base check (initial
    bootstrap only)."""
    jvm, fs, lock, token = _with_write_lock(spark, root)
    try:
        ms = _list_manifests(jvm, fs, root)
        latest = ms[-1] if ms else None
        if not _unchecked and latest != base_catalog:
            raise StaleCatalogError(
                f"catalog {root} is at manifest {latest}, but this "
                f"transaction was derived from {base_catalog}. Re-read "
                f"the latest manifest, re-derive, and retry.")
        c = (latest or 0) + 1
        path = jvm.org.apache.hadoop.fs.Path(_manifest_path(root, c))
        body = json.dumps({"catalog_version": c,
                           "tables": dict(tables)},
                          sort_keys=True).encode("utf-8")
        stream = fs.create(path, False)   # fails if it exists
        try:
            stream.write(body)
        finally:
            stream.close()
        return c
    finally:
        _release_lock(fs, lock, token)


def transact(spark: SparkSession, catalog_root: str, fn,
             max_retries: int = 5) -> int:
    """Optimistic multi-table transaction: ``fn(pinned)`` receives the
    current {table root -> version} mapping, performs its per-table
    ``commit_version`` calls deriving from those pinned versions, and
    returns the updated mapping; the manifest flip then publishes all
    of it atomically. A concurrent transaction forces
    :class:`StaleCatalogError` and a clean retry from the fresh
    manifest — table versions committed by the losing attempt stay
    unreferenced (invisible) and are vacuumed later."""
    import random
    import time

    last_err: Exception | None = None
    for attempt in range(max_retries + 1):
        base = latest_catalog(spark, catalog_root)
        pinned = read_catalog(spark, catalog_root, base) if base else {}
        updated = fn(dict(pinned))
        try:
            return commit_catalog(spark, catalog_root, updated,
                                  base_catalog=base)
        except ConcurrentWriterError as e:   # includes StaleCatalogError
            last_err = e
            if attempt < max_retries:
                time.sleep(0.05 * (2 ** attempt) * (0.5 + random.random()))
    raise last_err  # type: ignore[misc]
