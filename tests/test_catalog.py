"""Multi-table consistent snapshots (sources/catalog.py): the
cross-table atomicity the reference inherits from Postgres
transactions, rebuilt as an immutable manifest log over the versioned
store. A catalog reader must never observe tables from two different
transactions mixed; interleaved transactions must serialize with the
loser retrying, never silently losing; a crash between table commit
and manifest flip must stay invisible."""

from __future__ import annotations

import pytest

from transcript_analysis_spark.sources import catalog, versioned


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def _tx1(spark, roots, cat):
    """Transaction 1: both tables at their v1 content + manifest."""
    a, b = roots
    va = versioned.commit_version(_df(spark, [(1, "a1")]), a)
    vb = versioned.commit_version(_df(spark, [(1, "b1")]), b)
    return catalog.commit_catalog(spark, cat, {a: va, b: vb},
                                  base_catalog=None)


def test_catalog_reader_sees_consistent_pair(spark, tmp_path):
    """After tx2 commits NEW versions of both tables but BEFORE its
    manifest flips, a catalog reader still resolves the tx1 pair —
    and after the flip, the tx2 pair. Never (a2, b1) or (a1, b2)."""
    a, b = str(tmp_path / "ta"), str(tmp_path / "tb")
    cat = str(tmp_path / "cat")
    c1 = _tx1(spark, (a, b), cat)
    assert c1 == 1

    # tx2: tables committed, manifest NOT yet flipped
    va2 = versioned.commit_version(_df(spark, [(1, "a2")]), a)
    vb2 = versioned.commit_version(_df(spark, [(1, "b2")]), b)
    assert _rows(catalog.read_catalog_table(spark, cat, a)) == [(1, "a1")]
    assert _rows(catalog.read_catalog_table(spark, cat, b)) == [(1, "b1")]
    # per-table latest HAS advanced — only the catalog view is pinned
    assert versioned.latest_version(spark, a) == va2

    c2 = catalog.commit_catalog(spark, cat, {a: va2, b: vb2},
                                base_catalog=c1)
    assert c2 == 2
    assert _rows(catalog.read_catalog_table(spark, cat, a)) == [(1, "a2")]
    assert _rows(catalog.read_catalog_table(spark, cat, b)) == [(1, "b2")]
    # a reader still holding manifest 1 keeps its consistent old pair
    assert _rows(catalog.read_catalog_table(spark, cat, a, c=1)) == \
        [(1, "a1")]
    assert _rows(catalog.read_catalog_table(spark, cat, b, c=1)) == \
        [(1, "b1")]


def test_interleaved_transactions_serialize(spark, tmp_path):
    """Two transactions derive from manifest 1; the first flips
    manifest 2; the second's forced stale flip raises
    StaleCatalogError, and its `transact` retry re-derives from the
    fresh manifest — both transactions' effects survive."""
    a, b = str(tmp_path / "ta"), str(tmp_path / "tb")
    cat = str(tmp_path / "cat")
    c1 = _tx1(spark, (a, b), cat)

    # both in-flight transactions pin manifest 1
    base = catalog.latest_catalog(spark, cat)
    pinned = catalog.read_catalog(spark, cat, base)

    # writer A wins: appends (2, "a-from-A") to table a
    va = versioned.commit_version(
        versioned.read_snapshot(spark, a, pinned[a]).unionByName(
            _df(spark, [(2, "a-from-A")])), a)
    assert catalog.commit_catalog(
        spark, cat, {**pinned, a: va}, base_catalog=base) == 2

    # writer B's stale flip must be rejected ...
    vb = versioned.commit_version(
        versioned.read_snapshot(spark, b, pinned[b]).unionByName(
            _df(spark, [(2, "b-from-B")])), b)
    with pytest.raises(catalog.StaleCatalogError):
        catalog.commit_catalog(spark, cat, {**pinned, b: vb},
                               base_catalog=base)

    # ... and the transact loop lands it cleanly on retry
    def tx_b(cur):
        nvb = versioned.commit_version(
            versioned.read_snapshot(spark, b, cur[b]).unionByName(
                _df(spark, [(2, "b-from-B")])), b)
        return {**cur, b: nvb}

    assert catalog.transact(spark, cat, tx_b) == 3
    assert _rows(catalog.read_catalog_table(spark, cat, a)) == \
        [(1, "a1"), (2, "a-from-A")]
    assert _rows(catalog.read_catalog_table(spark, cat, b)) == \
        [(1, "b1"), (2, "b-from-B")]


def test_crash_before_manifest_flip_is_invisible(spark, tmp_path):
    """Table versions committed by a transaction that died before its
    manifest flip are unreferenced: catalog readers never see them,
    and the next transaction derives from the last PUBLISHED state."""
    a, b = str(tmp_path / "ta"), str(tmp_path / "tb")
    cat = str(tmp_path / "cat")
    _tx1(spark, (a, b), cat)

    # the doomed transaction commits table a ... and crashes here
    versioned.commit_version(_df(spark, [(1, "a-lost")]), a)

    assert _rows(catalog.read_catalog_table(spark, cat, a)) == [(1, "a1")]

    def tx(cur):
        va = versioned.commit_version(
            versioned.read_snapshot(spark, a, cur[a]).unionByName(
                _df(spark, [(3, "a3")])), a)
        return {**cur, a: va}

    catalog.transact(spark, cat, tx)
    # derived from a1 (the published state), not from the lost orphan
    assert _rows(catalog.read_catalog_table(spark, cat, a)) == \
        [(1, "a1"), (3, "a3")]


def test_empty_catalog_reads_empty(spark, tmp_path):
    cat = str(tmp_path / "cat")
    assert catalog.latest_catalog(spark, cat) is None
    assert catalog.read_catalog(spark, cat) == {}
