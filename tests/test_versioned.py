"""Versioned snapshot tables (S4 with concurrent-reader safety) and
the hardened write_and_swap crash/lock contract."""

from __future__ import annotations

import glob
import os

import pytest

from transcript_analysis_spark.sources import sinks, versioned


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


# --- versioned table ----------------------------------------------------

def test_versioned_upsert_semantics(spark, tmp_path):
    root = str(tmp_path / "vt")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    v1 = versioned.upsert_by_key_versioned(base, root, ["k"])
    assert v1 == 1
    # DO UPDATE: key 2 replaced, key 3 added
    v2 = versioned.upsert_by_key_versioned(
        spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]), root, ["k"])
    assert v2 == 2
    assert _rows(versioned.read_snapshot(spark, root)) == \
        [(1, "a"), (2, "B"), (3, "c")]
    # DO NOTHING: key 3 kept, key 4 added
    versioned.upsert_by_key_versioned(
        spark.createDataFrame([(3, "X"), (4, "d")], ["k", "v"]),
        root, ["k"], do_update=False)
    assert _rows(versioned.read_snapshot(spark, root)) == \
        [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_versioned_concurrent_reader_survives_upsert(spark, tmp_path):
    """VERDICT r2 #3 done-criterion: a reader open BEFORE an upsert
    still collects cleanly AFTER it — version dirs are immutable, so
    the snapshot's files are never renamed or deleted under the
    reader (unlike a rename-swap, where the listed files vanish)."""
    root = str(tmp_path / "vt")
    versioned.commit_version(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), root)
    reader = versioned.read_snapshot(spark, root)  # file listing resolved now
    versioned.upsert_by_key_versioned(
        spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]), root, ["k"])
    # old snapshot still fully readable, with pre-upsert content
    assert _rows(reader) == [(1, "a"), (2, "b")]
    # new snapshot sees the merge
    assert _rows(versioned.read_snapshot(spark, root)) == \
        [(1, "a"), (2, "B"), (3, "c")]


def test_versioned_uncommitted_version_is_invisible(spark, tmp_path):
    root = str(tmp_path / "vt")
    versioned.commit_version(
        spark.createDataFrame([(1, "a")], ["k", "v"]), root)
    # simulate a crashed writer: data dir without a _COMMITTED marker
    spark.createDataFrame([(9, "z")], ["k", "v"]).write.parquet(
        f"{root}/v_00000002")
    assert versioned.latest_version(spark, root) == 1
    assert _rows(versioned.read_snapshot(spark, root)) == [(1, "a")]
    # next commit allocates PAST the orphan (no clobber)
    v = versioned.commit_version(
        spark.createDataFrame([(2, "b")], ["k", "v"]), root)
    assert v == 3


def test_versioned_writer_lock_enforced(spark, tmp_path):
    root = str(tmp_path / "vt")
    os.makedirs(root, exist_ok=True)
    open(f"{root}/_WRITE_LOCK", "w").close()
    with pytest.raises(versioned.ConcurrentWriterError):
        versioned.commit_version(
            spark.createDataFrame([(1, "a")], ["k", "v"]), root)


def test_versioned_vacuum_keeps_recent_reclaims_old(spark, tmp_path):
    root = str(tmp_path / "vt")
    for i in range(4):
        versioned.commit_version(
            spark.createDataFrame([(i, "x")], ["k", "v"]), root)
    # make version 1 a stale UNCOMMITTED orphan below latest: it is
    # reclaimed alongside the aged-out committed version 2
    os.remove(f"{root}/v_00000001/_COMMITTED")
    removed = versioned.vacuum_versions(spark, root, keep=2)
    assert removed == [1, 2]
    assert versioned.latest_version(spark, root) == 4
    assert _rows(versioned.read_snapshot(spark, root, 3)) == [(2, "x")]
    with pytest.raises(FileNotFoundError):
        versioned.read_snapshot(spark, root, 1)


# --- hardened write_and_swap / upsert_by_key ---------------------------

def test_write_and_swap_lock_enforced_and_released(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    df.write.parquet(path)
    open(f"{path}__rewrite_lock", "w").close()
    with pytest.raises(sinks.ConcurrentWriterError):
        sinks.write_and_swap(df, path)
    os.remove(f"{path}__rewrite_lock")
    sinks.write_and_swap(
        spark.createDataFrame([(2, "b")], ["k", "v"]), path)
    assert not os.path.exists(f"{path}__rewrite_lock")  # released
    assert _rows(spark.read.parquet(path)) == [(2, "b")]


def test_upsert_recovers_orphaned_old_dir(spark, tmp_path):
    """Crash window: process died after staging the table aside but
    before swapping the new output in. The table dir is gone; the
    __rewrite_old_* sibling holds ALL the data. The next upsert must
    recover it, not treat the table as a first write."""
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]).write.parquet(path)
    os.rename(path, f"{path}__rewrite_old_deadbeef")  # simulate the crash
    sinks.upsert_by_key(
        spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]), path, ["k"])
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "a", 2: "B", 3: "c"}  # pre-crash rows survived
    assert not glob.glob(f"{path}__rewrite_old_*")


def test_upsert_refuses_ambiguous_orphans(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], ["k", "v"]).write.parquet(path)
    os.rename(path, f"{path}__rewrite_old_aaaa")
    os.makedirs(f"{path}__rewrite_old_bbbb")
    with pytest.raises(IOError, match="orphaned swap dirs"):
        sinks.upsert_by_key(
            spark.createDataFrame([(2, "b")], ["k", "v"]), path, ["k"])


def test_write_and_swap_cleans_tmp_on_failure(spark, tmp_path):
    """If staging the live dir aside fails, the freshly-written tmp
    dir must not leak."""
    path = str(tmp_path / "missing")  # path does not exist -> rename fails
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    with pytest.raises(IOError, match="stage"):
        sinks.write_and_swap(df, path)
    assert not glob.glob(f"{path}__rewrite_tmp_*")
    assert not os.path.exists(f"{path}__rewrite_lock")


def test_diff_versions_emits_churn_only(spark, tmp_path):
    """CDC between two committed snapshots: added/removed/changed
    classified correctly, unchanged rows absent, O(churn) output."""
    from transcript_analysis_spark.sources.versioned import (
        commit_version,
        diff_versions,
    )
    root = str(tmp_path / "tbl")
    v1 = commit_version(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, val string"), root)
    v2 = commit_version(
        spark.createDataFrame(
            [(2, "b"), (3, "C"), (4, "d")], "k int, val string"), root)
    rows = {r.k: r for r in diff_versions(spark, root, v1, v2,
                                          ["k"]).collect()}
    assert set(rows) == {1, 3, 4}
    assert rows[1].change_type == "removed" and rows[1].old_val == "a"
    assert rows[3].change_type == "changed" and rows[3].new_val == "C"
    assert rows[4].change_type == "added" and rows[4].new_val == "d"


def test_diff_versions_null_safe_compare(spark, tmp_path):
    """NULL -> NULL is unchanged; NULL -> value and value -> NULL are
    changes (the eqNullSafe contract)."""
    from transcript_analysis_spark.sources.versioned import (
        commit_version,
        diff_versions,
    )
    root = str(tmp_path / "tbl")
    v1 = commit_version(
        spark.createDataFrame(
            [(1, None), (2, "x"), (3, None)], "k int, val string"), root)
    v2 = commit_version(
        spark.createDataFrame(
            [(1, None), (2, None), (3, "y")], "k int, val string"), root)
    rows = {r.k: r for r in diff_versions(spark, root, v1, v2,
                                          ["k"]).collect()}
    assert set(rows) == {2, 3}
    assert rows[2].change_type == "changed" and rows[2].new_val is None
    assert rows[3].change_type == "changed" and rows[3].new_val == "y"
