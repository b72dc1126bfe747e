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
    removed = versioned.vacuum_versions(spark, root, keep=2,
                                         retention_ms=0)
    assert removed == [1, 2]
    assert versioned.latest_version(spark, root) == 4
    assert _rows(versioned.read_snapshot(spark, root, 3)) == [(2, "x")]
    with pytest.raises(FileNotFoundError):
        versioned.read_snapshot(spark, root, 1)


def test_versioned_stale_base_commit_rejected(spark, tmp_path):
    """The lost-update scenario, forced: writers A and B both merge
    against v1; A commits v2; B's commit (still based on v1) must be
    REJECTED, not silently erase A's row. This is the ACID property
    the reference inherits from Postgres (island_worker.py
    INSERT..ON CONFLICT under MVCC)."""
    root = str(tmp_path / "vt")
    versioned.commit_version(
        spark.createDataFrame([(1, "a")], ["k", "v"]), root)
    base = versioned.latest_version(spark, root)
    snap = versioned.read_snapshot(spark, root, base)
    merged_a = snap.unionByName(
        spark.createDataFrame([(2, "from_A")], ["k", "v"]))
    merged_b = snap.unionByName(
        spark.createDataFrame([(3, "from_B")], ["k", "v"]))
    assert versioned.commit_version(merged_a, root, base_version=base) == 2
    with pytest.raises(versioned.StaleBaseError):
        versioned.commit_version(merged_b, root, base_version=base)
    # A's row is intact; B's never became visible
    assert _rows(versioned.read_snapshot(spark, root)) == \
        [(1, "a"), (2, "from_A")]


def test_versioned_interleaved_upserts_lose_no_rows(spark, tmp_path):
    """Full interleave through the public upsert: B reads v1, A
    upserts (v2 commits), then B's stale first attempt is refused and
    its retry path re-merges — the final table holds BOTH writers'
    rows. We force the interleave deterministically by replaying B's
    stale merge through commit_version, then letting
    upsert_by_key_versioned retry from scratch."""
    root = str(tmp_path / "vt")
    versioned.upsert_by_key_versioned(
        spark.createDataFrame([(1, "a")], ["k", "v"]), root, ["k"])
    base = versioned.latest_version(spark, root)
    snap = versioned.read_snapshot(spark, root, base)
    stale_b = snap.unionByName(
        spark.createDataFrame([(3, "c")], ["k", "v"]))
    # A wins the race
    versioned.upsert_by_key_versioned(
        spark.createDataFrame([(2, "b")], ["k", "v"]), root, ["k"])
    # B's in-flight merge is now stale -> one forced loser
    with pytest.raises(versioned.StaleBaseError):
        versioned.commit_version(stale_b, root, base_version=base)
    # B retries through the upsert API: re-reads, re-merges, commits
    versioned.upsert_by_key_versioned(
        spark.createDataFrame([(3, "c")], ["k", "v"]), root, ["k"])
    assert _rows(versioned.read_snapshot(spark, root)) == \
        [(1, "a"), (2, "b"), (3, "c")]


def test_versioned_empty_table_base_check(spark, tmp_path):
    """base_version=None means 'I merged against an empty table';
    if someone committed meanwhile, that commit must also be
    refused."""
    root = str(tmp_path / "vt")
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    assert versioned.commit_version(df, root, base_version=None) == 1
    with pytest.raises(versioned.StaleBaseError):
        versioned.commit_version(df, root, base_version=None)


def test_diff_versions_schema_mismatch_raises(spark, tmp_path):
    """ADVICE r5: a non-key column present in old but dropped in new
    used to surface as an opaque AnalysisException; now a clear
    ValueError names the divergent columns. Bad key names too."""
    root = str(tmp_path / "vt")
    versioned.commit_version(
        spark.createDataFrame([(1, "a", 1.0)], ["k", "v", "extra"]), root)
    versioned.commit_version(
        spark.createDataFrame([(1, "a")], ["k", "v"]), root)
    with pytest.raises(ValueError, match="extra"):
        versioned.diff_versions(spark, root, 1, 2, ["k"])
    with pytest.raises(ValueError, match="nope"):
        versioned.diff_versions(spark, root, 1, 2, ["nope"])


def test_diff_versions_null_key_classified_once(spark, tmp_path):
    """ADVICE r5: a NULL primary-key row was previously reported both
    'added' and 'removed' (plain-equality join). With null-safe key
    join + marker-column presence it diffs like any other row."""
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)
    schema = StructType([StructField("k", IntegerType(), True),
                         StructField("v", StringType(), True)])
    root = str(tmp_path / "vt")
    versioned.commit_version(
        spark.createDataFrame([(None, "old"), (1, "x")], schema), root)
    versioned.commit_version(
        spark.createDataFrame([(None, "new"), (1, "x")], schema), root)
    out = versioned.diff_versions(spark, root, 1, 2, ["k"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k is None and r.change_type == "changed"
    assert r.old_v == "old" and r.new_v == "new"


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


# --- writer-lock lease + vacuum retention guard (r6 verdict #3) --------

def _backdate(path, ms_ago):
    import time
    t = time.time() - ms_ago / 1000.0
    os.utime(path, (t, t))


def test_crashed_writer_lock_reclaimed_by_lease(spark, tmp_path):
    """A lock whose mtime is past the lease window is taken over
    automatically — no human deletes anything."""
    root = str(tmp_path / "vt")
    versioned.commit_version(
        spark.createDataFrame([(1, "a")], ["k", "v"]), root)
    lock = f"{root}/_WRITE_LOCK"
    open(lock, "w").close()                   # crashed writer's leftover
    _backdate(lock, versioned._DEFAULT_LEASE_MS + 60_000)
    v = versioned.commit_version(
        spark.createDataFrame([(2, "b")], ["k", "v"]), root)
    assert v == 2
    assert not os.path.exists(lock)           # released after commit
    assert _rows(versioned.read_snapshot(spark, root)) == [(2, "b")]


def test_live_writer_lock_not_stolen_within_lease(spark, tmp_path):
    """A lock younger than the lease still blocks — live writers are
    never evicted mid-commit."""
    root = str(tmp_path / "vt")
    os.makedirs(root, exist_ok=True)
    open(f"{root}/_WRITE_LOCK", "w").close()  # fresh mtime = now
    with pytest.raises(versioned.ConcurrentWriterError):
        versioned.commit_version(
            spark.createDataFrame([(1, "a")], ["k", "v"]), root)
    assert os.path.exists(f"{root}/_WRITE_LOCK")   # untouched


def test_evicted_writer_release_does_not_clobber_new_lock(spark, tmp_path):
    """After a lease takeover, the evicted writer's `finally` must not
    delete the NEW owner's lock (token = mtime-at-acquisition)."""
    root = str(tmp_path / "vt")
    os.makedirs(root, exist_ok=True)
    lock_path = f"{root}/_WRITE_LOCK"
    jvm, fs, lock, token = versioned._with_write_lock(spark, root)
    # simulate a takeover: replace the lock with a different mtime
    os.remove(lock_path)
    open(lock_path, "w").close()
    _backdate(lock_path, 120_000)             # distinct mtime
    versioned._release_lock(fs, lock, token)
    assert os.path.exists(lock_path), "new owner's lock was clobbered"
    os.remove(lock_path)


def test_vacuum_retention_guard_protects_young_versions(spark, tmp_path):
    """Versions committed within the retention window are never
    reclaimed, whatever `keep` says; backdated ones are."""
    root = str(tmp_path / "vt")
    for i in range(4):
        versioned.commit_version(
            spark.createDataFrame([(i, "x")], ["k", "v"]), root)
    # all four markers are seconds old -> nothing eligible
    assert versioned.vacuum_versions(spark, root, keep=1) == []
    # age out versions 1 and 2; 3 stays young
    for v in (1, 2):
        _backdate(f"{root}/v_{v:08d}/_COMMITTED",
                  versioned._DEFAULT_RETENTION_MS + 60_000)
    removed = versioned.vacuum_versions(spark, root, keep=1)
    assert removed == [1, 2]
    # young v3 survived even though keep=1 would have doomed it
    assert _rows(versioned.read_snapshot(spark, root, 3)) == [(2, "x")]


def test_vacuum_retention_guard_protects_young_orphans(spark, tmp_path):
    """An uncommitted orphan below latest is reclaimed only once it is
    old enough to be a definite crash, not a mid-commit writer whose
    lock was leased away."""
    root = str(tmp_path / "vt")
    for i in range(3):
        versioned.commit_version(
            spark.createDataFrame([(i, "x")], ["k", "v"]), root)
    os.remove(f"{root}/v_00000001/_COMMITTED")   # young orphan below latest
    # backdate the aged-out committed version so only IT is eligible
    _backdate(f"{root}/v_00000002/_COMMITTED",
              versioned._DEFAULT_RETENTION_MS + 60_000)
    removed = versioned.vacuum_versions(spark, root, keep=1)
    assert removed == [2]
    assert os.path.isdir(f"{root}/v_00000001")   # orphan still present
    _backdate(f"{root}/v_00000001",
              versioned._DEFAULT_RETENTION_MS + 60_000)
    assert versioned.vacuum_versions(spark, root, keep=1) == [1]


def test_reader_on_old_version_survives_concurrent_vacuum(spark, tmp_path):
    """read_snapshot's immutability promise across a vacuum: a reader
    holding version N-1 (inside the retention window) completes its
    scan after a concurrent `vacuum_versions` call."""
    root = str(tmp_path / "vt")
    for i in range(3):
        versioned.commit_version(
            spark.createDataFrame([(i, "x")], ["k", "v"]), root)
    reader = versioned.read_snapshot(spark, root, 1)   # lazy — not yet scanned
    versioned.vacuum_versions(spark, root, keep=1)     # runs mid-"scan"
    assert _rows(reader) == [(0, "x")]                 # completes fine


def test_compaction_preserves_content_and_shrinks_files(spark, tmp_path):
    """compact_latest_version commits a NEW version with identical
    rows in ~target-sized files; the fragmented old version stays on
    disk for in-flight readers until vacuum reclaims it."""
    from pyspark.sql import functions as F
    root = str(tmp_path / "vt")
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
    versioned.commit_version(df.repartition(32), root)  # fragmented
    v1_files = glob.glob(f"{root}/v_*1/part-*.parquet")
    assert len(v1_files) == 32
    old_reader = versioned.read_snapshot(spark, root, 1)

    out = versioned.compact_latest_version(spark, root)
    assert out is not None
    new_v, n_files = out
    assert new_v == 2 and n_files == 1
    assert len(glob.glob(f"{root}/v_*2/part-*.parquet")) == 1
    assert _rows(versioned.read_snapshot(spark, root)) == _rows(df)
    # the pre-compaction snapshot is still fully readable
    assert old_reader.count() == 2000
    assert len(glob.glob(f"{root}/v_*1/part-*.parquet")) == 32


def test_compaction_loses_race_to_writer_without_erasing_rows(
        spark, tmp_path):
    """A writer landing between the compaction's snapshot read and its
    commit makes the base stale: the forced first attempt raises
    StaleBaseError, and the public retry loop re-compacts the NEW
    latest — the writer's row survives."""
    root = str(tmp_path / "vt")
    versioned.commit_version(
        spark.createDataFrame([(1, "a")], ["k", "v"]).repartition(4),
        root)
    base = versioned.latest_version(spark, root)
    stale_snap = versioned.read_snapshot(spark, root, base)
    # concurrent writer wins the race
    versioned.upsert_by_key_versioned(
        spark.createDataFrame([(2, "b")], ["k", "v"]), root, ["k"])
    # the compaction's stale first attempt must be rejected ...
    with pytest.raises(versioned.StaleBaseError):
        versioned.commit_version(stale_snap.repartition(1), root,
                                 base_version=base)
    # ... and the public API retries against the fresh latest
    out = versioned.compact_latest_version(spark, root)
    assert out is not None
    assert _rows(versioned.read_snapshot(spark, root)) == \
        [(1, "a"), (2, "b")]


def test_compaction_on_empty_table_is_noop(spark, tmp_path):
    assert versioned.compact_latest_version(
        spark, str(tmp_path / "vt")) is None
