"""Sinks — the reference's write patterns (SURVEY §2.1 S2-S4, S9),
re-expressed for a file-based lakehouse.

The reference hand-batches inserts (`execute_values`, SAVE_BATCH=10,
commit_every=100 — X10); Spark's task-commit protocol subsumes all of
that. What remains are the three upsert semantics and the filtered
export:

- S2 append: `df.write.mode("append")`.
- S3 delete-then-insert (replace all rows of a partition key):
  dynamic partition overwrite — the Spark form of
  `DELETE ... USING (VALUES %s)` + INSERT per (vid, model)
  (`client/async_processing_client.py:290-313`).
- S4 idempotent upsert (`INSERT ... ON CONFLICT DO UPDATE/NOTHING`):
  with Delta this is MERGE; on plain parquet it is read-existing ->
  anti-join -> union -> rewrite (emulated per partition to keep the
  rewrite bounded).
- S9 filtered logical dump (`create_dev_database.py:40-124`): a
  predicate-pushdown export — filter + partitioned write.

All writers sort within partitions on the natural read key (X12's
`CLUSTER` analog) so downstream scans get row-group skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_append(df: DataFrame, path: str,
                 partition_by: list[str] | None = None,
                 sort_by: list[str] | None = None) -> None:
    """S2 — batched insert sink. Task-level atomic commit replaces the
    reference's micro-transactions."""
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def replace_partitions(df: DataFrame, path: str,
                       partition_by: list[str],
                       sort_by: list[str] | None = None) -> None:
    """S3 — delete-then-insert upsert: replace exactly the partitions
    present in `df`, leave all others untouched (dynamic partition
    overwrite). This is the reference's per-(vid,model) score replace
    at file granularity."""
    # per-write dynamic mode (never a session-conf mutation — a
    # concurrent writer racing the restore could truncate the table)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    (df.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(*partition_by).parquet(path))


def upsert_by_key(df: DataFrame, path: str, keys: list[str],
                  do_update: bool = True) -> None:
    """S4 — idempotent upsert on plain parquet: existing rows whose
    keys collide are replaced (ON CONFLICT DO UPDATE) or kept
    (DO NOTHING). Emulation: read existing, anti-join one side, union,
    rewrite. With Delta/Iceberg on the cluster this is a MERGE — the
    emulation keeps the same contract for the parquet-only test env."""
    spark = df.sparkSession
    # Explicit existence check, not except-Exception around the read:
    # a CORRUPT existing table must fail loudly — treating it as
    # "first write" would overwrite it with only the incoming rows.
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        # A missing table dir + an orphaned __rewrite_old_* sibling
        # means a previous swap crashed BETWEEN its two renames: the
        # real table is the staged-aside dir. Recover it rather than
        # treating this as a first write (which would silently discard
        # every pre-crash row).
        orphans = _swap_orphans(fs, jvm, path, "old")
        if orphans:
            if len(orphans) > 1:
                raise IOError(
                    f"upsert_by_key: {len(orphans)} orphaned swap dirs at "
                    f"{path} ({orphans}); cannot pick one — recover manually")
            if not fs.rename(jvm.org.apache.hadoop.fs.Path(orphans[0]), jpath):
                raise IOError(
                    f"upsert_by_key: failed to recover {orphans[0]} -> {path}")
        else:
            df.dropDuplicates(keys).write.mode("overwrite").parquet(path)
            return
    existing = spark.read.parquet(path)
    incoming = df.dropDuplicates(keys)
    if do_update:
        keep = existing.join(incoming, keys, "left_anti")
        merged = keep.unionByName(incoming)
    else:
        new_only = incoming.join(existing, keys, "left_anti")
        merged = existing.unionByName(new_only)
    # Two distributed writes, zero driver materialization: the merged
    # result cannot be written straight over the files it is reading,
    # so stage it to a sibling temp dir, then swap via filesystem
    # rename (Hadoop FileSystem API — works for local/HDFS; on object
    # stores or with concurrent readers use Delta/Iceberg MERGE, which
    # this emulation stands in for). A driver-side collect here would
    # OOM on any real table.
    write_and_swap(merged, path)


def _swap_orphans(fs, jvm, path: str, kind: str) -> list[str]:
    """Sibling dirs left by a crashed swap: `{path}__rewrite_{kind}_*`."""
    base = path.rstrip("/")
    parent = jvm.org.apache.hadoop.fs.Path(base).getParent()
    if parent is None or not fs.exists(parent):
        return []
    prefix = f"{base}__rewrite_{kind}_"
    out = []
    for st in fs.listStatus(parent):
        p = st.getPath().toUri().getPath()
        if p.startswith(prefix):
            out.append(p)
    return sorted(out)


class ConcurrentWriterError(RuntimeError):
    """A second writer hit the table's swap lock."""


def _acquire_swap_lock(fs, jvm, path: str):
    """Enforced single-writer guard (not just a docstring contract):
    an atomically-created lock file serializes swaps. `createNewFile`
    is atomic on local/HDFS; a held lock raises loudly instead of
    letting two writers interleave their renames. Object stores lack
    atomic create — there, use a real lakehouse MERGE instead (the
    docstring of `upsert_by_key` says so)."""
    lock = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}__rewrite_lock")
    if not fs.createNewFile(lock):
        raise ConcurrentWriterError(
            f"write_and_swap: lock already held at {lock}. Another writer "
            f"is mid-swap (or crashed without cleanup — delete the lock "
            f"file after verifying no writer is alive).")
    return lock


def write_and_swap(df: DataFrame, path: str,
                   partition_by: list[str] | None = None) -> None:
    """Write `df` to a sibling temp dir, then atomically swap it into
    `path` via filesystem rename — the rewrite primitive every
    read-modify-write sink (upsert, compaction) shares. A lock file
    enforces single-writer; the temp dir is cleaned up if any step
    after the write raises; a crash between the two renames leaves a
    `__rewrite_old_*` dir that `upsert_by_key` detects and recovers.
    With `partition_by`, the rewrite preserves a partitioned layout —
    required when the target keeps receiving dynamic-partition
    overwrites (mixing bare files into a partitioned dir would break
    them). For SNAPSHOT-ISOLATED concurrent readers use
    `sources/versioned.py` (immutable version dirs + pointer)."""
    import uuid
    spark = df.sparkSession
    token = uuid.uuid4().hex[:8]
    tmp = f"{path.rstrip('/')}__rewrite_tmp_{token}"
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    lock = _acquire_swap_lock(fs, jvm, path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    old = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}__rewrite_old_{token}")
    try:
        try:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(tmp)
            # exists() first: some Hadoop FS impls THROW on a missing
            # rename source instead of returning false
            if not fs.exists(jpath) or not fs.rename(jpath, old):
                raise IOError(f"write_and_swap: could not stage {path} aside")
        except BaseException:
            fs.delete(jtmp, True)  # never leak the staged output
            raise
        if not fs.rename(jtmp, jpath):
            fs.rename(old, jpath)  # restore on failure
            fs.delete(jtmp, True)
            raise IOError(
                f"write_and_swap: could not swap new output into {path}")
        fs.delete(old, True)
    finally:
        fs.delete(lock, False)


def compact_parquet(spark: SparkSession, path: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and swap it in. Streaming sinks
    and per-batch appends accumulate tiny files; at 100 TB the
    scheduler and the parquet footer reads become the bottleneck long
    before the data does, so compaction to ~128 MB files is routine
    maintenance (the OPTIMIZE of the lakehouse engines). Returns the
    file count written."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-int(total) // target_file_bytes))
    df = spark.read.parquet(path)
    write_and_swap(df.repartition(n_files), path)
    return n_files


def filtered_export(source: DataFrame, path: str, predicate: str,
                    columns: list[str] | None = None,
                    partition_by: list[str] | None = None) -> None:
    """S9 — WHERE-pushdown export of a table subset (the reference's
    filtered pg_dump dev-database builder). The filter and projection
    reach the parquet scan via Catalyst pushdown."""
    df = source.filter(predicate)
    if columns:
        df = df.select(*columns)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_csv_source(spark: SparkSession, path: str, schema) -> DataFrame:
    """S7 — CSV bulk source with an explicit schema (never inferred for
    the core model — SURVEY §1.3)."""
    return spark.read.csv(path, header=True, schema=schema)


class JsonIngest:
    """Result of `read_json_source`: unpacks as `(good, bad)` for the
    common case; call `release()` once both splits are consumed to
    free the shared persisted parse (the two frames are filters over
    ONE persisted DataFrame — unpersisting either derived frame would
    not release it)."""

    def __init__(self, parsed: DataFrame, good: DataFrame, bad: DataFrame):
        self._parsed = parsed
        self.good = good
        self.bad = bad

    def __iter__(self):
        return iter((self.good, self.bad))

    def release(self) -> None:
        self._parsed.unpersist()


def read_json_source(spark: SparkSession, path: str, schema,
                     corrupt_col: str = "_corrupt_record") -> JsonIngest:
    """S7-adjacent: JSON-lines ingest with an explicit schema and
    PERMISSIVE corrupt-record capture — malformed API payloads (the
    reference ingests third-party transcript/API JSON) land in
    `corrupt_col` instead of killing the job, so the pipeline can
    quarantine them with a filter. Returns a `JsonIngest`
    (tuple-unpacks to (good_rows, corrupt_rows)).
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType
    full_schema = StructType(
        [*schema.fields, StructField(corrupt_col, StringType())])
    df = (spark.read
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", corrupt_col)
          .schema(full_schema)
          .json(path))
    # Spark requires persisting/materializing before referencing only
    # the corrupt column (the parser is lazy per-column). DISK_ONLY,
    # not MEMORY: a 100-TB JSON ingest must not pin executor storage
    # memory for the quarantine split — spilled blocks on local disk
    # are the scale-honest staging area (the alternative with the same
    # I/O shape is write-once-then-filter to a staging path).
    df = df.persist(StorageLevel.DISK_ONLY)
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return JsonIngest(df, good, bad)


def delete_by_key(spark: SparkSession, path: str, keys_df: DataFrame,
                  keys: list[str]) -> int:
    """Targeted delete on plain parquet — the right-to-be-forgotten /
    retention rewrite: drop every row whose key appears in `keys_df`
    and atomically swap the rewritten table in (same
    `write_and_swap` lock + crash-recovery discipline as
    `upsert_by_key`; with Delta/Iceberg this is DELETE WHERE).
    Returns the number of rows removed.

    The key set is deduplicated and joined anti-side (broadcast when
    small — the usual GDPR case is a handful of subjects against a
    huge table), so the rewrite is one distributed anti-join, never a
    driver-side key list. Zero matches short-circuits: no rewrite,
    no churn.

    NULL key values in `keys_df` are REJECTED, not silently dropped:
    a plain anti-join never matches NULL = NULL, so a null-keyed
    victim row would quietly delete nothing while the caller believes
    the subject was erased — the worst failure mode for a
    right-to-be-forgotten primitive. Callers with legitimately
    nullable keys must resolve them to concrete values first."""
    from pyspark.sql import functions as F
    existing = spark.read.parquet(path)
    victims = keys_df.select(*keys).dropDuplicates(keys)
    null_cond = None
    for k in keys:
        c = F.col(k).isNull()
        null_cond = c if null_cond is None else (null_cond | c)
    n_null = victims.filter(null_cond).count()
    if n_null:
        raise ValueError(
            f"delete_by_key: {n_null} victim row(s) carry NULL in key "
            f"columns {keys}; NULL never equi-matches, so these rows "
            f"would be silently ignored. Filter or resolve them first.")
    n_before = existing.count()
    kept = existing.join(victims, keys, "left_anti")
    n_after = kept.count()
    if n_after == n_before:
        return 0
    write_and_swap(kept, path)
    return n_before - n_after
