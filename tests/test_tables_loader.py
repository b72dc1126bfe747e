"""Focused tests for the r14 loader hardening (sources/tables.py):

- register_views with an explicit empty list registers NOTHING
  (pre-r14 the falsy check silently registered all ten tables);
- directory parquet inputs are never schema-memoized (a part-file
  rewritten in place with identical size may not touch the directory
  mtime, so the stat key cannot prove freshness);
- the schema memo is bounded (FIFO eviction at _SCHEMA_MEMO_MAX);
- the oracle-parity confs self-heal on every load_table call (a
  foreign harness mutating the session timezone must not silently
  break DuckDB timestamp parity).
"""

from __future__ import annotations

from transcript_analysis_spark.sources import tables as T


def test_register_views_empty_list_registers_nothing(spark):
    before = {t.name for t in spark.catalog.listTables()}
    T.register_views(spark, "/root/testdata/sf0.001", tables=[])
    after = {t.name for t in spark.catalog.listTables()}
    assert after == before  # no new views


def test_register_views_scoped_list(spark):
    T.register_views(spark, "/root/testdata/sf0.001", tables=["region"])
    assert spark.table("region").count() > 0


def test_directory_input_not_memoized_and_rewrite_visible(spark, tmp_path):
    # Spark-written parquet DIRECTORY (the layout the advice flagged)
    p = f"{tmp_path}/t.parquet"
    spark.range(3).selectExpr("id as a").coalesce(1).write.parquet(p)
    df1 = T.load_table(spark, str(tmp_path), "t")
    assert df1.schema.fieldNames() == ["a"]
    assert not any(isinstance(k, tuple) and k[0] == p
                   for k in T._SCHEMA_MEMO)  # never memoized
    # rewrite the directory with a DIFFERENT schema; the loader must
    # serve the new schema immediately (no stale memo possible)
    spark.range(3).selectExpr("id as b").coalesce(1).write \
        .mode("overwrite").parquet(p)
    df2 = T.load_table(spark, str(tmp_path), "t")
    assert df2.schema.fieldNames() == ["b"]


def test_schema_memo_fifo_cap(spark, tmp_path):
    spark.range(1).selectExpr("id as x").coalesce(1).write.parquet(
        f"{tmp_path}/dir.parquet")
    # single-FILE tables memoize; synthesize near-cap pressure
    saved = dict(T._SCHEMA_MEMO)
    try:
        T._SCHEMA_MEMO.clear()
        for i in range(T._SCHEMA_MEMO_MAX):
            T._SCHEMA_MEMO[(f"fake{i}", 0.0, i)] = None
        T.load_table(spark, "/root/testdata/sf0.001", "region")
        assert len(T._SCHEMA_MEMO) <= T._SCHEMA_MEMO_MAX
        # the real entry survived the FIFO eviction, a fake one left
        assert any(isinstance(k, tuple) and k[0].endswith("region.parquet")
                   for k in T._SCHEMA_MEMO)
    finally:
        T._SCHEMA_MEMO.clear()
        T._SCHEMA_MEMO.update(saved)


def test_oracle_parity_confs_self_heal(spark):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        T.load_table(spark, "/root/testdata/sf0.001", "region")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
