"""Z-order write layout (sources/layout.py): prove, from the parquet
footers themselves, that Z-ordered files are prunable on BOTH
dimensions — the property that turns min/max stats into skipped I/O
at 100 TB."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _file_spans(path: str, col: str) -> list[int]:
    """Per-file (max - min) of a column, straight from footer stats."""
    spans = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        assert lo is not None, f"no stats for {col} in {f}"
        spans.append(hi - lo)
    return spans


def test_zorder_layout_shrinks_file_spans_on_both_dims(spark, tmp_path):
    """On a uniform 2-D key grid, a Z-run of 1/16 of the curve covers
    a ~quarter-side square block, so per-file min/max spans shrink on
    BOTH dimensions versus round-robin files that each span the whole
    domain. (The sf0.001 orders table is too asymmetric for this to
    show — custkey has ~7 significant bits against day's ~12 — so the
    geometry is pinned on a symmetric grid; the orders round-trip is
    covered below.)"""
    from transcript_analysis_spark.sources.layout import zorder_write

    grid = spark.range(0, 4096).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 2654435761) % 256).alias("a"),
        ((F.col("id") * 40503) % 256).alias("b"))

    n_files = 16
    base = str(tmp_path / "roundrobin")
    zpath = str(tmp_path / "zordered")
    grid.repartition(n_files).write.mode("overwrite").parquet(base)
    zorder_write(grid, "a", "b", zpath, n_files=n_files)

    assert len(glob.glob(os.path.join(zpath, "part-*.parquet"))) == n_files

    for col in ("a", "b"):
        rr = _file_spans(base, col)
        zz = _file_spans(zpath, col)
        # round-robin: every file spans ~the whole domain; z-order:
        # each file covers one Z-run, so both dims shrink sharply
        assert sum(zz) / len(zz) < 0.5 * sum(rr) / len(rr), (
            f"{col}: z-ordered mean span {sum(zz)/len(zz):.0f} vs "
            f"round-robin {sum(rr)/len(rr):.0f}")


def test_zorder_layout_preserves_rows(spark, tmp_path):
    from transcript_analysis_spark.sources.layout import zorder_write
    from transcript_analysis_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders")
    zpath = str(tmp_path / "z")
    zorder_write(orders, "o_custkey % 65536",
                 "datediff(o_orderdate, '1995-01-01') % 65536", zpath,
                 n_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert "__zorder_key" not in back.columns
    # same key sets
    a = {r[0] for r in orders.select("o_orderkey").collect()}
    b = {r[0] for r in back.select("o_orderkey").collect()}
    assert a == b


def _file_minmax(path: str, col: str) -> list[tuple]:
    import glob
    import pyarrow.parquet as pq
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def test_range_sorted_write_produces_disjoint_sorted_files(spark, tmp_path):
    """Files carry disjoint, ordered key ranges (footer-verified) and
    each file is internally sorted — a globally-ordered export with no
    single-task sort."""
    from transcript_analysis_spark.sources.layout import range_sorted_write
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "sorted")
    range_sorted_write(docs, ["n_chars", "doc_id"], out, n_files=8)

    spans = _file_minmax(out, "n_chars")
    assert len(spans) >= 2
    # non-overlapping ascending ranges across files
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (hi1, lo2)

    # internally sorted + nothing lost
    import glob
    import pyarrow.parquet as pq
    total = 0
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        t = pq.read_table(f, columns=["n_chars"]).to_pydict()["n_chars"]
        assert t == sorted(t)
        total += len(t)
    assert total == docs.count()
