"""Every registered query with an oracle must match DuckDB at sf0.001.

This is the local mirror of the driver's t2 gate (the driver runs at
sf0.01; sf0.001 keeps the suite fast). Full-scale check:
`python tools/check_correctness.py /root/testdata/sf0.01`.
"""

from __future__ import annotations

import pytest

from tools.check_correctness import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


def _queries():
    from transcript_analysis_spark.plans import all_queries
    return sorted(all_queries().items())


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, _ in _queries()])
def test_no_unhashable_output_columns(spark, name):
    """The driver's harness canonicalizes results through pandas, which
    cannot hash array/map/struct cells (nation_segment_sets errored in
    round 1 exactly this way). Every registered query must emit only
    scalar columns — serialize collections to strings."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from transcript_analysis_spark.plans import all_queries
    df = all_queries()[name].fn(spark, SF_DIR)
    bad = [f.name for f in df.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not bad, (
        f"{name} outputs non-scalar columns {bad}; the driver harness "
        f"cannot hash them — serialize with concat_ws/sort_array")


@pytest.mark.parametrize("name", [n for n, _ in _queries()])
def test_query_matches_oracle(spark, duck, name):
    from transcript_analysis_spark.plans import all_queries
    q = all_queries()[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only smoke
        return
    res = duck.execute(q.oracle)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    ok, msg = compare(name, df, rows, cols)
    assert ok, msg


def test_approx_sketches_within_tolerance_of_exact(spark):
    """approx_order_stats has no SQL oracle (sketches are
    implementation-defined); its accuracy contract is pinned here:
    HLL++ distinct within 5% of exact, approx median within 5% of the
    exact interpolated median."""
    from pyspark.sql import functions as F
    from transcript_analysis_spark.plans import all_queries
    got = {r.o_orderpriority: r for r in
           all_queries()["approx_order_stats"].fn(spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = {r.o_orderpriority: r for r in
             (o.groupBy("o_orderpriority")
              .agg(F.countDistinct("o_custkey").alias("n_custs"),
                   F.expr("percentile(o_totalprice, 0.5)").alias("median"))
              .collect())}
    assert set(got) == set(exact)
    for k, e in exact.items():
        g = got[k]
        assert abs(g.approx_custs - e.n_custs) / e.n_custs <= 0.05, k
        assert abs(g.approx_median - e.median) / e.median <= 0.05, k


def test_comparator_rejects_every_mismatch_class(spark):
    """Meta-test of the gate itself: the comparator must FAIL on each
    class of defect it exists to catch — a comparator that cannot
    reject anything proves nothing when it passes 176 queries."""
    import pandas as pd

    df = spark.createDataFrame([(1, 2.5), (2, 3.5)], ["k", "v"])
    good_rows = [(1, 2.5), (2, 3.5)]

    ok, _ = compare("t", df, good_rows, ["k", "v"])
    assert ok

    ok, msg = compare("t", df, [(1, 2.5), (2, 3.75)], ["k", "v"])
    assert not ok and "col" in msg or "delta" in msg   # value mismatch

    ok, msg = compare("t", df, [(1, 2.5)], ["k", "v"])
    assert not ok and "row counts differ" in msg

    ok, msg = compare("t", df, good_rows, ["k", "w"])
    assert not ok and "columns differ" in msg

    # float-only drift is a ROUNDING-CONTRACT violation, not tolerance
    ok, msg = compare("t", df, [(1, 2.5000001), (2, 3.5)], ["k", "v"])
    assert not ok and "rounding contract" in msg

    # pandas dtype-kind skew (driver hashes through pandas)
    duck_pdf = pd.DataFrame({"k": pd.array([1.0, 2.0], dtype="float64"),
                             "v": [2.5, 3.5]})
    ok, msg = compare("t", df, good_rows, ["k", "v"], duck_pdf=duck_pdf)
    assert not ok and "dtype skew" in msg

    # non-scalar output columns would crash the driver's hasher
    arr = spark.createDataFrame([(1, [1, 2])], ["k", "a"])
    ok, msg = compare("t", arr, [(1, (1, 2))], ["k", "a"])
    assert not ok and "non-scalar" in msg
