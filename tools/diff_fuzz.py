"""Differential query fuzzer — seeded GENERATED plans run on both
engines (Spark DataFrame API vs DuckDB) and compared exactly.

The 187 hand-written oracles pin every registered operator; this tool
extends the same discipline to generated coverage: a seeded grammar
draws typed query specs (FK-join chains incl. LEFT joins with forced
unmatched rows, correlated EXISTS/NOT EXISTS, filters, grouped exact
aggregates, HAVING, NULL injection via NULLIF, NULL group keys,
total-order top-k) over
the test tables, renders each spec BOTH as a Spark DataFrame program
and as DuckDB SQL, and compares results with the oracle harness's own
order-insensitive, pandas-dtype-aware comparator
(tools/check_correctness.compare). It hunts the class of bug the
per-query oracles cannot: a semantics divergence (NULL grouping,
NULLIF typing, CASE branches, join multiplicity, HAVING placement,
timestamp-literal comparison) sitting in a plan shape no hand-written
query happens to exercise.

Exact by construction: generated aggregates stay in exact-integer
territory — counts, COUNT(DISTINCT), integer sums, cents-quantized
money sums (CAST(ROUND(x*100) AS BIGINT): the *100 product is the
same IEEE double in both engines and both round ties away from zero),
and min/max over ints/strings/microsecond timestamps. The only float
operations are literal comparisons and that quantization, so any
mismatch is a real divergence, never accumulation noise. events.ts is
kept out of MIN/MAX outputs (DuckDB preserves nanos where the Spark
loader floor-truncates to micros — comparisons against whole-second
literals are unaffected, raw extrema are not).

Known engine divergence, found by this fuzzer's first full sweep and
encoded (see the adapter comment in to_sql + the pin in
tests/test_diff_fuzz.py): Spark emits ZERO rows for ROLLUP/CUBE/
GROUPING SETS over an empty input where the SQL standard (DuckDB,
Postgres) emits the grand-total row; the DuckDB rendering appends
HAVING COUNT(*) > 0 to rollup/cube specs to model Spark exactly.

Scalar expressions are rendered ONCE as SQL text shared verbatim by
both sides (the dialect subset used is identical); the STRUCTURE
(scan -> join -> filter -> groupBy -> agg -> having) goes through the
DataFrame API on the Spark side, so the fuzz also walks the
API-assembly path the engine's registered plans use.

Usage:
  python tools/diff_fuzz.py [n_seeds] [sf_dir] [--start K] [--no-shrink]
                            [--mode frame|asof|interval|scalar|json|hof|setop|legacy]
`--mode` runs the first n_seeds seeds whose generated spec belongs to
that mode (generation is ~free; only matching specs execute).
exit 1 on any mismatch; prints each failing seed's SQL for replay plus
a greedily SHRUNKEN still-failing spec (clauses dropped to a fixpoint)
so a divergence arrives pre-triaged.
"""

from __future__ import annotations

import os
import random
import sys
from dataclasses import dataclass, field

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO_ROOT, os.path.join(_REPO_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)


# --- typed column catalog --------------------------------------------------
# kinds: int (exact, modulo-friendly), lowint (int with a small known
# range: safe for =/<= literals and GROUP BY), money (double: literal
# compares + cents quantization), cat (string with a known value pool),
# date (microsecond timestamp), nsdate (nanos in duck, micros in spark:
# predicates/extracts only, never MIN/MAX output).

TABLE_COLS: dict[str, dict[str, list]] = {
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey"],
        "lowint": [("l_linenumber", 1, 7)],
        "money": [("l_extendedprice", 900.0, 105000.0),
                  ("l_quantity", 1.0, 50.0),
                  ("l_discount", 0.0, 0.1)],
        "cat": [("l_returnflag", ("A", "N", "R")),
                ("l_linestatus", ("F", "O"))],
        "date": [("l_shipdate", 1995, 2001)],
    },
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "lowint": [],
        "money": [("o_totalprice", 1000.0, 500000.0)],
        "cat": [("o_orderstatus", ("F", "O", "P")),
                ("o_orderpriority", ("1-URGENT", "2-HIGH", "3-MEDIUM",
                                     "4-NOT SPECIFIED", "5-LOW"))],
        "date": [("o_orderdate", 1995, 2001)],
    },
    "customer": {
        "int": ["c_custkey"],
        "lowint": [("c_nationkey", 0, 24)],
        "money": [("c_acctbal", -999.0, 9999.0)],
        "cat": [("c_mktsegment", ("AUTOMOBILE", "BUILDING", "FURNITURE",
                                  "HOUSEHOLD", "MACHINERY"))],
        "date": [],
    },
    "part": {
        "int": ["p_partkey"],
        "lowint": [("p_size", 1, 50)],
        "money": [("p_retailprice", 900.0, 2000.0)],
        "cat": [("p_type", ("ECONOMY", "LARGE", "MEDIUM", "PROMO",
                            "SMALL", "STANDARD")),
                ("p_brand", tuple(f"Brand#{i}" for i in range(1, 26)))],
        "date": [],
    },
    "supplier": {
        "int": ["s_suppkey"],
        "lowint": [("s_nationkey", 0, 24)],
        "money": [("s_acctbal", -999.0, 9999.0)],
        "cat": [],
        "date": [],
    },
    "nation": {
        "int": [],
        "lowint": [("n_nationkey", 0, 24), ("n_regionkey", 0, 4)],
        "money": [],
        "cat": [],
        "date": [],
    },
    "region": {
        "int": [],
        "lowint": [("r_regionkey", 0, 4)],
        "money": [],
        "cat": [],
        "date": [],
    },
    "events": {
        "int": ["event_id", "user_id"],
        "lowint": [],
        "money": [("value", 0.0, 100.0)],
        "cat": [("event_type", ("click", "error", "purchase",
                                "signup", "view"))],
        "date": [],
        "nsdate": [("ts", 2024, 2024)],
    },
    "documents": {
        "int": ["doc_id", "n_chars"],
        "lowint": [],
        "money": [],
        "cat": [("lang", ("de", "en", "es", "fr", "zh")),
                ("source", tuple(f"src{i}" for i in range(20)))],
        "date": [],
    },
}

# FK edges for join chains (either endpoint may already be joined).
FK_EDGES = [
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("lineitem", "supplier", "l_suppkey = s_suppkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey"),
    ("nation", "region", "n_regionkey = r_regionkey"),
]

BASE_TABLES = ["lineitem", "orders", "customer", "part", "supplier",
               "events", "documents"]


@dataclass
class QuerySpec:
    """One generated query: structure + shared-dialect SQL fragments.

    ``joins`` entries are (right_table, cond_sql, how, right_filter):
    how is "inner" or "left"; right_filter (LEFT only, dim side only)
    pre-filters the right table so unmatched rows EXIST and the
    null-extended columns flow into group keys and aggregates — in
    TPC-H-ish data every FK resolves, so an unfiltered fact->dim LEFT
    JOIN would degenerate to INNER and test nothing."""
    seed: int
    tables: list = field(default_factory=list)   # join order, base first
    joins: list = field(default_factory=list)
    # semi/anti joins: (table, cond_sql, anti, table_filter) — rendered
    # as correlated [NOT] EXISTS in SQL, left_semi/left_anti in the
    # DataFrame API; the table's columns never enter the output scope
    semis: list = field(default_factory=list)
    where: str | None = None
    # "plain" | "rollup" | "cube": subtotal rows are part of the
    # multiset compare (a NULL-valued key row and a subtotal row
    # project identically — BOTH engines emit both rows, so the
    # multisets still agree without projecting GROUPING())
    group_mode: str = "plain"
    group_exprs: list = field(default_factory=list)
    agg_exprs: list = field(default_factory=list)
    having_min: int | None = None                # on a1 == COUNT(*)
    # top-k: ORDER BY every output column (a TOTAL order on row
    # content, so the selected multiset is deterministic even with
    # ties at the boundary) + LIMIT. order_by = [(alias, asc)];
    # NULLS FIRST (asc) / NULLS LAST (desc) rendered explicitly in
    # SQL to match the Spark defaults.
    order_by: list = field(default_factory=list)
    limit: int | None = None
    # window mode (replaces grouping/aggregates when set): per-group
    # top-k detail rows via ROW_NUMBER() over a low-cardinality
    # partition key, ordered by EVERY projected column (total order on
    # row content: rows tying on all projected columns are
    # interchangeable, so the selected multiset is deterministic).
    # win_cols = [(expr, asc)] aliased c1..cn; events.ts never appears
    # (nanos-vs-micros skew); win_k bounds output to |partitions|*k.
    win_partition: str | None = None
    win_cols: list = field(default_factory=list)
    win_k: int | None = None
    # set-op mode (single-table; replaces joins/grouping when set):
    # two filtered branches over the SAME table, identical exact
    # projections (NULLIF-injected to exercise set-op null-safe
    # equality — NULLs compare EQUAL under UNION/INTERSECT/EXCEPT,
    # unlike join keys), combined by setop_kind, then rolled into a
    # grouped count so output stays bounded and order-free.
    setop_kind: str | None = None   # UNION [ALL] | INTERSECT [ALL] | EXCEPT [ALL]
    setop_cols: list = field(default_factory=list)  # shared projections
    setop_filters: tuple = ()       # (filter1, filter2), either may be None

    def _from_where(self) -> str:
        frm = self.tables[0]
        for rt, cond, how, rf in self.joins:
            kw = "LEFT JOIN" if how == "left" else "JOIN"
            src = (f"(SELECT * FROM {rt} WHERE {rf}) AS {rt}"
                   if rf else rt)
            frm += f" {kw} {src} ON {cond}"
        conds = [self.where] if self.where else []
        for st, cond, anti, sf in self.semis:
            inner = cond + (f" AND {sf}" if sf else "")
            neg = "NOT " if anti else ""
            conds.append(f"{neg}EXISTS (SELECT 1 FROM {st} WHERE {inner})")
        return frm + (" WHERE " + " AND ".join(conds) if conds else "")

    def to_sql(self) -> str:
        if self.setop_kind is not None:
            t = self.tables[0]
            sel = ", ".join(f"{e} AS c{i + 1}"
                            for i, e in enumerate(self.setop_cols))
            branches = []
            for flt in self.setop_filters:
                w = f" WHERE {flt}" if flt else ""
                branches.append(f"SELECT {sel} FROM {t}{w}")
            aliases = ", ".join(f"c{i + 1}"
                                for i in range(len(self.setop_cols)))
            return (f"SELECT {aliases}, CAST(COUNT(*) AS BIGINT) AS n "
                    f"FROM ({branches[0]} {self.setop_kind} {branches[1]})"
                    f" t GROUP BY {aliases}")
        if self.win_partition is not None:
            order = ", ".join(
                f"{e} {'ASC NULLS FIRST' if asc else 'DESC NULLS LAST'}"
                for e, asc in self.win_cols)
            sel = [f"{e} AS c{i + 1}"
                   for i, (e, _asc) in enumerate(self.win_cols)]
            sel.append(f"ROW_NUMBER() OVER (PARTITION BY "
                       f"{self.win_partition} ORDER BY {order}) AS rn")
            return (f"SELECT * FROM (SELECT {', '.join(sel)} FROM "
                    f"{self._from_where()}) t WHERE rn <= {self.win_k}")
        sel = [f"{e} AS g{i + 1}" for i, e in enumerate(self.group_exprs)]
        sel += [f"{e} AS a{i + 1}" for i, e in enumerate(self.agg_exprs)]
        sql = f"SELECT {', '.join(sel)} FROM {self._from_where()}"
        if self.group_exprs:
            keys = ", ".join(self.group_exprs)
            if self.group_mode == "rollup":
                sql += f" GROUP BY ROLLUP ({keys})"
            elif self.group_mode == "cube":
                sql += f" GROUP BY CUBE ({keys})"
            else:
                sql += f" GROUP BY {keys}"
        if self.having_min is not None:
            sql += f" HAVING COUNT(*) >= {self.having_min}"
        elif self.group_mode != "plain":
            # KNOWN ENGINE DIVERGENCE (found by this fuzzer, seeds
            # 168/223/226/261/277 of the v5 sweep): over an EMPTY
            # input, SQL-standard ROLLUP/CUBE emit one grand-total
            # row (DuckDB, Postgres) while Spark emits zero rows —
            # Spark expands grouping sets and aggregates keyed by
            # grouping-id, and a grouped aggregate over empty input
            # has no groups. Every rollup/cube row over NON-empty
            # input aggregates >= 1 row, so HAVING COUNT(*) > 0 on
            # the DuckDB side models Spark's semantics exactly and
            # changes nothing else. Pinned in tests/test_diff_fuzz.py.
            sql += " HAVING COUNT(*) > 0"
        if self.limit is not None:
            terms = [f"{c} {'ASC NULLS FIRST' if asc else 'DESC NULLS LAST'}"
                     for c, asc in self.order_by]
            sql += f" ORDER BY {', '.join(terms)} LIMIT {self.limit}"
        return sql

    def to_spark(self, spark, sf_dir: str):
        from pyspark.sql import functions as F

        from transcript_analysis_spark.sources.tables import load_table
        df = load_table(spark, sf_dir, self.tables[0])
        if self.setop_kind is not None:
            cols = [F.expr(e).alias(f"c{i + 1}")
                    for i, e in enumerate(self.setop_cols)]
            branches = []
            for flt in self.setop_filters:
                b = df.filter(F.expr(flt)) if flt else df
                branches.append(b.select(*cols))
            a, b = branches
            combined = {
                "UNION ALL": lambda: a.unionAll(b),
                "UNION": lambda: a.unionAll(b).distinct(),
                "INTERSECT": lambda: a.intersect(b),
                "INTERSECT ALL": lambda: a.intersectAll(b),
                "EXCEPT": lambda: a.subtract(b),      # EXCEPT DISTINCT
                "EXCEPT ALL": lambda: a.exceptAll(b),
            }[self.setop_kind]()
            return (combined.groupBy(*[F.col(f"c{i + 1}")
                                       for i in range(len(self.setop_cols))])
                    .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")))
        for rt, cond, how, rf in self.joins:
            right = load_table(spark, sf_dir, rt)
            if rf:
                right = right.filter(F.expr(rf))
            df = df.join(right, F.expr(cond), how)
        for st, cond, anti, sf in self.semis:
            right = load_table(spark, sf_dir, st)
            if sf:
                right = right.filter(F.expr(sf))
            df = df.join(right, F.expr(cond),
                         "left_anti" if anti else "left_semi")
        if self.where:
            df = df.filter(F.expr(self.where))
        if self.win_partition is not None:
            from pyspark.sql import Window
            order = [F.expr(e).asc_nulls_first() if asc
                     else F.expr(e).desc_nulls_last()
                     for e, asc in self.win_cols]
            w = Window.partitionBy(F.expr(self.win_partition)).orderBy(*order)
            cols = [F.expr(e).alias(f"c{i + 1}")
                    for i, (e, _asc) in enumerate(self.win_cols)]
            return (df.select(*cols, F.row_number().over(w).alias("rn"))
                    .filter(F.col("rn") <= F.lit(self.win_k)))
        gcols = [F.expr(e).alias(f"g{i + 1}")
                 for i, e in enumerate(self.group_exprs)]
        aggs = [F.expr(e).alias(f"a{i + 1}")
                for i, e in enumerate(self.agg_exprs)]
        if not gcols:
            out = df.agg(*aggs)
        elif self.group_mode == "rollup":
            out = df.rollup(*gcols).agg(*aggs)
        elif self.group_mode == "cube":
            out = df.cube(*gcols).agg(*aggs)
        else:
            out = df.groupBy(*gcols).agg(*aggs)
        if self.having_min is not None:
            out = out.filter(F.col("a1") >= F.lit(self.having_min))
        if self.limit is not None:
            cols = [F.col(c).asc_nulls_first() if asc
                    else F.col(c).desc_nulls_last()
                    for c, asc in self.order_by]
            out = out.orderBy(*cols).limit(self.limit)
        return out


# --- window-frame mode -----------------------------------------------------
# Fuzzes ROWS/RANGE frame specs (the `rolling_7day_revenue` /
# `customer_running_total` class, plans/warehouse.py + relational.py)
# through the DataFrame Window API vs the identical SQL frame clause.
# Determinism: the ORDER BY column is either the table's unique key
# (total order — every window function allowed) or a non-unique
# numeric column restricted to RANGE-frame aggregates (peers are all
# included, so SUM/COUNT/MIN/MAX are order-insensitive within ties).

UNIQUE_KEYS = {"orders": "o_orderkey", "customer": "c_custkey",
               "part": "p_partkey", "supplier": "s_suppkey",
               "events": "event_id", "documents": "doc_id"}

# string-typed columns per table for the scalar mode (cat pools plus
# the free-text/name columns the cat catalog doesn't track)
STRING_COLS = {
    "customer": ["c_name", "c_mktsegment"],
    "orders": ["o_orderpriority", "o_orderstatus"],
    "part": ["p_name", "p_brand", "p_type"],
    "supplier": ["s_name"],
    "documents": ["text", "lang", "source"],
    "events": ["event_type"],
}


@dataclass
class FrameSpec:
    """Windowed-frame query: per-row window aggregates/offsets over one
    table, identical OVER clause on both engines.

    ``frame`` is ("rows"|"range", lo, hi) with bounds encoded as
    None = UNBOUNDED, 0 = CURRENT ROW, -k = k PRECEDING,
    +k = k FOLLOWING; None = use each engine's DEFAULT frame (RANGE
    UNBOUNDED PRECEDING..CURRENT ROW per the standard — itself a fuzz
    target). ``funcs`` entries are (kind, expr, offset)."""
    seed: int
    table: str
    partition: str | None
    order_col: str
    order_asc: bool
    order_unique: bool
    frame: tuple | None
    funcs: list = field(default_factory=list)
    where: str | None = None

    def _bound_sql(self, v, default_side: str) -> str:
        if v is None:
            return f"UNBOUNDED {default_side}"
        if v == 0:
            return "CURRENT ROW"
        return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"

    def _over_sql(self, with_frame: bool) -> str:
        parts = []
        if self.partition:
            parts.append(f"PARTITION BY {self.partition}")
        parts.append(f"ORDER BY {self.order_col} "
                     f"{'ASC' if self.order_asc else 'DESC'}")
        if with_frame and self.frame is not None:
            ftype, lo, hi = self.frame
            parts.append(f"{ftype.upper()} BETWEEN "
                         f"{self._bound_sql(lo, 'PRECEDING')} AND "
                         f"{self._bound_sql(hi, 'FOLLOWING')}")
        return "OVER (" + " ".join(parts) + ")"

    def _func_sql(self, kind: str, expr, off) -> str:
        over_f = self._over_sql(True)
        over_p = self._over_sql(False)
        if kind == "sum":
            return f"CAST(SUM({expr}) {over_f} AS BIGINT)"
        if kind == "count_star":
            return f"CAST(COUNT(*) {over_f} AS BIGINT)"
        if kind == "count":
            return f"CAST(COUNT({expr}) {over_f} AS BIGINT)"
        if kind in ("min_int", "max_int"):
            fn = kind[:3].upper()
            return f"CAST({fn}({expr}) {over_f} AS BIGINT)"
        if kind in ("min_str", "max_str"):
            return f"{kind[:3].upper()}({expr}) {over_f}"
        if kind in ("lag", "lead"):
            return f"CAST({kind.upper()}({expr}, {off}) {over_p} AS BIGINT)"
        assert kind == "row_number", kind
        return f"CAST(ROW_NUMBER() {over_p} AS BIGINT)"

    def to_sql(self) -> str:
        uk = UNIQUE_KEYS[self.table]
        sel = [f"{uk} AS k"]
        sel += [f"{self._func_sql(*f)} AS w{i + 1}"
                for i, f in enumerate(self.funcs)]
        w = f" WHERE {self.where}" if self.where else ""
        return f"SELECT {', '.join(sel)} FROM {self.table}{w}"

    def to_spark(self, spark, sf_dir: str):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from transcript_analysis_spark.sources.tables import load_table
        df = load_table(spark, sf_dir, self.table)
        if self.where:
            df = df.filter(F.expr(self.where))
        ordc = (F.expr(self.order_col).asc() if self.order_asc
                else F.expr(self.order_col).desc())
        base = (Window.partitionBy(F.expr(self.partition))
                if self.partition else Window.partitionBy())
        base = base.orderBy(ordc)
        if self.frame is not None:
            ftype, lo, hi = self.frame
            lo = Window.unboundedPreceding if lo is None else lo
            hi = Window.unboundedFollowing if hi is None else hi
            framed = (base.rowsBetween(lo, hi) if ftype == "rows"
                      else base.rangeBetween(lo, hi))
        else:
            framed = base  # engine-default frame — itself under test
        cols = [F.col(UNIQUE_KEYS[self.table]).alias("k")]
        for i, (kind, expr, off) in enumerate(self.funcs):
            if kind == "sum":
                c = F.sum(F.expr(expr)).over(framed).cast("long")
            elif kind == "count_star":
                c = F.count(F.lit(1)).over(framed).cast("long")
            elif kind == "count":
                c = F.count(F.expr(expr)).over(framed).cast("long")
            elif kind in ("min_int", "min_str"):
                c = F.min(F.expr(expr)).over(framed)
                if kind == "min_int":
                    c = c.cast("long")
            elif kind in ("max_int", "max_str"):
                c = F.max(F.expr(expr)).over(framed)
                if kind == "max_int":
                    c = c.cast("long")
            elif kind == "lag":
                c = F.lag(F.expr(expr), off).over(base).cast("long")
            elif kind == "lead":
                c = F.lead(F.expr(expr), off).over(base).cast("long")
            else:
                c = F.row_number().over(base).cast("long")
            cols.append(c.alias(f"w{i + 1}"))
        return df.select(*cols)

    def shrink_steps(self):
        import copy

        def clone(**kw):
            s = copy.deepcopy(self)
            for k, v in kw.items():
                setattr(s, k, v)
            return s

        if self.where is not None:
            yield clone(where=None)
        for i in range(len(self.funcs) - 1, -1, -1):
            if len(self.funcs) > 1:
                yield clone(funcs=self.funcs[:i] + self.funcs[i + 1:])
        if self.partition is not None:
            yield clone(partition=None)
        if self.frame is not None:
            yield clone(frame=None)


def gen_frame(rng: random.Random, seed: int) -> FrameSpec:
    table = rng.choice(sorted(UNIQUE_KEYS))
    uk = UNIQUE_KEYS[table]
    lowints = [c for c, _, _ in TABLE_COLS[table]["lowint"]]
    if lowints and rng.random() < 0.3:
        order_col, unique = rng.choice(lowints), False
    else:
        order_col, unique = uk, True
    spec = FrameSpec(seed=seed, table=table, partition=None,
                     order_col=order_col, order_asc=rng.random() < 0.7,
                     order_unique=unique, frame=None)
    part_cands = ([c for c, _ in TABLE_COLS[table].get("cat", [])]
                  + [c for c in lowints if c != order_col])
    if rng.random() < 0.8:
        if part_cands and rng.random() < 0.7:
            spec.partition = rng.choice(part_cands)
        else:
            spec.partition = f"{uk} % {rng.randint(2, 8)}"
    # frame: RANGE offsets scale with the order column's value spread
    if not unique or rng.random() < 0.85:
        ftype = "range" if (not unique or rng.random() < 0.5) else "rows"
        k = rng.randint(1, 50 if (ftype == "range" and unique) else 6)
        m = rng.randint(1, 50 if (ftype == "range" and unique) else 6)
        lo, hi = rng.choice([(None, 0), (-k, 0), (-k, m), (0, None),
                             (-k, None), (None, m), (1, 1 + m),
                             (-k - m, -k)])
        spec.frame = (ftype, lo, hi)
    kinds = ["sum", "count_star", "count", "min_int", "max_int"]
    if TABLE_COLS[table].get("cat"):
        kinds += ["min_str", "max_str"]
    if unique:  # offsets/ranks need a total order
        kinds += ["lag", "lead", "row_number"]
    for kind in rng.sample(kinds, rng.randint(1, 3)):
        expr, off = None, None
        if kind in ("sum", "count", "min_int", "max_int", "lag", "lead"):
            expr = _int_sum_expr(rng, [table]) or uk
        elif kind in ("min_str", "max_str"):
            expr = rng.choice(TABLE_COLS[table]["cat"])[0]
        if kind in ("lag", "lead"):
            off = rng.randint(1, 3)
        spec.funcs.append((kind, expr, off))
    if rng.random() < 0.5:
        spec.where = _predicate(rng, [table])
    return spec


# --- temporal mode: as-of + interval joins ---------------------------------
# Fuzzes the repo's riskiest bespoke semantics: operators/asof.py's
# union-then-window as-of composition (DuckDB's native ASOF JOIN is
# the oracle) and the equi-key + range-predicate interval join
# (plans/relational.py shipdate_within_order_window shape). The right
# side of an as-of is deduped per (key, ts) on BOTH engines so
# equal-ts tie-breaking cannot differ; payloads are coalesced non-null
# so matched-ness and payload-nullness coincide (the engine treats the
# picked right ROW, not a payload cell, as the match marker).

ASOF_PAIRS = {
    # events.ts is nanos in DuckDB vs micros in Spark — second-truncate
    # on both sides so the as-of inequality compares identical values
    "events": dict(
        key="user_id", ts="date_trunc('second', ts)",
        pay="coalesce(CAST(ROUND(value * 100) AS BIGINT), 0)",
        g_opts=["event_type", "user_id % 5"],
        tol_opts=[300, 3600, 86400, 604800]),
    "orders": dict(
        key="o_custkey", ts="o_orderdate",
        pay="coalesce(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0)",
        g_opts=["o_orderpriority", "o_orderstatus", "o_custkey % 7"],
        tol_opts=[d * 86400 for d in (7, 30, 90, 365)]),
    "lineitem": dict(
        key="l_suppkey", ts="l_shipdate",
        pay="coalesce(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0)",
        g_opts=["l_returnflag", "l_linestatus", "l_suppkey % 5"],
        tol_opts=[d * 86400 for d in (7, 30, 90, 365)]),
}


@dataclass
class AsofSpec:
    """As-of join fuzz case: engine asof_join vs DuckDB ASOF JOIN,
    rolled into a grouped exact aggregate so output stays bounded."""
    seed: int
    table: str
    direction: str            # backward | forward
    how: str                  # left | inner
    tol_seconds: int | None
    left_filter: str | None
    right_filter: str | None
    group_expr: str = "1"

    def to_sql(self) -> str:
        cfg = ASOF_PAIRS[self.table]
        lf = f" WHERE {self.left_filter}" if self.left_filter else ""
        rf = f" WHERE {self.right_filter}" if self.right_filter else ""
        op = ">=" if self.direction == "backward" else "<="
        kw = "ASOF LEFT JOIN" if self.how == "left" else "ASOF JOIN"
        tol = ""
        if self.tol_seconds is not None:
            tol_pred = (f"ABS(epoch(l.ats) - epoch(r0.ats)) "
                        f"<= {self.tol_seconds}")
            if self.how == "left":
                pay2 = f"CASE WHEN {tol_pred} THEN r0.pay END"
            else:
                pay2, tol = "r0.pay", f" WHERE {tol_pred}"
        else:
            pay2 = "r0.pay"
        return f"""
        WITH l AS (SELECT {cfg['key']} AS k, {cfg['ts']} AS ats,
                          {self.group_expr} AS g FROM {self.table}{lf}),
        r0 AS (SELECT {cfg['key']} AS k, {cfg['ts']} AS ats,
                      MAX({cfg['pay']}) AS pay
               FROM {self.table}{rf} GROUP BY 1, 2),
        j AS (SELECT l.g AS g, {pay2} AS pay2
              FROM l {kw} r0 ON l.k = r0.k AND l.ats {op} r0.ats{tol})
        SELECT g, CAST(COUNT(*) AS BIGINT) AS a1,
               CAST(COUNT(pay2) AS BIGINT) AS a2,
               CAST(COALESCE(SUM(pay2), 0) AS BIGINT) AS a3
        FROM j GROUP BY g"""

    def to_spark(self, spark, sf_dir: str):
        from pyspark.sql import functions as F

        from transcript_analysis_spark.operators.asof import asof_join
        from transcript_analysis_spark.sources.tables import load_table
        cfg = ASOF_PAIRS[self.table]
        t = load_table(spark, sf_dir, self.table)
        lt = t.filter(F.expr(self.left_filter)) if self.left_filter else t
        left = lt.select(F.expr(cfg["key"]).alias("k"),
                         F.expr(cfg["ts"]).alias("ats"),
                         F.expr(self.group_expr).alias("g"))
        rt = t.filter(F.expr(self.right_filter)) if self.right_filter else t
        right = (rt.select(F.expr(cfg["key"]).alias("k"),
                           F.expr(cfg["ts"]).alias("ats"),
                           F.expr(cfg["pay"]).alias("pay0"))
                 .groupBy("k", "ats").agg(F.max("pay0").alias("pay")))
        joined = asof_join(left, right, key="k", ts="ats",
                           payload_cols=["pay"], how=self.how,
                           direction=self.direction,
                           tolerance=self.tol_seconds)
        return (joined.groupBy("g")
                .agg(F.count(F.lit(1)).cast("long").alias("a1"),
                     F.count("asof_pay").cast("long").alias("a2"),
                     F.coalesce(F.sum("asof_pay"), F.lit(0))
                      .cast("long").alias("a3")))

    def shrink_steps(self):
        import copy

        def clone(**kw):
            s = copy.deepcopy(self)
            for k, v in kw.items():
                setattr(s, k, v)
            return s

        if self.tol_seconds is not None:
            yield clone(tol_seconds=None)
        if self.left_filter is not None:
            yield clone(left_filter=None)
        if self.right_filter is not None:
            yield clone(right_filter=None)
        if self.how == "inner":
            yield clone(how="left")


@dataclass
class IntervalSpec:
    """Equi-key + date-range interval join (point-in-window), inner or
    null-extending LEFT, aggregated per left-side group."""
    seed: int
    left_side: str            # "lineitem" (points) | "orders" (windows)
    how: str                  # inner | left
    a_days: int
    b_days: int
    lo_op: str                # ">=" | ">"
    hi_op: str                # "<=" | "<"
    left_filter: str | None
    right_filter: str | None
    group_expr: str = "1"

    def _cond(self) -> str:
        return (f"l_orderkey = o_orderkey"
                f" AND l_shipdate {self.lo_op} o_orderdate +"
                f" INTERVAL {self.a_days} DAY"
                f" AND l_shipdate {self.hi_op} o_orderdate +"
                f" INTERVAL {self.b_days} DAY")

    def _sides(self):
        if self.left_side == "lineitem":
            return ("lineitem", "orders", "o_orderkey",
                    "coalesce(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0)")
        return ("orders", "lineitem", "l_orderkey",
                "coalesce(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0)")

    def to_sql(self) -> str:
        lt, rt, probe, pay = self._sides()
        lsrc = (f"(SELECT * FROM {lt} WHERE {self.left_filter}) AS {lt}"
                if self.left_filter else lt)
        rsrc = (f"(SELECT * FROM {rt} WHERE {self.right_filter}) AS {rt}"
                if self.right_filter else rt)
        kw = "LEFT JOIN" if self.how == "left" else "JOIN"
        return (f"SELECT {self.group_expr} AS g, "
                f"CAST(COUNT(*) AS BIGINT) AS a1, "
                f"CAST(COUNT({probe}) AS BIGINT) AS a2, "
                f"CAST(COALESCE(SUM({pay}), 0) AS BIGINT) AS a3 "
                f"FROM {lsrc} {kw} {rsrc} ON {self._cond()} "
                f"GROUP BY {self.group_expr}")

    def to_spark(self, spark, sf_dir: str):
        from pyspark.sql import functions as F

        from transcript_analysis_spark.sources.tables import load_table
        lt, rt, probe, pay = self._sides()
        left = load_table(spark, sf_dir, lt)
        if self.left_filter:
            left = left.filter(F.expr(self.left_filter))
        right = load_table(spark, sf_dir, rt)
        if self.right_filter:
            right = right.filter(F.expr(self.right_filter))
        joined = left.join(right, F.expr(self._cond()), self.how)
        return (joined.groupBy(F.expr(self.group_expr).alias("g"))
                .agg(F.count(F.lit(1)).cast("long").alias("a1"),
                     F.count(probe).cast("long").alias("a2"),
                     F.coalesce(F.sum(F.expr(pay)), F.lit(0))
                      .cast("long").alias("a3")))

    def shrink_steps(self):
        import copy

        def clone(**kw):
            s = copy.deepcopy(self)
            for k, v in kw.items():
                setattr(s, k, v)
            return s

        if self.left_filter is not None:
            yield clone(left_filter=None)
        if self.right_filter is not None:
            yield clone(right_filter=None)
        if self.lo_op == ">":
            yield clone(lo_op=">=")
        if self.hi_op == "<":
            yield clone(hi_op="<=")
        if self.how == "left":
            yield clone(how="inner")


def gen_temporal(rng: random.Random, seed: int):
    if rng.random() < 0.5:
        table = rng.choice(sorted(ASOF_PAIRS))
        cfg = ASOF_PAIRS[table]
        return AsofSpec(
            seed=seed, table=table,
            direction=rng.choice(["backward", "forward"]),
            how=rng.choice(["left", "left", "inner"]),
            tol_seconds=(rng.choice(cfg["tol_opts"])
                         if rng.random() < 0.4 else None),
            left_filter=(_predicate(rng, [table])
                         if rng.random() < 0.4 else None),
            right_filter=(_predicate(rng, [table])
                          if rng.random() < 0.8 else None),
            group_expr=rng.choice(cfg["g_opts"]))
    left_side = rng.choice(["lineitem", "orders"])
    a = rng.randint(0, 25)
    g_opts = (["l_returnflag", "l_linestatus", "l_linenumber",
               "l_suppkey % 5"] if left_side == "lineitem"
              else ["o_orderpriority", "o_orderstatus", "o_custkey % 7"])
    return IntervalSpec(
        seed=seed, left_side=left_side,
        how=rng.choice(["inner", "inner", "left"]),
        a_days=a, b_days=a + rng.randint(1, 45),
        lo_op=rng.choice([">=", ">"]), hi_op=rng.choice(["<=", "<"]),
        left_filter=(_predicate(rng, [left_side])
                     if rng.random() < 0.4 else None),
        right_filter=(_predicate(
            rng, ["orders" if left_side == "lineitem" else "lineitem"])
            if rng.random() < 0.5 else None),
        group_expr=rng.choice(g_opts))


# --- scalar mode -----------------------------------------------------------
# String functions and integer/decimal division — the remaining
# shared-SQL scalar surface where the engines could diverge unnoticed.
# Each expression is a (spark_text, duck_text) pair; they are the SAME
# text except where the dialects genuinely differ, each such adapter
# probed and annotated below:
#   - regexp_replace: Spark replaces ALL matches by default, DuckDB
#     only the first — the duck side adds the 'g' flag (same semantics
#     once flagged; probed 2026-08-16).
#   - integer division: Spark `a DIV b` / DuckDB `a // b`, BOTH
#     truncate toward zero incl. negatives (probed: -7/2 -> -3 both).
#   - CONCAT() diverges for NULL args (Spark: NULL, DuckDB: skips) —
#     the generator uses `||` (NULL-propagating in both) and the
#     CONCAT divergence is pinned in tests/test_diff_fuzz.py.
#   - decimal division: Spark computes exact DECIMAL(38,20), DuckDB
#     promotes to DOUBLE — quantization is kept coarse (x10^4 on
#     quotients bounded ~1e3 by |denominator|+100) so the double's
#     ~1e-9 ulp error cannot reach a rounding tie.

@dataclass
class ScalarSpec:
    """Map-only scalar-function fuzz case: k generated expressions
    projected per row of one table, keyed by its unique key."""
    seed: int
    table: str
    cols: list = field(default_factory=list)   # (spark_text, duck_text)
    where: str | None = None

    def to_sql(self) -> str:
        uk = UNIQUE_KEYS[self.table]
        sel = [f"{uk} AS k"] + [f"{d} AS c{i + 1}"
                                for i, (_s, d) in enumerate(self.cols)]
        w = f" WHERE {self.where}" if self.where else ""
        return f"SELECT {', '.join(sel)} FROM {self.table}{w}"

    def to_spark(self, spark, sf_dir: str):
        from pyspark.sql import functions as F

        from transcript_analysis_spark.sources.tables import load_table
        df = load_table(spark, sf_dir, self.table)
        if self.where:
            df = df.filter(F.expr(self.where))
        return df.select(
            F.col(UNIQUE_KEYS[self.table]).alias("k"),
            *[F.expr(s).alias(f"c{i + 1}")
              for i, (s, _d) in enumerate(self.cols)])

    def shrink_steps(self):
        import copy

        def clone(**kw):
            s = copy.deepcopy(self)
            for k, v in kw.items():
                setattr(s, k, v)
            return s

        if self.where is not None:
            yield clone(where=None)
        for i in range(len(self.cols) - 1, -1, -1):
            if len(self.cols) > 1:
                yield clone(cols=self.cols[:i] + self.cols[i + 1:])


def _string_input(rng: random.Random, table: str) -> str:
    """A string-valued input expression, sometimes NULL-injected via
    the unique key so NULL propagation is exercised on every path."""
    col = rng.choice(STRING_COLS[table])
    if rng.random() < 0.25:
        uk = UNIQUE_KEYS[table]
        k = rng.randint(2, 7)
        return (f"CASE WHEN {uk} % {k} = {rng.randrange(k)} "
                f"THEN NULL ELSE {col} END")
    return col


def _scalar_expr(rng: random.Random, table: str) -> tuple[str, str]:
    """One generated (spark_text, duck_text) scalar expression."""
    kind = rng.choice(["upper", "lower", "trim_pad", "substr", "replace",
                       "concat", "length", "position", "split_part",
                       "regexp_extract", "regexp_replace",
                       "cents_mod", "int_div", "dec_div"])
    s = _string_input(rng, table) if table in STRING_COLS else None
    if kind in ("upper", "lower"):
        e = f"{kind.upper()}({s})"
        return e, e
    if kind == "trim_pad":
        fn = rng.choice(["LPAD", "RPAD"])
        n = rng.randint(1, 18)
        e = f"TRIM({fn}({s}, {n}, '{rng.choice('*# _x')}'))"
        return e, e
    if kind == "substr":
        e = f"SUBSTRING({s}, {rng.randint(1, 6)}, {rng.randint(0, 12)})"
        return e, e
    if kind == "replace":
        a = rng.choice("aeiorst#0 ")
        e = f"REPLACE({s}, '{a}', '{rng.choice(['*', '__', ''])}')"
        return e, e
    if kind == "concat":
        t2 = _string_input(rng, table)
        e = f"{s} || '{rng.choice('-:/#')}' || {t2}"
        return e, e
    if kind == "length":
        e = f"LENGTH({s})"
        return e, e
    if kind == "position":
        e = f"POSITION('{rng.choice('aeiorst#0')}' IN {s})"
        return e, e
    if kind == "split_part":
        sep = rng.choice([" ", "-", "#"])
        n = rng.randint(1, 4)
        # dialect adapter (found by this mode's first 1000-seed sweep,
        # 7 failing seeds, all this shape): DuckDB split_part returns
        # '' for a NULL input string where Spark (and Postgres)
        # NULL-propagate — guard the duck side; pinned in
        # tests/test_diff_fuzz.py
        return (f"split_part({s}, '{sep}', {n})",
                f"CASE WHEN ({s}) IS NULL THEN NULL"
                f" ELSE split_part({s}, '{sep}', {n}) END")
    if kind == "regexp_extract":
        pat = rng.choice(["([a-z]+)", "([0-9]+)", "([A-Z][a-z]+)",
                          "([a-z]+)[0-9]*"])
        e = f"regexp_extract({s}, '{pat}', {rng.choice([0, 1])})"
        return e, e
    if kind == "regexp_replace":
        pat = rng.choice(["[aeiou]", "[0-9]", "[a-z]{2}"])
        rep = rng.choice(["*", "", "<>"])
        # dialect adapter: DuckDB replaces only the FIRST match unless
        # the 'g' flag is passed; Spark always replaces all
        return (f"regexp_replace({s}, '{pat}', '{rep}')",
                f"regexp_replace({s}, '{pat}', '{rep}', 'g')")
    # numeric kinds — need a money or int column
    moneys = TABLE_COLS[table].get("money", [])
    ints = (list(TABLE_COLS[table].get("int", []))
            + [c for c, _, _ in TABLE_COLS[table].get("lowint", [])])
    if kind == "cents_mod" or (kind in ("int_div", "dec_div")
                               and not moneys):
        if moneys:
            m, _, _ = rng.choice(moneys)
            num = f"CAST(ROUND({m} * 100) AS BIGINT)"
        elif ints:
            num = rng.choice(ints)
        else:
            return f"LENGTH({s})", f"LENGTH({s})"
        return (f"{num} % {rng.randint(2, 9)}",) * 2
    if kind == "int_div":
        m, _, _ = rng.choice(moneys)
        num = f"CAST(ROUND({m} * 100) AS BIGINT)"
        if ints and rng.random() < 0.5:
            den = f"NULLIF({rng.choice(ints)} % {rng.randint(2, 5)}, 0)"
        else:
            den = str(rng.choice([3, 7, 100, 997]))
        # dialect adapter: same truncate-toward-zero semantics (probed
        # on negatives), different token
        return f"({num}) DIV ({den})", f"({num}) // ({den})"
    # dec_div — see module comment on quantization coarseness
    m1, _, _ = rng.choice(moneys)
    m2, _, _ = rng.choice(moneys)
    e = (f"CAST(ROUND(CAST({m1} AS DECIMAL(18,4)) / "
         f"(ABS(CAST({m2} AS DECIMAL(18,4))) + 100.0) * 10000, 0) "
         f"AS BIGINT)")
    return e, e


def gen_scalar(rng: random.Random, seed: int) -> ScalarSpec:
    table = rng.choice(sorted(STRING_COLS))
    spec = ScalarSpec(seed=seed, table=table)
    spec.cols = [_scalar_expr(rng, table)
                 for _ in range(rng.randint(2, 4))]
    if rng.random() < 0.4:
        spec.where = _predicate(rng, [table])
    return spec


@dataclass
class JsonSpec:
    """JSON-path fuzz case (r11 verdict item 6 — the one scalar family
    without generative coverage): a JSON document CONSTRUCTED
    deterministically per row from typed columns via shared `||`
    concat text (both dialects build byte-identical strings, so any
    divergence is in EXTRACTION semantics, never in the input), probed
    through each dialect's own JSON functions: Spark get_json_object /
    json_array_length(text) vs DuckDB ->> / json_array_length(doc,
    path).

    Dialect adapters, probed on both engines before this mode was
    written and pinned in tests/test_diff_fuzz.py:
      - malformed or NULL-injected documents: Spark returns NULL,
        DuckDB RAISES — every duck-side probe guards with
        CASE WHEN json_valid(j) THEN ... END (json_valid(NULL) is
        NULL, so the guard models Spark's NULL propagation too);
      - json_array_length on a SCALAR value: Spark yields NULL where
        DuckDB yields 0 — generated arrlen probes only ever target
        the template's array field or a missing key (both NULL on
        both engines);
      - numbers: integers only (1e3 re-serializes as '1000.0' in
        DuckDB's ->> but '1e3' survives Spark's get_json_object;
        float text round-trips are not contract-stable either);
      - object/array re-extraction minifies identically on both
        engines ('{"i":7}'), so whole-subtree text probes are safe.
    """
    seed: int
    table: str
    doc: str = ""          # shared construction expression -> column j
    null_inject: tuple | None = None   # (modulus, residue, literal)
    probes: list = field(default_factory=list)   # (spark, duck) over j
    # top-level keys shredded via Spark's json_tuple generator (a
    # SEPARATE implementation from the get_json_object scalar path —
    # probed: identical NULL-on-malformed/missing/null-input and
    # minified-subtree semantics) vs guarded ->> on the duck side
    tuple_keys: list = field(default_factory=list)
    where: str | None = None

    def _doc_expr(self) -> str:
        if self.null_inject is None:
            return self.doc
        k, r, lit = self.null_inject
        uk = UNIQUE_KEYS[self.table]
        return (f"CASE WHEN {uk} % {k} = {r} THEN {lit} "
                f"ELSE {self.doc} END")

    def to_sql(self) -> str:
        uk = UNIQUE_KEYS[self.table]
        w = f" WHERE {self.where}" if self.where else ""
        inner = (f"SELECT {uk} AS k, {self._doc_expr()} AS j "
                 f"FROM {self.table}{w}")
        sel = ["k"] + [f"{d} AS c{i + 1}"
                       for i, (_s, d) in enumerate(self.probes)]
        sel += [f"CASE WHEN json_valid(j) THEN j ->> '$.{key}' END"
                f" AS t{i + 1}"
                for i, key in enumerate(self.tuple_keys)]
        return f"SELECT {', '.join(sel)} FROM ({inner}) s"

    def to_spark(self, spark, sf_dir: str):
        from pyspark.sql import functions as F

        from transcript_analysis_spark.sources.tables import load_table
        df = load_table(spark, sf_dir, self.table)
        if self.where:
            df = df.filter(F.expr(self.where))
        df = df.select(F.col(UNIQUE_KEYS[self.table]).alias("k"),
                       F.expr(self._doc_expr()).alias("j"))
        cols = ["k"] + [F.expr(s).alias(f"c{i + 1}")
                        for i, (s, _d) in enumerate(self.probes)]
        if self.tuple_keys:
            # json_tuple is a multi-column generator whose outputs are
            # named c0..cN — colliding with the probe aliases — so
            # rename the whole projection BY POSITION
            cols.append(F.json_tuple(F.col("j"), *self.tuple_keys))
            names = (["k"]
                     + [f"c{i + 1}" for i in range(len(self.probes))]
                     + [f"t{i + 1}" for i in range(len(self.tuple_keys))])
            return df.select(*cols).toDF(*names)
        return df.select(*cols)

    def shrink_steps(self):
        import copy

        def clone(**kw):
            s = copy.deepcopy(self)
            for k, v in kw.items():
                setattr(s, k, v)
            return s

        if self.where is not None:
            yield clone(where=None)
        if self.null_inject is not None:
            yield clone(null_inject=None)
        if self.tuple_keys:
            yield clone(tuple_keys=[])
        for i in range(len(self.probes) - 1, -1, -1):
            if len(self.probes) > 1:
                yield clone(probes=self.probes[:i] + self.probes[i + 1:])


def _json_probe(rng: random.Random, arr_len: int) -> tuple[str, str]:
    """One (spark_text, duck_text) probe over the projected doc `j`."""
    def extract(path: str) -> tuple[str, str]:
        return (f"get_json_object(j, '{path}')",
                f"CASE WHEN json_valid(j) THEN j ->> '{path}' END")

    kind = rng.choice(["int_leaf", "int_cast", "str_leaf", "nested",
                       "arr_idx", "missing", "subtree", "arrlen",
                       "json_null"])
    if kind == "int_leaf":
        return extract("$.i")
    if kind == "int_cast":
        s, d = extract(rng.choice(["$.i", "$.o.x", "$.s"]))
        # TRY_CAST on BOTH sides (same token, same NULL-on-non-numeric
        # semantics): $.s extracts a non-numeric string, and a plain
        # CAST errors under Spark's ANSI mode AND in DuckDB
        return f"TRY_CAST({s} AS BIGINT)", f"TRY_CAST({d} AS BIGINT)"
    if kind == "str_leaf":
        return extract("$.s")
    if kind == "nested":
        return extract("$.o.x")
    if kind == "arr_idx":
        # sometimes deliberately out of range: NULL on both engines
        idx = rng.randint(0, arr_len + (1 if rng.random() < 0.3 else -1))
        return extract(f"$.arr[{idx}]")
    if kind == "missing":
        return extract(f"$.{rng.choice(['zzz', 'i2', 'missing_key'])}")
    if kind == "subtree":
        return extract(rng.choice(["$.o", "$.arr"]))
    if kind == "arrlen":
        path = rng.choice(["$.arr", "$.zzz"])   # array or missing only
        return (f"json_array_length(get_json_object(j, '{path}'))",
                f"CASE WHEN json_valid(j) THEN "
                f"json_array_length(j, '{path}') END")
    return extract("$.z")    # json null literal: NULL on both


def gen_json(rng: random.Random, seed: int) -> JsonSpec:
    tables = sorted(t for t in UNIQUE_KEYS
                    if TABLE_COLS[t].get("cat") and
                    (TABLE_COLS[t].get("int")
                     or TABLE_COLS[t].get("lowint")))
    table = rng.choice(tables)
    spec = JsonSpec(seed=seed, table=table)
    ints = (list(TABLE_COLS[table].get("int", []))
            + [c for c, _, _ in TABLE_COLS[table].get("lowint", [])])

    def int_expr() -> str:
        return f"({rng.choice(ints)} % {rng.randint(3, 97)})"

    cat_col, _pool = rng.choice(TABLE_COLS[table]["cat"])
    arr_len = rng.randint(2, 4)
    arr = " || ',' || ".join(int_expr() for _ in range(arr_len))
    fields = [
        f"'\"i\": ' || {int_expr()}",
        f"'\"s\": \"' || {cat_col} || '\"'",
        f"'\"o\": {{\"x\": ' || {int_expr()} || '}}'",
        f"'\"arr\": [' || {arr} || ']'",
        "'\"z\": null'",
    ]
    rng.shuffle(fields)   # key order must not matter to path lookup
    body = " || ', ' || ".join(fields)
    spec.doc = f"('{{' || {body} || '}}')"
    roll = rng.random()
    if roll < 0.25:       # NULL document injection
        spec.null_inject = (rng.randint(2, 7), 0, "CAST(NULL AS STRING)")
    elif roll < 0.45:     # malformed document injection
        spec.null_inject = (rng.randint(2, 7), 1,
                            rng.choice(["'{broken'", "'not json'",
                                        "'[1, 2'"]))
    spec.probes = [_json_probe(rng, arr_len)
                   for _ in range(rng.randint(2, 4))]
    if rng.random() < 0.5:   # shred 2-3 top-level keys via json_tuple
        keys = ["i", "s", "z", "zzz", "o", "arr"]
        rng.shuffle(keys)
        spec.tuple_keys = keys[:rng.randint(2, 3)]
    if rng.random() < 0.4:
        spec.where = _predicate(rng, [table])
    return spec


@dataclass
class HofSpec:
    """Higher-order array-function fuzz case (r12 verdict item 5 — the
    last expression family without generative coverage; the islands/
    scoring hot path leans on it, `operators/islands.py:75`,
    `plans/domain.py:296`): an ARRAY column CONSTRUCTED per row from
    typed int columns (shared element-expression text — both dialects
    build value-identical arrays, so any divergence is in the
    higher-order semantics, never the input), probed through Spark's
    aggregate/transform/zip_with/filter/exists/forall/slice/
    sort_array/array_distinct/try_element_at vs DuckDB's list_*
    counterparts (list_sum/list_transform/list_filter/list_sort/
    list_slice/list_distinct/list_aggregate/list_reverse/bracket
    indexing) — plus RECOMPUTE oracles that re-derive the fold
    arithmetic directly from the element expressions, a second,
    structurally independent oracle style for the lambda shapes DuckDB
    cannot express (index lambdas, zip_with, 4-arg aggregate).

    Dialect adapters, probed on both engines before this mode was
    written and pinned in tests/test_diff_fuzz.py:
      - empty-array folds: Spark aggregate() returns the zero
        initializer where DuckDB list_sum([]) is NULL — duck probes
        wrap in COALESCE(..., 0) under an a-IS-NULL guard;
      - list_sum returns HUGEINT, which pandas widens to float64
        (dtype-kind skew vs Spark's BIGINT fold) — duck sum probes
        CAST back to BIGINT;
      - NULL elements in folds: Spark's acc + x propagates NULL where
        DuckDB list_sum SKIPS NULLs — fold probes pre-filter
        x IS NOT NULL on BOTH sides whenever the spec injects element
        NULLs (recompute probes are exempt: plain SQL `+` propagates
        exactly like Spark's fold);
      - exists/forall are three-valued on Spark (NULL when no
        definite witness but a NULL element) and emulated via
        len(list_filter(...)) on duck — generated only for null-free
        arrays;
      - sort order of NULL elements differs (Spark sort_array ASC is
        NULLS FIRST, DuckDB list_sort is NULLS LAST) but BOTH
        array_join and array_to_string skip NULL elements, so
        sort+stringify probes stay comparable with NULLs present;
      - array_to_string([]) is NULL where array_join(empty) is '' —
        duck stringify probes COALESCE to '' under the NULL-array
        guard;
      - element access: Spark element_at RAISES out-of-range under
        ANSI mode — probes use try_element_at, matching duck's
        NULL-on-out-of-range bracket indexing;
      - slice: Spark slice(a, start, length) == DuckDB
        list_slice(a, start, start + length - 1) (1-based, inclusive,
        both clamp; start past the end yields an empty array);
      - array_distinct keeps one NULL where list_distinct drops them
        (and returns unstable order) — distinct probes compare COUNTS
        on null-free arrays only.
    """
    seed: int
    table: str
    elems: list = field(default_factory=list)    # shared element exprs
    elems2: list = field(default_factory=list)   # second array (zip_with)
    # whole-array NULL injection: (modulus, residue) over the unique key
    null_inject: tuple | None = None
    has_null_elems: bool = False
    probes: list = field(default_factory=list)   # (spark, duck) over a/b
    where: str | None = None

    def _arr(self, elems: list, dialect: str) -> str:
        body = ", ".join(elems)
        arr = f"array({body})" if dialect == "spark" else f"[{body}]"
        if self.null_inject is not None:
            k, r = self.null_inject
            uk = UNIQUE_KEYS[self.table]
            return f"CASE WHEN {uk} % {k} = {r} THEN NULL ELSE {arr} END"
        return arr

    def to_sql(self) -> str:
        uk = UNIQUE_KEYS[self.table]
        w = f" WHERE {self.where}" if self.where else ""
        proj = [f"{uk} AS k", f"{self._arr(self.elems, 'duck')} AS a"]
        if self.elems2:
            proj.append(f"{self._arr(self.elems2, 'duck')} AS b")
        # recompute probes reference raw table columns, so the inner
        # select projects them through (*) alongside k and a/b
        inner = f"SELECT {', '.join(proj)}, * FROM {self.table}{w}"
        sel = ["k"] + [f"{d} AS c{i + 1}"
                       for i, (_s, d) in enumerate(self.probes)]
        return f"SELECT {', '.join(sel)} FROM ({inner}) s"

    def to_spark(self, spark, sf_dir: str):
        from pyspark.sql import functions as F

        from transcript_analysis_spark.sources.tables import load_table
        df = load_table(spark, sf_dir, self.table)
        if self.where:
            df = df.filter(F.expr(self.where))
        df = df.withColumn("a", F.expr(self._arr(self.elems, "spark")))
        if self.elems2:
            df = df.withColumn("b",
                               F.expr(self._arr(self.elems2, "spark")))
        cols = ([F.col(UNIQUE_KEYS[self.table]).alias("k")]
                + [F.expr(s).alias(f"c{i + 1}")
                   for i, (s, _d) in enumerate(self.probes)])
        return df.select(*cols)

    def shrink_steps(self):
        import copy

        def clone(**kw):
            s = copy.deepcopy(self)
            for k, v in kw.items():
                setattr(s, k, v)
            return s

        if self.where is not None:
            yield clone(where=None)
        if self.null_inject is not None:
            yield clone(null_inject=None)
        for i in range(len(self.probes) - 1, -1, -1):
            if len(self.probes) > 1:
                yield clone(probes=self.probes[:i] + self.probes[i + 1:])


def _hof_probe(rng: random.Random, spec: "HofSpec") -> tuple[str, str]:
    """One (spark_text, duck_text) scalar probe over array column a
    (and b when the spec carries a second array)."""
    k = len(spec.elems)
    m, c = rng.randint(2, 9), rng.randint(0, 9)
    r = rng.randrange(m)
    null_guard = "CASE WHEN a IS NULL THEN NULL ELSE {expr} END"

    def fold(inner_spark: str, inner_duck: str) -> tuple[str, str]:
        # Spark fold-from-zero vs duck list_sum: COALESCE models the
        # zero initializer; when element NULLs are live, pre-filter
        # both sides (duck's list_sum would silently skip what
        # Spark's acc + x turns into NULL)
        if spec.has_null_elems:
            inner_spark = f"filter({inner_spark}, x -> x IS NOT NULL)"
            inner_duck = (f"list_filter({inner_duck}, "
                          f"x -> x IS NOT NULL)")
        sp = (f"aggregate({inner_spark}, CAST(0 AS BIGINT), "
              f"(acc, x) -> acc + x)")
        # list_sum returns HUGEINT (-> float64 via pandas); cast back
        # to BIGINT to match Spark's fold accumulator type
        du = null_guard.format(
            expr=f"COALESCE(CAST(list_sum({inner_duck}) AS BIGINT), 0)")
        return sp, du

    def recompute(terms: list) -> str:
        # duck-side independent oracle: the fold arithmetic re-derived
        # from the element expressions; plain SQL + propagates NULL
        # exactly like Spark's acc + x, and the a-IS-NULL guard models
        # whole-array injection without referencing its condition (so
        # shrink can drop null_inject without rewriting probes)
        return null_guard.format(
            expr="(" + " + ".join(terms) + ")")

    kinds = ["fold_sum", "transform_fold", "filter_count", "sort_join",
             "slice_join", "reverse_join", "arr_max", "try_element",
             "idx_fold", "fold_finish"]
    if not spec.has_null_elems:
        kinds += ["exists", "forall", "distinct_count"]
    if spec.elems2:
        kinds += ["zipw_prodsum", "zipw_prodsum"]
    kind = rng.choice(kinds)

    if kind == "fold_sum":
        return fold("a", "a")
    if kind == "transform_fold":
        return fold(f"transform(a, x -> x * {m} + {c})",
                    f"list_transform(a, x -> x * {m} + {c})")
    if kind == "filter_count":
        return (f"size(filter(a, x -> x % {m} = {r}))",
                f"len(list_filter(a, x -> x % {m} = {r}))")
    if kind == "sort_join":
        return (f"array_join(transform(sort_array(a), "
                f"x -> CAST(x AS STRING)), ',')",
                null_guard.format(
                    expr="COALESCE(array_to_string("
                         "list_sort(a), ','), '')"))
    if kind == "slice_join":
        s0 = rng.randint(1, k + 1)          # sometimes past the end
        ln = rng.randint(1, k + 1)
        return (f"array_join(transform(slice(a, {s0}, {ln}), "
                f"x -> CAST(x AS STRING)), ',')",
                null_guard.format(
                    expr=f"COALESCE(array_to_string(list_slice("
                         f"a, {s0}, {s0 + ln - 1}), ','), '')"))
    if kind == "reverse_join":
        return (f"array_join(transform(reverse(a), "
                f"x -> CAST(x AS STRING)), ',')",
                null_guard.format(
                    expr="COALESCE(array_to_string("
                         "list_reverse(a), ','), '')"))
    if kind == "arr_max":
        fn = rng.choice(["max", "min"])
        return (f"array_{fn}(a)", f"list_aggregate(a, '{fn}')")
    if kind == "try_element":
        idx = rng.randint(1, k + 1)         # 1-based, sometimes OOR
        return (f"try_element_at(a, {idx})", f"a[{idx}]")
    if kind == "idx_fold":
        # Spark-only index lambda; duck oracle recomputed from the
        # element expressions (transform's i is 0-based)
        sp = (f"aggregate(transform(a, (x, i) -> x * i), "
              f"CAST(0 AS BIGINT), (acc, x) -> acc + x)")
        return sp, recompute([f"{i} * ({e})"
                              for i, e in enumerate(spec.elems)])
    if kind == "fold_finish":
        # 4-arg aggregate with a finish lambda; duck recomputes
        sp = (f"aggregate(a, CAST(0 AS BIGINT), "
              f"(acc, x) -> acc + x, acc -> acc * {m} + {c})")
        du = null_guard.format(
            expr="(" + " + ".join(f"({e})" for e in spec.elems)
                 + f") * {m} + {c}")
        return sp, du
    if kind == "zipw_prodsum":
        sp = (f"aggregate(zip_with(a, b, (x, y) -> x * y), "
              f"CAST(0 AS BIGINT), (acc, v) -> acc + v)")
        terms = [f"({e}) * ({f})"
                 for e, f in zip(spec.elems, spec.elems2)]
        du = ("CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE ("
              + " + ".join(terms) + ") END")
        return sp, du
    if kind == "exists":
        return (f"CAST(exists(a, x -> x % {m} = {r}) AS STRING)",
                null_guard.format(
                    expr=f"CAST(len(list_filter(a, "
                         f"x -> x % {m} = {r})) > 0 AS VARCHAR)"))
    if kind == "forall":
        return (f"CAST(forall(a, x -> x % {m} <> {r}) AS STRING)",
                null_guard.format(
                    expr=f"CAST(len(list_filter(a, x -> NOT "
                         f"(x % {m} <> {r}))) = 0 AS VARCHAR)"))
    # distinct_count (null-free arrays only: list_distinct drops NULLs)
    return ("size(array_distinct(a))", "len(list_distinct(a))")


def gen_hof(rng: random.Random, seed: int) -> HofSpec:
    tables = sorted(t for t in UNIQUE_KEYS if TABLE_COLS[t].get("int")
                    or TABLE_COLS[t].get("lowint"))
    table = rng.choice(tables)
    spec = HofSpec(seed=seed, table=table)
    ints = (list(TABLE_COLS[table].get("int", []))
            + [c for c, _, _ in TABLE_COLS[table].get("lowint", [])])

    def elem() -> str:
        # BIGINT-cast so the array element type is identical on both
        # sides regardless of the parquet column's physical width
        return (f"CAST({rng.choice(ints)} % {rng.randint(3, 97)} "
                f"AS BIGINT)")

    k = rng.randint(2, 5)
    spec.elems = [elem() for _ in range(k)]
    roll = rng.random()
    if roll < 0.25:      # whole-array NULL injection
        spec.null_inject = (rng.randint(2, 7), 0)
    elif roll < 0.45:    # element NULL injection (one slot)
        j = rng.randrange(k)
        mj = rng.randint(2, 7)
        uk = UNIQUE_KEYS[table]
        spec.elems[j] = (f"CASE WHEN {uk} % {mj} = 1 THEN NULL "
                         f"ELSE {spec.elems[j]} END")
        spec.has_null_elems = True
    if rng.random() < 0.35:   # second, same-length array for zip_with
        spec.elems2 = [elem() for _ in range(k)]
    spec.probes = [_hof_probe(rng, spec)
                   for _ in range(rng.randint(2, 4))]
    if rng.random() < 0.4:
        spec.where = _predicate(rng, [table])
    return spec


# --- generation ------------------------------------------------------------

def _cols(tables: list[str], kind: str) -> list:
    out: list = []
    for t in tables:
        out.extend(TABLE_COLS[t].get(kind, []))
    return out


def _money_lit(rng: random.Random, lo: float, hi: float) -> str:
    return repr(round(rng.uniform(lo, hi), 2))


def _date_lit(rng: random.Random, y0: int, y1: int) -> str:
    y = rng.randint(y0, y1)
    m = rng.randint(1, 12)
    d = rng.randint(1, 28)
    return f"TIMESTAMP '{y}-{m:02d}-{d:02d} 00:00:00'"


def _predicate(rng: random.Random, tables: list[str]) -> str | None:
    kinds = []
    if _cols(tables, "int"):
        kinds.append("int_mod")
    if _cols(tables, "lowint"):
        kinds.append("lowint_cmp")
    if _cols(tables, "money"):
        kinds.append("money_cmp")
    if _cols(tables, "cat"):
        kinds.append("cat")
    if _cols(tables, "date") or _cols(tables, "nsdate"):
        kinds.append("date_cmp")
    if not kinds:
        return None
    kind = rng.choice(kinds)
    if kind == "int_mod":
        col = rng.choice(_cols(tables, "int"))
        k = rng.randint(2, 7)
        return f"{col} % {k} = {rng.randrange(k)}"
    if kind == "lowint_cmp":
        col, lo, hi = rng.choice(_cols(tables, "lowint"))
        op = rng.choice(["<=", ">=", "=", "<>"])
        return f"{col} {op} {rng.randint(lo, hi)}"
    if kind == "money_cmp":
        col, lo, hi = rng.choice(_cols(tables, "money"))
        if rng.random() < 0.3:
            a = rng.uniform(lo, hi)
            b = rng.uniform(a, hi)
            return (f"{col} BETWEEN {repr(round(a, 2))} "
                    f"AND {repr(round(b, 2))}")
        op = rng.choice(["<", ">=", ">"])
        return f"{col} {op} {_money_lit(rng, lo, hi)}"
    if kind == "cat":
        col, pool = rng.choice(_cols(tables, "cat"))
        r = rng.random()
        if r < 0.4:
            return f"{col} = '{rng.choice(pool)}'"
        if r < 0.6:
            return f"{col} <> '{rng.choice(pool)}'"
        vals = rng.sample(pool, k=min(len(pool), rng.randint(2, 3)))
        quoted = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({quoted})"
    # date_cmp
    dcols = _cols(tables, "date") + _cols(tables, "nsdate")
    col, y0, y1 = rng.choice(dcols)
    op = rng.choice(["<", ">="])
    return f"{col} {op} {_date_lit(rng, y0, y1)}"


def _int_sum_expr(rng: random.Random, tables: list[str]) -> str | None:
    """An exact-integer expression safe under SUM/COUNT."""
    choices = []
    if _cols(tables, "int"):
        choices.append("int")
    if _cols(tables, "lowint"):
        choices.append("lowint")
    if _cols(tables, "money"):
        choices.append("cents")
    if not choices:
        return None
    kind = rng.choice(choices)
    if kind == "int":
        col = rng.choice(_cols(tables, "int"))
        if rng.random() < 0.3:  # NULL injection: mod residue nulled out
            k = rng.randint(2, 7)
            return f"NULLIF({col} % {k}, {rng.randrange(k)})"
        return f"{col} % 1000"
    if kind == "lowint":
        col, lo, hi = rng.choice(_cols(tables, "lowint"))
        if rng.random() < 0.3:
            return f"NULLIF({col}, {rng.randint(lo, hi)})"
        return col
    col, _, _ = rng.choice(_cols(tables, "money"))
    return f"CAST(ROUND({col} * 100) AS BIGINT)"


def _group_expr(rng: random.Random, tables: list[str]) -> str | None:
    choices = []
    if _cols(tables, "cat"):
        choices += ["cat", "cat"]
    if _cols(tables, "lowint"):
        choices.append("lowint")
    if _cols(tables, "date") or _cols(tables, "nsdate"):
        choices.append("datepart")
    if _cols(tables, "int"):
        choices.append("intmod")
    if not choices:
        return None
    kind = rng.choice(choices)
    if kind == "cat":
        col, pool = rng.choice(_cols(tables, "cat"))
        if rng.random() < 0.25:  # NULL group key
            return f"NULLIF({col}, '{rng.choice(pool)}')"
        return col
    if kind == "lowint":
        col, _, _ = rng.choice(_cols(tables, "lowint"))
        return col
    if kind == "datepart":
        dcols = _cols(tables, "date") + _cols(tables, "nsdate")
        col, _, _ = rng.choice(dcols)
        return f"{rng.choice(['year', 'month'])}({col})"
    col = rng.choice(_cols(tables, "int"))
    return f"{col} % {rng.randint(2, 5)}"


def _agg_expr(rng: random.Random, tables: list[str]) -> str:
    kind = rng.choice(["count_star", "count_distinct", "sum", "sum_case",
                       "minmax", "count_nullable"])
    if kind == "count_star":
        return "CAST(COUNT(*) AS BIGINT)"
    if kind == "count_distinct":
        targets = list(_cols(tables, "int"))
        targets += [c for c, _, _ in _cols(tables, "lowint")]
        targets += [c for c, _ in _cols(tables, "cat")]
        if not targets:
            return "CAST(COUNT(*) AS BIGINT)"
        return f"CAST(COUNT(DISTINCT {rng.choice(targets)}) AS BIGINT)"
    if kind == "sum":
        e = _int_sum_expr(rng, tables)
        return (f"CAST(SUM({e}) AS BIGINT)" if e
                else "CAST(COUNT(*) AS BIGINT)")
    if kind == "sum_case":
        p = _predicate(rng, tables)
        if p is None:
            return "CAST(COUNT(*) AS BIGINT)"
        return f"CAST(SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT)"
    if kind == "minmax":
        fn = rng.choice(["MIN", "MAX"])
        choices = []
        if _cols(tables, "int"):
            choices.append("int")
        if _cols(tables, "lowint"):
            choices.append("lowint")
        if _cols(tables, "cat"):
            choices.append("cat")
        if _cols(tables, "date"):
            choices.append("date")
        if not choices:
            return "CAST(COUNT(*) AS BIGINT)"
        c = rng.choice(choices)
        if c == "int":
            return f"CAST({fn}({rng.choice(_cols(tables, 'int'))}) AS BIGINT)"
        if c == "lowint":
            col, _, _ = rng.choice(_cols(tables, "lowint"))
            return f"CAST({fn}({col}) AS BIGINT)"
        if c == "cat":
            col, _ = rng.choice(_cols(tables, "cat"))
            return f"{fn}({col})"
        col, _, _ = rng.choice(_cols(tables, "date"))
        return f"{fn}({col})"
    # count_nullable
    e = _int_sum_expr(rng, tables)
    return (f"CAST(COUNT({e}) AS BIGINT)" if e
            else "CAST(COUNT(*) AS BIGINT)")


def gen_query(seed: int):
    """Seeded spec generator. Mode roll first: the specialized modes
    (set-op, window-frame, temporal as-of/interval, scalar) each get a
    fixed slice of the seed space; the remainder takes the original
    join/aggregate/window-top-k path."""
    rng = random.Random(seed)
    mode = rng.random()
    if mode < 0.24 and mode >= 0.12:
        return gen_frame(rng, seed)
    if mode < 0.36 and mode >= 0.24:
        return gen_temporal(rng, seed)
    if mode < 0.46 and mode >= 0.36:
        return gen_scalar(rng, seed)
    if mode < 0.54 and mode >= 0.46:
        return gen_json(rng, seed)
    if mode < 0.62 and mode >= 0.54:
        return gen_hof(rng, seed)
    spec = QuerySpec(seed=seed)
    base = rng.choice(BASE_TABLES)
    spec.tables = [base]

    # set-op mode: two filtered branches over the base table
    if mode < 0.12:
        spec.setop_kind = rng.choice(
            ["UNION ALL", "UNION", "INTERSECT", "INTERSECT ALL",
             "EXCEPT", "EXCEPT ALL"])
        # every BASE_TABLE has groupable columns today; assert rather
        # than emit 'None AS c1' SQL if a catalog edit breaks that
        # (r10 advice: fail in the generator, not with a cryptic
        # engine error)
        spec.setop_cols = [g for g in (_group_expr(rng, [base])
                                       for _ in range(rng.randint(2, 3)))
                           if g is not None]
        assert spec.setop_cols, f"no groupable columns on {base}"
        spec.setop_filters = (
            _predicate(rng, [base]) if rng.random() < 0.9 else None,
            _predicate(rng, [base]) if rng.random() < 0.9 else None)
        return spec

    # join chain: expand along FK edges whose one endpoint is joined
    for _ in range(rng.choice([0, 0, 1, 1, 2, 3])):
        cands = [(a, b, c) for a, b, c in FK_EDGES
                 if (a in spec.tables) != (b in spec.tables)]
        if not cands:
            break
        a, b, cond = rng.choice(cands)
        new = b if a in spec.tables else a
        how, rf = "inner", None
        if rng.random() < 0.3:
            how = "left"
            if new == b:
                # fact->dim: every FK resolves, so force unmatched
                # rows by pre-filtering the dim side
                rf = _predicate(rng, [new])
                if rf is None:
                    how = "inner"
            else:
                # dim->fact: some edges have natural unmatched rows
                # (customer->orders) but most degenerate to INNER in
                # TPC-H-ish data (every order has lineitems, every
                # nation has customers) — force null-extension most
                # of the time here too (r10 advice)
                if rng.random() < 0.7:
                    rf = _predicate(rng, [new])
        spec.tables.append(new)
        spec.joins.append((new, cond, how, rf))

    # at most one semi/anti join, against a table NOT in the join
    # chain (same-table EXISTS would be ambiguous on the Spark side)
    if rng.random() < 0.35:
        cands = [(a, b, c) for a, b, c in FK_EDGES
                 if (a in spec.tables) != (b in spec.tables)]
        if cands:
            a, b, cond = rng.choice(cands)
            st = b if a in spec.tables else a
            anti = rng.random() < 0.5
            sf = _predicate(rng, [st]) if rng.random() < 0.7 else None
            spec.semis.append((st, cond, anti, sf))

    preds = [p for p in (_predicate(rng, spec.tables)
                         for _ in range(rng.choice([0, 1, 1, 2, 3])))
             if p is not None]
    if len(preds) >= 2 and rng.random() < 0.3:
        a = preds.pop()
        b = preds.pop()
        preds.append(f"({a} OR {b})")
    if preds:
        spec.where = " AND ".join(preds)

    # window mode: per-group top-k detail rows instead of aggregation
    lowints = [c for c, _, _ in _cols(spec.tables, "lowint")]
    cats = [c for c, _ in _cols(spec.tables, "cat")]
    if (lowints or cats) and rng.random() < 0.2:
        pk = rng.choice(lowints + cats)
        pool = (list(_cols(spec.tables, "int")) + lowints + cats
                + [c for c, _, _ in _cols(spec.tables, "date")])
        chosen = rng.sample(pool, min(len(pool), rng.randint(2, 4)))
        if pk not in chosen:
            chosen[0] = pk
        rng.shuffle(chosen)
        spec.win_partition = pk
        spec.win_cols = [(c, rng.random() < 0.5) for c in chosen]
        spec.win_k = rng.randint(1, 4)
        return spec

    seen: set[str] = set()
    for _ in range(rng.choice([0, 1, 1, 2])):
        g = _group_expr(rng, spec.tables)
        if g is not None and g not in seen:
            seen.add(g)
            spec.group_exprs.append(g)

    if spec.group_exprs and rng.random() < 0.2:
        spec.group_mode = rng.choice(["rollup", "cube"])

    want_having = bool(spec.group_exprs) and rng.random() < 0.3
    n_aggs = rng.randint(1, 4)
    spec.agg_exprs = [_agg_expr(rng, spec.tables) for _ in range(n_aggs)]
    if want_having:
        spec.agg_exprs[0] = "CAST(COUNT(*) AS BIGINT)"
        spec.having_min = rng.randint(2, 5)

    if spec.group_exprs and rng.random() < 0.3:
        aliases = ([f"g{i + 1}" for i in range(len(spec.group_exprs))]
                   + [f"a{i + 1}" for i in range(len(spec.agg_exprs))])
        rng.shuffle(aliases)
        spec.order_by = [(c, rng.random() < 0.5) for c in aliases]
        spec.limit = rng.randint(1, 12)
    return spec


# --- shrinking -------------------------------------------------------------

def _shrink_steps(spec):
    """Candidate one-step reductions of a spec, structurally valid by
    construction: clauses are dropped, never rewritten, and joins are
    only dropped when nothing else references the joined table (its
    column prefix appears in no other fragment), so every step yields
    a runnable spec. Non-QuerySpec modes carry their own steps."""
    if not isinstance(spec, QuerySpec):
        yield from spec.shrink_steps()
        return
    import copy

    def clone(**kw):
        s = copy.deepcopy(spec)
        for k, v in kw.items():
            setattr(s, k, v)
        return s

    if spec.where is not None:
        yield clone(where=None)
    if spec.having_min is not None:
        yield clone(having_min=None)
    if spec.limit is not None:
        yield clone(limit=None, order_by=[])
    if spec.group_mode != "plain":
        yield clone(group_mode="plain")
    for i in range(len(spec.semis)):
        yield clone(semis=spec.semis[:i] + spec.semis[i + 1:])
    # dropping an agg/group expr shifts the positional a{i}/g{i}
    # aliases, so these steps only fire once order_by is gone (the
    # limit-drop step above runs first in the greedy loop)
    if not spec.order_by:
        for i in range(len(spec.agg_exprs) - 1, -1, -1):
            if len(spec.agg_exprs) > 1 and (spec.having_min is None or i > 0):
                yield clone(
                    agg_exprs=spec.agg_exprs[:i] + spec.agg_exprs[i + 1:])
        for i in range(len(spec.group_exprs) - 1, -1, -1):
            if len(spec.group_exprs) > 1:
                yield clone(
                    group_exprs=spec.group_exprs[:i]
                    + spec.group_exprs[i + 1:])
    if spec.setop_kind is not None:
        for i in (0, 1):
            if spec.setop_filters[i]:
                nf = list(spec.setop_filters)
                nf[i] = None
                yield clone(setop_filters=tuple(nf))
        for i in range(len(spec.setop_cols) - 1, -1, -1):
            if len(spec.setop_cols) > 1:
                yield clone(
                    setop_cols=spec.setop_cols[:i] + spec.setop_cols[i + 1:])
    if spec.win_partition is not None:
        if spec.win_k and spec.win_k > 1:
            yield clone(win_k=1)
        for i in range(len(spec.win_cols) - 1, -1, -1):
            if len(spec.win_cols) > 1:
                yield clone(
                    win_cols=spec.win_cols[:i] + spec.win_cols[i + 1:])
    # drop the LAST join if nothing else references its table's columns
    # (checked against the table's actual column names from TABLE_COLS,
    # not a parallel prefix map that could drift from the catalog)
    if spec.joins:
        rt = spec.joins[-1][0]
        rt_cols = [e if isinstance(e, str) else e[0]
                   for entries in TABLE_COLS[rt].values() for e in entries]
        rest = " ".join(
            [spec.where or ""]
            + spec.group_exprs + spec.agg_exprs
            + [c for st, c, _a, sf in spec.semis]
            + [sf or "" for st, c, _a, sf in spec.semis]
            + [e for e, _ in spec.win_cols]
            + [spec.win_partition or ""]
            + [c for _t2, c, _h, _rf in spec.joins[:-1]])
        if not any(col in rest for col in rt_cols):
            yield clone(tables=spec.tables[:-1], joins=spec.joins[:-1])


def shrink(spec: QuerySpec, still_fails) -> QuerySpec:
    """Greedy fixpoint reduction: repeatedly take the first one-step
    reduction that still fails. Deterministic; terminates because
    every step strictly removes a clause."""
    changed = True
    while changed:
        changed = False
        for cand in _shrink_steps(spec):
            if still_fails(cand):
                spec = cand
                changed = True
                break
    return spec


# --- runner ----------------------------------------------------------------

def _check_spec(spec: QuerySpec, sf_dir: str, spark, con,
                label: str = "fuzz") -> tuple[bool, str]:
    from check_correctness import compare
    sql = spec.to_sql()
    try:
        df = spec.to_spark(spark, sf_dir)
        res = con.execute(sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        # The second execution is load-bearing, not waste: compare()
        # needs BOTH the fetchall() view (Python-native values — None
        # for NULL — for the cell compare) and the .df() view (the
        # driver harness's pandas dtypes, where a nullable int column
        # becomes float64, for the dtype-kind check). DuckDB consumes
        # a result on fetch, and deriving either view from the other
        # changes its semantics.
        duck_pdf = con.execute(sql).df()
        return compare(label, df, duck_rows, duck_cols, duck_pdf)
    except Exception as e:  # noqa: BLE001
        return False, f"error: {type(e).__name__}: {e}"


def _failure_kind(msg: str) -> str:
    """Coarse failure class for shrink stability: a mismatch-failing
    seed must not shrink into a spec that fails for an unrelated
    reason (r10 advice) — 'error:<ExceptionClass>' vs 'mismatch'."""
    if msg.startswith("error:"):
        return "error:" + msg.split(":", 2)[1].strip()
    return "mismatch"


def run_seeds(seeds, sf_dir: str, spark=None, con=None,
              verbose: bool = True,
              shrink_failures: bool = False) -> list[tuple[int, str]]:
    from check_correctness import duck_connection
    if spark is None:
        from transcript_analysis_spark.session import get_spark
        spark = get_spark("diff-fuzz")
        spark.sparkContext.setLogLevel("ERROR")
    if con is None:
        con = duck_connection(sf_dir)

    failures: list[tuple[int, str]] = []
    for seed in seeds:
        spec = gen_query(seed)
        ok, msg = _check_spec(spec, sf_dir, spark, con, f"fuzz_{seed}")
        if not ok:
            failures.append((seed, msg))
            if verbose:
                print(f"FAIL seed={seed}: {msg}\n  SQL: {spec.to_sql()}")
                if shrink_failures:
                    # a shrink step must fail the SAME way as the
                    # original (mismatch stays mismatch, error keeps
                    # its exception class) — otherwise the "minimal"
                    # repro can be an unrelated failure (r10 advice)
                    kind = _failure_kind(msg)

                    def _same_failure(s, _kind=kind):
                        ok2, m2 = _check_spec(s, sf_dir, spark, con)
                        return (not ok2) and _failure_kind(m2) == _kind

                    small = shrink(spec, _same_failure)
                    print(f"  shrunk: {small.to_sql()}")
        elif verbose:
            print(f"PASS seed={seed}: {msg}")
    return failures


MODE_CLASSES = {"frame": "FrameSpec", "asof": "AsofSpec",
                "interval": "IntervalSpec", "scalar": "ScalarSpec",
                "json": "JsonSpec", "hof": "HofSpec",
                "setop": None, "legacy": None}


def seeds_for_mode(mode: str, n: int, start: int = 0):
    """First `n` seeds >= start whose generated spec belongs to
    `mode` — lets a sweep target one mode's grammar without paying to
    execute the other 85% of the seed space (generation is ~free)."""
    out = []
    seed = start
    while len(out) < n:
        spec = gen_query(seed)
        cls = type(spec).__name__
        if mode in ("frame", "asof", "interval", "scalar", "json",
                    "hof"):
            match = cls == MODE_CLASSES[mode]
        elif mode == "setop":
            match = cls == "QuerySpec" and spec.setop_kind is not None
        else:
            match = cls == "QuerySpec" and spec.setop_kind is None
        if match:
            out.append(seed)
        seed += 1
    return out


def main() -> None:
    argv = sys.argv[1:]
    if "--selfcheck" in argv:
        # Clean-shell import canary (r12 verdict item 2): resolve the
        # deferred engine + duckdb imports and generate (not execute)
        # one spec per mode — no JVM, no DuckDB connection.
        import duckdb as _duck
        from transcript_analysis_spark.session import get_spark  # noqa: F401
        n_modes = sum(1 for m in sorted(MODE_CLASSES)
                      if next(iter(seeds_for_mode(m, 1, 0)), None)
                      is not None)
        print(f"selfcheck OK: duckdb {_duck.__version__}, "
              f"{n_modes}/{len(MODE_CLASSES)} modes generate")
        return
    args: list[str] = []
    start, shrink_failures, i = 0, True, 0
    mode = None
    while i < len(argv):
        a = argv[i]
        if a == "--no-shrink":
            shrink_failures = False
        elif a.startswith("--mode"):
            if "=" in a:
                mode = a.split("=", 1)[1]
            else:
                i += 1
                mode = argv[i] if i < len(argv) else ""
            if mode not in MODE_CLASSES:
                sys.exit(f"--mode must be one of {sorted(MODE_CLASSES)}")
        elif a.startswith("--start"):
            if "=" in a:
                start = int(a.split("=", 1)[1])
            else:
                i += 1
                if i >= len(argv) or not argv[i].lstrip("-").isdigit():
                    sys.exit("--start needs an integer (K or --start=K)")
                start = int(argv[i])
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a!r}; see module docstring")
        else:
            args.append(a)
        i += 1
    try:
        n = int(args[0]) if args else 100
    except ValueError:
        sys.exit(f"first positional must be n_seeds, got {args[0]!r} "
                 "(usage: diff_fuzz.py [n_seeds] [sf_dir] [--start K])")
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    seeds = (seeds_for_mode(mode, n, start) if mode
             else range(start, start + n))
    failures = run_seeds(seeds, sf_dir,
                         shrink_failures=shrink_failures)
    print(f"\n{n - len(failures)}/{n} seeds matched"
          + (f"; failing seeds: {[s for s, _ in failures]}"
             if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
