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


def gen_query(seed: int) -> QuerySpec:
    rng = random.Random(seed)
    spec = QuerySpec(seed=seed)
    base = rng.choice(BASE_TABLES)
    spec.tables = [base]

    # set-op mode: two filtered branches over the base table
    if rng.random() < 0.15:
        spec.setop_kind = rng.choice(
            ["UNION ALL", "UNION", "INTERSECT", "INTERSECT ALL",
             "EXCEPT", "EXCEPT ALL"])
        spec.setop_cols = [_group_expr(rng, [base])
                           for _ in range(rng.randint(2, 3))]
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
            # dim->fact (e.g. customer LEFT JOIN orders): naturally
            # unmatched rows exist; no filter needed
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

def _shrink_steps(spec: QuerySpec):
    """Candidate one-step reductions of a spec, structurally valid by
    construction: clauses are dropped, never rewritten, and joins are
    only dropped when nothing else references the joined table (its
    column prefix appears in no other fragment), so every step yields
    a runnable spec."""
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
        return False, f"error: {e}"


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
                    small = shrink(spec, lambda s: not _check_spec(
                        s, sf_dir, spark, con)[0])
                    print(f"  shrunk: {small.to_sql()}")
        elif verbose:
            print(f"PASS seed={seed}: {msg}")
    return failures


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    start, shrink_failures, i = 0, True, 0
    while i < len(argv):
        a = argv[i]
        if a == "--no-shrink":
            shrink_failures = False
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
    failures = run_seeds(range(start, start + n), sf_dir,
                         shrink_failures=shrink_failures)
    print(f"\n{n - len(failures)}/{n} seeds matched"
          + (f"; failing seeds: {[s for s, _ in failures]}"
             if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
