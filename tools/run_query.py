"""Run any registered query by name: show rows, schema, and plan.

Usage:
  python tools/run_query.py <query_name> [sf_dir] [--explain] [--rows N]
  python tools/run_query.py --list
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}

    from transcript_analysis_spark.plans import all_queries
    queries = all_queries()

    if "--list" in flags or not args:
        for name, q in sorted(queries.items()):
            mark = "*" if q.headline else " "
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{mark} {name:40s} [{oracle}] {' '.join(q.tags)}")
        return

    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in queries:
        sys.exit(f"unknown query {name!r}; use --list")

    from transcript_analysis_spark.session import get_spark
    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[name].fn(spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    n = 20
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            n = int(a.split("=", 1)[1]) if "=" in a else 20
    print(df.schema.simpleString())
    df.show(n, truncate=40)
    print(f"total rows: {df.count()}")


if __name__ == "__main__":
    main()
