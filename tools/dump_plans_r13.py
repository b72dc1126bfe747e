"""Dump .explain('formatted') for headline queries into plans/r13/.

Usage: python tools/dump_plans_r13.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)
  query:  optional subset; default = all headline queries.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from transcript_analysis_spark.plans import all_queries  # noqa: E402
from transcript_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    if "--selfcheck" in sys.argv[1:]:
        # Clean-shell import canary (r12 verdict item 2), no JVM.
        from transcript_analysis_spark.plans import all_queries
        print(f"selfcheck OK: {len(all_queries())} queries importable")
        return
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(ROOT, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    targets = names or [n for n, q in sorted(qs.items()) if q.headline]
    for name in targets:
        df = qs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            fh.write(buf.getvalue())
        plan = buf.getvalue()
        print(f"{name}: Exchange={plan.count('Exchange hashpartitioning')}"
              f" SMJ={plan.count('SortMergeJoin')}"
              f" BHJ={plan.count('BroadcastHashJoin')}"
              f" SHJ={plan.count('ShuffledHashJoin')}"
              f" PyEval={plan.count('EvalPython') + plan.count('MapInPandas')}")


if __name__ == "__main__":
    main()
