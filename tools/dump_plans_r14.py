"""Dump .explain('formatted') for headline queries into plans/r14/.

r14 upgrade over dump_plans_r13.py (VERDICT r13 item 2): plans are
dumped AFTER executing the DataFrame (df.collect() on the same
instance caches the executed AdaptiveSparkPlan), so the file shows the
AQE FINAL plan (`isFinalPlan=true`) including runtime SMJ->SHJ
conversions and AQEShuffleRead coalescing — the pre-execution dumps of
r13 could not show those. Pass --initial to get the old pre-execution
behaviour.

Usage: python tools/dump_plans_r14.py <suffix> [--initial] [query ...]
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


def counts(plan: str) -> str:
    return (f"Exchange={plan.count('Exchange hashpartitioning')}"
            f" SMJ={plan.count('SortMergeJoin')}"
            f" BHJ={plan.count('BroadcastHashJoin')}"
            f" SHJ={plan.count('ShuffledHashJoin')}"
            f" PyEval={plan.count('EvalPython') + plan.count('MapInPandas')}"
            f" final={'isFinalPlan=true' in plan}")


def main() -> None:
    if "--selfcheck" in sys.argv[1:]:
        # Clean-shell import canary, no JVM.
        print(f"selfcheck OK: {len(all_queries())} queries importable")
        return
    args = [a for a in sys.argv[1:] if a != "--initial"]
    initial = "--initial" in sys.argv[1:]
    suffix = args[0] if args else "before"
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    targets = names or [n for n, q in sorted(qs.items()) if q.headline]
    for name in targets:
        df = qs[name].fn(spark, sf_dir)
        mode = "initial"
        if not initial:
            # Execute THIS DataFrame instance: its QueryExecution then
            # caches the finalized AdaptiveSparkPlan, and the explain
            # below prints the runtime plan (isFinalPlan=true).
            spark.sparkContext.setJobDescription(f"plan-dump: {name}")
            df.collect()
            spark.sparkContext.setJobDescription(None)
            mode = "final (post-execution, AQE-resolved)"
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted'), {mode}, "
                     f"at {sf_dir}\n")
            fh.write(plan)
        print(f"{name}: {counts(plan)}")


if __name__ == "__main__":
    main()
