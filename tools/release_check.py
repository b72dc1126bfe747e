"""One-command release gate — everything the driver exercises, in
order, with a single PASS/FAIL verdict:

1. entry smoke: `__spark_entry__.entry()` runs, returns rows, and
   queries()/oracle_sql() counts line up;
2. oracle sweep: every registered query vs its DuckDB oracle at the
   given scale factor (tools/check_correctness.py);
3. bench: headline wall times (bench.py), printed for the record.

Usage: python tools/release_check.py [sf_dir]
(default /root/testdata/sf0.01; bench always runs at
$SPARK_GRAFT_SF_DIR or its sf0.1 default).
Exit code 0 = releasable.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    env = dict(os.environ, PYTHONPATH=ROOT)
    failures = []

    sys.path.insert(0, ROOT)
    from transcript_analysis_spark.session import get_spark
    spark = get_spark("release-check")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    n_rows = e.entry(spark).count()
    nq, no = len(e.queries()), len(e.oracle_sql())
    print(f"[1/3] entry smoke: rows={n_rows} queries={nq} oracles={no}")
    if n_rows <= 0 or no > nq:
        failures.append("entry smoke")
    spark.stop()

    print(f"[2/3] oracle sweep at {sf_dir} ...")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/check_correctness.py"),
         sf_dir], env=env, capture_output=True, text=True)
    tail = "\n".join(r.stdout.replace("\r", "\n").splitlines()[-3:])
    print(tail)
    if r.returncode != 0:
        failures.append("oracle sweep")

    print("[3/3] bench ...")
    b = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       env=env, capture_output=True, text=True)
    bench_lines = [ln for ln in b.stdout.splitlines()
                   if ln.startswith('{"metric"')]
    print(bench_lines[-1] if bench_lines else "(no bench output)")
    if b.returncode != 0 or not bench_lines:
        failures.append("bench")

    if failures:
        print(f"RELEASE CHECK FAILED: {failures}")
        sys.exit(1)
    print("RELEASE CHECK PASSED")


if __name__ == "__main__":
    main()
