"""Promote the last local bench run to the tracked gate baseline.

The driver's BENCH_r*.json records deliberately carry only bench.py's
compact final line (the 2,000-char stdout tail capture — r11 verdict
item 1), so the per-sample fields the regression gate's sample-paired
and per-class normalizations need (queries_samples, queries_local_cal,
query_class, queries_spread) live only in the full merged record
bench.py writes to .local/bench_last.json. That file is gitignored —
if the machine is recycled, the next round loses the rich baseline
entirely (r11 verdict item 3). This tool copies it to the tracked
BENCH_BASELINE.json with a round stamp; tools/release_check.py's
latest_recorded_bench() prefers the tracked file whenever its round is
>= the highest parsable driver record.

Usage: python tools/save_bench_baseline.py --round N [source.json]
(default source: .local/bench_last.json). Refuses records without a
queries dict or recorded at a non-driver scale factor unless --force.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_SF = 0.1


def main() -> None:
    argv = sys.argv[1:]
    force = "--force" in argv
    usage = "usage: save_bench_baseline.py --round N [source.json]"
    rnd, args = None, []
    it = iter(a for a in argv if a != "--force")
    for a in it:
        if a.startswith("--round="):
            raw = a.split("=", 1)[1]
        elif a == "--round":
            raw = next(it, "")
        else:
            args.append(a)
            continue
        try:
            rnd = int(raw)
        except ValueError:
            sys.exit(usage)
        if rnd < 1:
            sys.exit(f"{usage}\nround must be a positive integer, got {rnd}")
    if rnd is None:
        sys.exit(usage)

    src = args[0] if args else os.path.join(ROOT, ".local",
                                            "bench_last.json")
    rec = json.load(open(src))
    if not rec.get("queries"):
        sys.exit(f"refusing: {src} has no queries dict")
    if rec.get("sf") != DRIVER_SF and not force:
        sys.exit(f"refusing: {src} recorded at sf={rec.get('sf')}, "
                 f"driver benches at sf={DRIVER_SF} (--force to override)")

    out = dict(rec)
    out["round"] = rnd
    out["source"] = os.path.relpath(src, ROOT)
    dst = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {dst}: round={rnd} queries={len(out['queries'])} "
          f"sf={out.get('sf')} "
          f"samples={len(out.get('queries_samples', {}))}")


if __name__ == "__main__":
    main()
