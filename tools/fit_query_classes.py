"""Fit bench.py's QUERY_CLASS map from measured contention
sensitivity (r11 verdict item 5: the hand-assigned classes are the
gate's fallback normalization dimension — derive them from data and
pin disagreements).

Method — a controlled contention experiment, not a correlation over
happenstance weather: each headline query is timed quiet and then
under three sustained background loads, one per resource class, where
the load is a thread in the SAME JVM running bench.py's own
quarter-scale mini-probe back-to-back (cpu: codegen integer fold;
scan: parquet read+decode; shuffle: exchange into 2M groups). The
class whose load inflates a query most is, by construction, the class
whose CONTENTION the gate should excuse that query for — which is
exactly what the per-class drift factor models.

Measurement discipline (the first sitting of this experiment was
discarded by its own sanity check): states are interleaved PER QUERY
— each query's quiet/cpu/scan/shuffle cells are measured within one
~20-second window, load threads toggled around each cell — and the
whole sweep runs twice with a per-cell min. A state-level pass order
(all-quiet first, then all-cpu, ...) bakes session drift into the
baseline: the discarded sitting's quiet pass ran JIT-coldest and
every load state came out FASTER than quiet, inverting the
inflations.

Two normalizations make the per-class signal comparable:
  - per query: inflation_cls = t_under_cls / t_quiet (min over
    passes on both sides);
  - per state: relative sensitivity = inflation_cls / median over all
    queries of inflation_cls. The FIFO slot-stealing component of a
    concurrent 32-task probe job is common to every query in a state
    (and the three probes have different durations), so dividing by
    the state median isolates WHICH contention hurts a query more
    than it hurts the field.
Fitted class = argmax over classes of relative sensitivity; `margin`
(top minus runner-up) is the confidence — below --margin (default
0.05) the hand assignment is retained (the data cannot distinguish,
and churn without signal would only un-anchor the r11 baselines).

A closing block validates the probe family itself: each of the three
mini-probes is timed (min-of-3) under each load state — the probe
matching the active load should inflate most vs its own quiet read
(recorded in the report; a probe that doesn't separate under its own
load would invalidate the gate's per-class normalization, not just
this fit).

Usage: python tools/fit_query_classes.py [--reps N] [--margin F]
Writes .local/class_fit.json and prints a JSON summary line; run it
on an otherwise-quiet box (ambient load contaminates the states).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402
from transcript_analysis_spark.plans import all_queries  # noqa: E402
from transcript_analysis_spark.session import get_spark  # noqa: E402

CLASSES = ("cpu", "scan", "shuffle")


def _timed_min(fn, reps: int) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    if "--selfcheck" in sys.argv[1:]:
        # Clean-shell import canary (r12 verdict item 2): the heavy
        # imports (bench, engine) already ran at module level; prove
        # they resolved, no JVM.
        print(f"selfcheck OK: {len(all_queries())} queries, "
              f"classes={','.join(CLASSES)}, "
              f"bench refs={len(bench.CALIBRATION_REFS)}")
        return
    reps = 2
    margin_floor = 0.05
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--margin="):
            margin_floor = float(a.split("=", 1)[1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fit-classes")
    spark.sparkContext.setLogLevel("ERROR")
    queries = {n: q for n, q in all_queries().items() if q.headline}

    def run_query(q):
        return lambda: (q.fn(spark, sf_dir)
                        .write.format("noop").mode("overwrite").save())

    print(f"warming {len(queries)} headliners at {sf_dir} ...")
    for name, q in sorted(queries.items()):
        run_query(q)()
    for c in CLASSES:            # warm the probe plans too
        bench._mini_probe_fn(spark, c)()

    class _Load:
        """Start/stop a background thread running one class's
        quarter-scale mini-probe back-to-back in this JVM."""

        def __init__(self, cls: str | None):
            self.cls = cls
            self.stop = threading.Event()
            self.th = None

        def __enter__(self):
            if self.cls:
                fn = bench._mini_probe_fn(spark, self.cls)

                def loop(fn=fn, ev=self.stop):
                    while not ev.is_set():
                        try:
                            fn()
                        except Exception:  # noqa: BLE001 - closing
                            return

                self.th = threading.Thread(target=loop, daemon=True)
                self.th.start()
                time.sleep(0.5)  # establish steady-state contention
            return self

        def __exit__(self, *exc):
            if self.th:
                self.stop.set()
                self.th.join(timeout=120)

    for c in CLASSES:   # warm every load plan before any timed cell
        bench._mini_probe_fn(spark, c)()

    states = ("quiet",) + CLASSES
    times: dict[str, dict[str, float]] = {s: {} for s in states}
    # states interleaved PER QUERY, full sweep twice, min per cell —
    # session drift (JIT, heap, page cache) lands on every cell of a
    # query equally instead of on whole states (see module docstring)
    for pass_i in range(reps):
        for name, q in sorted(queries.items()):
            spark._jvm.System.gc()
            for state in states:
                with _Load(None if state == "quiet" else state):
                    t = _timed_min(run_query(q), 1)
                prev = times[state].get(name)
                times[state][name] = t if prev is None else min(prev, t)
        print(f"pass {pass_i + 1}/{reps}: quiet total "
              f"{round(sum(times['quiet'].values()), 1)}s")

    # probe-family validation: each mini-probe min-of-3 under each load
    probe_reads: dict[str, dict[str, float]] = {}
    for state in states:
        with _Load(None if state == "quiet" else state):
            probe_reads[state] = {
                c: _timed_min(bench._mini_probe_fn(spark, c), 3)
                for c in CLASSES}

    quiet = times["quiet"]
    inflation = {c: {n: round(times[c][n] / quiet[n], 3) for n in quiet}
                 for c in CLASSES}
    state_median = {c: statistics.median(inflation[c].values())
                    for c in CLASSES}
    report = {"sf_dir": sf_dir, "reps": reps, "times": times,
              "probe_reads": probe_reads, "inflation": inflation,
              "state_median": state_median, "queries": {}}
    fitted_map = {}
    for name in sorted(quiet):
        rel = {c: round(inflation[c][name] / state_median[c], 3)
               for c in CLASSES}
        ranked = sorted(rel.items(), key=lambda kv: -kv[1])
        fit, margin = ranked[0][0], round(ranked[0][1] - ranked[1][1], 3)
        hand = bench.QUERY_CLASS.get(name, "cpu")
        final = fit if margin >= margin_floor else hand
        fitted_map[name] = final
        report["queries"][name] = {
            "rel_sensitivity": rel, "fitted": fit, "margin": margin,
            "hand": hand, "final": final,
            "decided_by": "data" if margin >= margin_floor else
                          "hand (margin below floor)"}
        flag = "" if final == hand else "  <-- CHANGES"
        print(f"{name:34s} rel={rel} fit={fit} m={margin:+.3f} "
              f"hand={hand}{flag}")

    os.makedirs(os.path.join(ROOT, ".local"), exist_ok=True)
    with open(os.path.join(ROOT, ".local", "class_fit.json"), "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    changes = {n: v for n, v in fitted_map.items()
               if v != bench.QUERY_CLASS.get(n, "cpu")}
    print(json.dumps({"metric": "class_fit", "changes": changes,
                      "n_by_data": sum(1 for q in report["queries"]
                                       .values()
                                       if q["decided_by"] == "data"),
                      "probe_reads": probe_reads}))


if __name__ == "__main__":
    main()
