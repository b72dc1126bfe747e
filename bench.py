"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is fully materialized through the `noop` sink (computes
every column, writes nothing) — `count()` would let Catalyst prune the
computed columns and undercount the work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transcript_analysis_spark.plans import all_queries
from transcript_analysis_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = {name: q for name, q in all_queries().items() if q.headline}
    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        # Isolate queries from each other's heap garbage: with 20+
        # headliners in one JVM, later queries inherit the earlier
        # ones' GC debt (r4->r5 analysis: ngram_model_score drifted
        # +13% on an unchanged plan purely from session pressure as
        # the headline count grew 13->21). One full GC between
        # queries restores a comparable starting heap.
        spark._jvm.System.gc()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan + JIT + cache OS pages)
        best = None
        for _ in range(5):  # min-of-5 steady-state runs (shields the
            t0 = time.time()  # metric from one-off system contention;
            # r2->r3 analysis showed single-query wall time swinging
            # 3.1-9.1s under ambient load on an unchanged plan)
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
