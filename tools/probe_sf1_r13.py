"""Focused sf1.0 timing probe for the r13-changed queries.

Same noop-sink discipline as bench.py (warm 2, min-of-3 — lighter
than the full bench's warm 3/min-of-5 because sf1.0 runs are ~10-100x
longer; methodology labelled in OPTIMIZATION_r13.md). Prints one JSON
line per scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from transcript_analysis_spark.plans import all_queries  # noqa: E402
from transcript_analysis_spark.session import get_spark  # noqa: E402

QUERIES = [
    "islands_flagship", "bloom_prefilter_contamination",
    "sql_frontend_revenue_by_region", "pagerank_purchase_graph",
    "ngram_model_score", "lm_perplexity_filter",
    "duplicate_ngram_coverage", "minhash_lsh_candidate_pairs",
]


def main() -> None:
    if "--selfcheck" in sys.argv[1:]:
        # Clean-shell import canary (r12 verdict item 2), no JVM.
        from transcript_analysis_spark.plans import all_queries
        print(f"selfcheck OK: {len(all_queries())} queries importable")
        return
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1",
                            os.path.join(ROOT, ".local", "sf1.0")]
    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for sf_dir in dirs:
        out = {}
        for name in QUERIES:
            spark._jvm.System.gc()
            fn = qs[name].fn
            for _ in range(2):
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
            best = None
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
        print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
