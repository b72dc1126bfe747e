"""Scale probe — runs headline queries against synthetic multiples of
the sf0.1 corpus (union of doc_id-shifted copies) and reports wall
times. Near-linear growth = the plan scales; super-linear growth
flags a shuffle/skew problem before it reaches a real cluster.

Usage: python tools/scale_probe.py [multiples...]   (default 1 2 4)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def build_scaled_dir(spark, base_dir: str, k: int) -> str:
    """documents/embeddings/events scaled k-fold by id-shifted union;
    other tables symlinked."""
    out = tempfile.mkdtemp(prefix=f"scale{k}_")
    from pyspark.sql import functions as F
    from transcript_analysis_spark.sources.tables import TABLES, load_table

    shifted = {"documents": "doc_id", "embeddings": "vec_id", "events": "event_id"}
    for name in TABLES:
        src = os.path.join(base_dir, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if name not in shifted or k == 1:
            os.symlink(src, dst)
            continue
        df = load_table(spark, base_dir, name)
        n = df.count()
        parts = [df]
        for i in range(1, k):
            parts.append(df.withColumn(
                shifted[name], df[shifted[name]] + i * n))
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        if name == "events":
            union = union.withColumn("ts", F.expr("unix_micros(ts) * 1000"))
        union.write.mode("overwrite").parquet(dst)
    return out


def main() -> None:
    multiples = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
    queries = os.environ.get(
        "SPARK_GRAFT_PROBE_QUERIES",
        "islands_flagship,ngram_model_score,"
        "minhash_lsh_candidate_pairs,tumbling_hourly_event_stats").split(",")

    from transcript_analysis_spark.plans import all_queries
    from transcript_analysis_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = all_queries()

    results: dict[str, dict[int, float]] = {q: {} for q in queries}
    dirs = []
    try:
        for k in multiples:
            d = build_scaled_dir(spark, base, k)
            dirs.append(d)
            for qname in queries:
                fn = registry[qname].fn
                fn(spark, d).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                results[qname][k] = round(time.time() - t0, 2)
        print(json.dumps({"base": base, "multiples": multiples,
                          "seconds": results}))
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
