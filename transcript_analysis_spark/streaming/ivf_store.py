"""Incremental IVF index maintenance over an embedding stream — the
SEVENTH persisted-store streaming operator (LSH bands, bloom, CMS,
HLL, DSIR weights, perceptron weights, now IVF assignments).

The batch query (`ivf_topk_probe`, plans/data_pipeline.py) assigns
every vector to its nearest centroid inside one plan. At production
scale the centroid table is fit once and FROZEN (the DSIR-store
"frozen model" algebra — probe routing must stay stable or cached
bucket statistics drift), while vectors arrive continuously: each
micro-batch assigns only its own vectors against the broadcast
centroids and appends a ``batch_id=N`` partition of
(vec_id, cent_id, cos9) rows — dynamic partition overwrite, so a
replayed batch rewrites its own output and never duplicates
(assignment is idempotent math, unlike the perceptron store's
updates, so partition overwrite alone is exactly-once).

Search = the registered probe's exact arithmetic over the STORE:
pick the nprobe centroids nearest the query, read only those buckets'
vec_ids from the assignment store, join back to the vector source for
the final exact-cosine top-k. Equivalence is tested three ways:
streamed assignments == the batch assignment frame, replay changes
nothing, and store-backed search returns row-for-row the registered
`ivf_topk_probe` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transcript_analysis_spark.plans.data_pipeline import _spark_cos

IVF_NPROBE = 2


def _vecs(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id", "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"))


def build_centroid_store(emb: DataFrame, centroid_dir: str) -> int:
    """Freeze the centroid table (the deterministic every-53rd-vector
    rule the batch query documents as the trained-k-means stand-in)
    and persist it. Returns the centroid count."""
    cents = (_vecs(emb).filter(F.col("vec_id") % 53 == 1)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("v").alias("cv")))
    cents.write.mode("overwrite").parquet(centroid_dir)
    return emb.sparkSession.read.parquet(centroid_dir).count()


def assign_against_store(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cent_id, cos9) nearest-centroid assignment — the
    identical 9dp-rounded argmax (centroid-id tie-break) as the batch
    probe, so streamed and batch routing agree exactly."""
    from pyspark.sql import Window
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_vc"), F.asc("cent_id"))
    return (_vecs(emb).crossJoin(F.broadcast(cents))
            .withColumn("cos_vc", F.expr(_spark_cos("v", "cv", 9)))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vec_id", "cent_id",
                    F.col("cos_vc").alias("cos9")))


def foreach_batch_ivf(batch_df: DataFrame, batch_id: int,
                      centroid_dir: str, assign_dir: str) -> None:
    """Assign one micro-batch of (vec_id, label, embedding) rows and
    land them in a batch_id partition (replay-idempotent overwrite)."""
    spark = batch_df.sparkSession
    cents = spark.read.parquet(centroid_dir)
    out = (assign_against_store(batch_df, cents)
           .withColumn("batch_id", F.lit(batch_id)))
    (out.write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(assign_dir))


def read_assignments(spark: SparkSession, assign_dir: str) -> DataFrame:
    return spark.read.parquet(assign_dir)


def search_store(spark: SparkSession, centroid_dir: str, assign_dir: str,
                 vectors: DataFrame, k: int = 10,
                 nprobe: int = IVF_NPROBE) -> DataFrame:
    """ANN top-k through the maintained index: nprobe nearest
    centroids for the query (vec_id 0 of `vectors`, matching the
    registered probe), bucket lookup in the assignment store, exact
    cosine only on those buckets' vectors. Returns (vec_id, label,
    cosine) — the registered `ivf_topk_probe` contract."""
    v = _vecs(vectors)
    cents = spark.read.parquet(centroid_dir)
    q = v.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    top_cents = (cents.crossJoin(F.broadcast(q))
                 .select("cent_id",
                         F.expr(_spark_cos("cv", "qv", 9)).alias("cos_qc"))
                 .orderBy(F.desc("cos_qc"), F.asc("cent_id"))
                 .limit(nprobe).select("cent_id"))
    bucket_ids = (read_assignments(spark, assign_dir)
                  .join(F.broadcast(top_cents), "cent_id")
                  .filter(F.col("vec_id") != 0)
                  .select("vec_id").distinct())
    return (bucket_ids.join(v, "vec_id")
            .crossJoin(F.broadcast(q))
            .select("vec_id", "label",
                    F.expr(_spark_cos("v", "qv", 6)).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))
