"""ANN acceleration via MLlib LSH (SURVEY §4 X15).

The reference uses a pgvector HNSW index; Spark has no HNSW, and
SURVEY's verdict is that MLlib's BucketedRandomProjectionLSH (or the
explicit arithmetic RP-LSH in plans/data_pipeline.py) is the right
physical substitute: bucket vectors once, then approximate
similarity joins / top-k probe only candidate buckets.

Gated behind import-try per the environment rules; pyspark.ml ships
in the container, so the operator is live and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    HAVE_MLLIB = True
except Exception:  # pragma: no cover - mllib always present here
    HAVE_MLLIB = False


def fit_lsh_model(embeddings: DataFrame, vec_col: str = "embedding",
                  bucket_length: float = 2.0, num_tables: int = 3,
                  seed: int = 42):
    """Fit a random-projection LSH model over an array<float> column.
    Deterministic under the fixed seed."""
    if not HAVE_MLLIB:
        raise NotImplementedError("pyspark.ml not available")
    df = embeddings.withColumn("__vec", array_to_vector(
        F.expr(f"transform({vec_col}, x -> cast(x as double))")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="__vec", outputCol="__hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=seed)
    return lsh.fit(df), df


def approx_similarity_pairs(embeddings: DataFrame, threshold: float,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            **lsh_kwargs) -> DataFrame:
    """Approximate euclidean-distance self-join: pairs within
    `threshold`, discovered through shared LSH buckets instead of an
    all-pairs scan (the X15 scale path)."""
    if embeddings.isEmpty():
        # MLlib fit() raises on an empty dataset; an empty corpus has
        # no pairs — return the contract schema instead of crashing
        # (the empty-partition robustness gate in test_empty_inputs).
        return embeddings.sparkSession.createDataFrame(
            [], f"{id_col} bigint, vec_b bigint, euclidean_dist double"
        ).withColumnRenamed(id_col, "vec_a")
    model, df = fit_lsh_model(embeddings, vec_col, **lsh_kwargs)
    joined = model.approxSimilarityJoin(df, df, threshold, distCol="dist")
    return (joined
            .select(F.col(f"datasetA.{id_col}").alias("vec_a"),
                    F.col(f"datasetB.{id_col}").alias("vec_b"),
                    F.round("dist", 6).alias("euclidean_dist"))
            .filter(F.col("vec_a") < F.col("vec_b")))


def approx_nearest_neighbors(embeddings: DataFrame, query_vec: list[float],
                             k: int = 10, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             **lsh_kwargs) -> DataFrame:
    """Approximate top-k nearest neighbors of a query vector."""
    from pyspark.ml.linalg import Vectors
    model, df = fit_lsh_model(embeddings, vec_col, **lsh_kwargs)
    out = model.approxNearestNeighbors(
        df, Vectors.dense([float(x) for x in query_vec]), k, distCol="dist")
    return out.select(id_col, F.round("dist", 6).alias("euclidean_dist"))
