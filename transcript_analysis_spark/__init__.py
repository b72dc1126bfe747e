"""transcript_analysis_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``C-Segroves/transcript_analysis`` (see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, window
functions for smoothing and gaps-and-islands, co-partitioned joins for
n-gram model scoring, Arrow-vectorized pandas UDFs only where built-in
operators cannot express the semantics, and Structured Streaming for
the incremental paths.
"""

__version__ = "0.1.0"
