from transcript_analysis_spark.plans.registry import Query, all_queries, get_query, register

__all__ = ["Query", "all_queries", "get_query", "register"]
