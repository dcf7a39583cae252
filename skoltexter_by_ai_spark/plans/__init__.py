"""Declared-query registry and pipeline plan compositions."""

from skoltexter_by_ai_spark.plans.registry import QUERY_REGISTRY, QuerySpec, get_query, query_names

__all__ = ["QUERY_REGISTRY", "QuerySpec", "get_query", "query_names"]
