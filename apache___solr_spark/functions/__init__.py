from apache___solr_spark.functions.registry import FUNCTION_REGISTRY, fn  # noqa: F401
