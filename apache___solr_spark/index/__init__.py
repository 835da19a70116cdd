from apache___solr_spark.index.builder import IndexPaths, build_index  # noqa: F401
