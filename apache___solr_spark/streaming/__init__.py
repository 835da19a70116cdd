from apache___solr_spark.streaming.topic import daemon_batch, topic_stream  # noqa: F401
