from apache___solr_spark.streaming.topic import (  # noqa: F401
    daemon_batch,
    index_topic,
    topic_stream,
)
