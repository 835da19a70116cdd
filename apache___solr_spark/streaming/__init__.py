from apache___solr_spark.streaming.topic import (  # noqa: F401
    daemon_batch,
    index_topic,
    topic_stream,
)
from apache___solr_spark.streaming.windows import (  # noqa: F401
    sessionized_agg,
    windowed_agg,
)
