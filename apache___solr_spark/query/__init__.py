from apache___solr_spark.query.parser import ParsedQuery, parse_query  # noqa: F401
from apache___solr_spark.query.engine import SearchEngine  # noqa: F401
from apache___solr_spark.query.localparams import (  # noqa: F401
    dispatch_query,
    parse_local_params,
)
from apache___solr_spark.query.structured import structured_q_predicate  # noqa: F401
