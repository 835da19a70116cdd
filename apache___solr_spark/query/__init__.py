from apache___solr_spark.query.parser import ParsedQuery, parse_query  # noqa: F401
from apache___solr_spark.query.engine import SearchEngine  # noqa: F401
