"""Streaming-expression language: parse + lower Solr streaming expressions
(`rollup(search(...), over="a", sum(x))`) to Spark DataFrame plans."""

from apache___solr_spark.expr.lower import StreamFactory  # noqa: F401
from apache___solr_spark.expr.parser import (  # noqa: F401
    NamedParam,
    StreamExpression,
    parse_expression,
)
