from apache___solr_spark.sources.loaders import (  # noqa: F401
    export_sorted,
    read_csv_docs,
    read_jdbc_stream,
    read_json_docs,
    write_response,
)
from apache___solr_spark.sources.warc import (  # noqa: F401
    build_warc,
    parse_warc_records,
    read_warc_pages,
)
