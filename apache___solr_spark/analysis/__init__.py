from apache___solr_spark.analysis.chain import analyze, extract_text  # noqa: F401
from apache___solr_spark.analysis.html_strip import html_strip  # noqa: F401
from apache___solr_spark.analysis.tokenizer import standard_tokenize  # noqa: F401
from apache___solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS  # noqa: F401
