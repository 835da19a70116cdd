"""Arrow-batched pandas UDFs wrapping the analysis chain.

All heavy text work crosses the JVM<->Python boundary in Arrow batches
(north_rule: no per-row Python UDFs).  Each UDF maps a pandas Series batch;
the row-level functions themselves are the same deterministic code the
single-process oracle uses, so distributed output is byte-identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache___solr_spark.analysis.chain import analyze, extract_text


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_text(h, t) for h, t in zip(html, text)], dtype="object"
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def analyze_udf(text: pd.Series) -> pd.Series:
    return pd.Series([analyze(t) for t in text], dtype="object")


# term-frequency map per doc: returns parallel arrays (terms, tfs) to avoid
# a wide shuffle of exploded single-token rows; the caller explodes once.
_TF_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("doclen", T.IntegerType()),
    ]
)


@F.pandas_udf(_TF_SCHEMA)
def term_freqs_udf(text: pd.Series) -> pd.DataFrame:
    terms_col: list[list[str]] = []
    tfs_col: list[list[int]] = []
    lens: list[int] = []
    for t in text:
        toks = analyze(t)
        counts: dict[str, int] = {}
        for tok in toks:
            counts[tok] = counts.get(tok, 0) + 1
        # sort terms for deterministic downstream block content
        items = sorted(counts.items())
        terms_col.append([k for k, _ in items])
        tfs_col.append([v for _, v in items])
        lens.append(len(toks))
    return pd.DataFrame({"terms": terms_col, "tfs": tfs_col, "doclen": lens})
