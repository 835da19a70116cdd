"""UpdateRequestProcessor chain — ingest-time document transforms.

The reference runs every incoming document through a configured chain of
UpdateRequestProcessors (solr/core/src/java/org/apache/solr/update/
processor/ — 60+ factories; UpdateRequestProcessorChain.java composes
them).  Here each processor factory returns a pure ``DataFrame ->
DataFrame`` transform built from JVM column expressions (no per-row
Python), and :func:`processor_chain` composes them in order — the chain
runs map-side inside whatever scan feeds the index builder, adding no
shuffle and no action of its own, so it costs one codegen'd projection at
100 TB.

Factory -> reference file (all under update/processor/):

- clone_field        CloneFieldUpdateProcessorFactory.java
- regex_replace      RegexReplaceProcessorFactory.java
- trim_field         TrimFieldUpdateProcessorFactory.java
- remove_blank       RemoveBlankFieldUpdateProcessorFactory.java
- truncate_field     TruncateFieldUpdateProcessorFactory.java
- field_length       FieldLengthUpdateProcessorFactory.java
- concat_field       ConcatFieldUpdateProcessorFactory.java
- count_field_values CountFieldValuesUpdateProcessorFactory.java
- default_value      DefaultValueUpdateProcessorFactory.java
- timestamp_field    TimestampUpdateProcessorFactory.java
- uuid_field         UUIDUpdateProcessorFactory.java
- ignore_field       IgnoreFieldUpdateProcessorFactory.java
- html_strip_field   HTMLStripFieldUpdateProcessorFactory.java
- signature_dedup    SignatureUpdateProcessorFactory.java (overwriteDupes)
- langid_field       the langid module's LanguageIdentifierUpdateProcessor
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Processor = Callable[[DataFrame], DataFrame]


def processor_chain(*procs: Processor) -> Processor:
    """UpdateRequestProcessorChain.java: compose processors in order."""

    def run(df: DataFrame) -> DataFrame:
        for p in procs:
            df = p(df)
        return df

    return run


def clone_field(src: str, dest: str) -> Processor:
    """CloneFieldUpdateProcessorFactory: copy ``src`` into ``dest``
    (the schema copyField analog at ingest time)."""
    return lambda df: df.withColumn(dest, F.col(src))


def regex_replace(field: str, pattern: str, replacement: str) -> Processor:
    """RegexReplaceProcessorFactory: java.util.regex replace-all on the
    field value (literalReplacement=true quoting is the caller's concern,
    as in the reference)."""
    return lambda df: df.withColumn(
        field, F.regexp_replace(F.col(field), pattern, replacement)
    )


def trim_field(*fields: str) -> Processor:
    """TrimFieldUpdateProcessorFactory: String.trim() each value."""

    def run(df: DataFrame) -> DataFrame:
        for f in fields:
            df = df.withColumn(f, F.trim(F.col(f)))
        return df

    return run


def remove_blank(*fields: str) -> Processor:
    """RemoveBlankFieldUpdateProcessorFactory: zero-length string -> the
    field is removed (null here — parquet's absent-value form)."""

    def run(df: DataFrame) -> DataFrame:
        for f in fields:
            df = df.withColumn(
                f, F.when(F.col(f) != "", F.col(f))  # '' and null -> null
            )
        return df

    return run


def truncate_field(field: str, max_length: int) -> Processor:
    """TruncateFieldUpdateProcessorFactory: cap the value at maxLength
    chars."""
    return lambda df: df.withColumn(
        field, F.substring(F.col(field), 1, int(max_length))
    )


def field_length(src: str, dest: str | None = None) -> Processor:
    """FieldLengthUpdateProcessorFactory: replace (or mirror into
    ``dest``) the CharSequence value with its length."""
    return lambda df: df.withColumn(dest or src, F.length(F.col(src)))


def concat_field(field: str, delimiter: str = ", ") -> Processor:
    """ConcatFieldUpdateProcessorFactory: join a multivalued (array)
    field's values into one delimited string."""
    return lambda df: df.withColumn(
        field, F.array_join(F.col(field), delimiter)
    )


def count_field_values(src: str, dest: str) -> Processor:
    """CountFieldValuesUpdateProcessorFactory: number of values of the
    multivalued ``src`` into ``dest`` (0 for null, like an absent field)."""
    return lambda df: df.withColumn(
        dest,
        F.when(F.col(src).isNull(), F.lit(0)).otherwise(F.size(F.col(src))),
    )


def default_value(field: str, value) -> Processor:
    """DefaultValueUpdateProcessorFactory: fill the field when absent."""
    return lambda df: df.withColumn(
        field, F.coalesce(F.col(field), F.lit(value))
    )


def timestamp_field(field: str = "timestamp_", literal=None) -> Processor:
    """TimestampUpdateProcessorFactory: stamp NOW on each doc missing the
    field.  ``literal`` pins the clock for deterministic tests/backfills
    (the reference stamps SolrRequestInfo's request time — one clock per
    update batch, which current_timestamp() reproduces: Spark evaluates it
    once per query)."""
    now = F.lit(literal).cast("timestamp") if literal else F.current_timestamp()

    def run(df: DataFrame) -> DataFrame:
        if field in df.columns:
            return df.withColumn(field, F.coalesce(F.col(field), now))
        return df.withColumn(field, now)

    return run


def uuid_field(field: str = "id", from_field: str | None = None) -> Processor:
    """UUIDUpdateProcessorFactory: fill the field with a UUID when absent.
    ``from_field`` switches to a deterministic content-derived UUID (v8-
    style: the md5 of the named field formatted as a UUID) — the
    reproducible-pipeline variant; default matches the reference's random
    UUID.randomUUID()."""
    if from_field is None:
        fresh: Column = F.expr("uuid()")
    else:
        h = F.md5(F.col(from_field).cast("string"))
        fresh = F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.substring(h, 13, 4),
            F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        )

    def run(df: DataFrame) -> DataFrame:
        if field in df.columns:
            return df.withColumn(field, F.coalesce(F.col(field), fresh))
        return df.withColumn(field, fresh)

    return run


def ignore_field(*fields: str) -> Processor:
    """IgnoreFieldUpdateProcessorFactory: drop the named fields."""
    return lambda df: df.drop(*fields)


def html_strip_field(src: str, dest: str | None = None) -> Processor:
    """HTMLStripFieldUpdateProcessorFactory: strip markup from the field
    via the SAME HTMLStripCharFilter-equivalent the index analysis chain
    uses (analysis/html_strip.py) — Arrow-batched, the one per-row-Python
    processor (markup parsing is stateful)."""
    from apache___solr_spark.analysis.html_strip import html_strip

    out = dest or src

    def run(df: DataFrame) -> DataFrame:
        fields = [
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != out
        ]
        schema = ", ".join(fields + [f"{out} string"])
        cols = [c for c in df.columns if c != out]

        def strip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                res = pdf[cols].copy()
                res[out] = [
                    html_strip(v) if v is not None else None
                    for v in pdf[src]
                ]
                yield res

        return df.mapInPandas(strip, schema=schema)

    return run


def signature_dedup(
    sig_fields: list[str],
    sig_field: str = "signature_",
    overwrite_dupes: bool = True,
    order_by: str | None = None,
) -> Processor:
    """SignatureUpdateProcessorFactory (Lookup3Signature semantics): add a
    64-bit signature of the concatenated ``sig_fields`` values; with
    ``overwrite_dupes`` only one doc per signature survives (the
    reference's delete-by-signature-then-add collapses to keep-one).

    ``order_by`` names a column whose ascending-minimal row wins per
    signature (deterministic); default keeps an arbitrary row per group
    exactly like the reference's last-writer-wins under concurrent adds.
    One hash + one shuffle on the signature — the exact-dedup plan shape
    (pipeline/dedup.py) at 100 TB.
    """

    def run(df: DataFrame) -> DataFrame:
        sig = F.xxhash64(*[F.col(f) for f in sig_fields]).alias(sig_field)
        out = df.withColumn(sig_field, sig)
        if not overwrite_dupes:
            return out
        if order_by is None:
            return out.dropDuplicates([sig_field])
        w = Window.partitionBy(sig_field).orderBy(F.col(order_by).asc())
        return (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    return run


def langid_field(
    src: str, lang_field: str = "language_", threshold: float = 0.08
) -> Processor:
    """LanguageIdentifierUpdateProcessor (langid module): annotate each doc
    with the detected language of ``src`` — the stopword-ratio en/other
    heuristic the pipeline layer ships (pipeline/textqual.py), inlined as
    column expressions so the chain stays one projection."""
    from apache___solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS
    from apache___solr_spark.pipeline.textqual import _simple_tokens

    def run(df: DataFrame) -> DataFrame:
        toks = _simple_tokens(F.col(src))
        stops = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
        n_stop = F.size(F.array_intersect(toks, stops))
        n_distinct = F.size(F.array_distinct(toks))
        ratio = F.when(n_distinct > 0, n_stop / n_distinct).otherwise(
            F.lit(0.0)
        )
        return df.withColumn(
            lang_field,
            F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other")),
        )

    return run
