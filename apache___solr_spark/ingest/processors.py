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
- parse_date_field   ParseDateFieldUpdateProcessorFactory.java
- parse_numeric_field ParseIntField/ParseLongField/ParseFloatField/
                     ParseDoubleFieldUpdateProcessorFactory.java
- parse_boolean_field ParseBooleanFieldUpdateProcessorFactory.java
- first_field_value  FirstFieldValueUpdateProcessorFactory.java
- last_field_value   LastFieldValueUpdateProcessorFactory.java
- min_field_value    MinFieldValueUpdateProcessorFactory.java
- max_field_value    MaxFieldValueUpdateProcessorFactory.java
- uniq_field_values  UniqFieldsUpdateProcessorFactory.java
- field_name_mutating FieldNameMutatingUpdateProcessorFactory.java
- ignore_large_documents IgnoreLargeDocumentProcessorFactory.java
- regexp_boost       RegexpBoostProcessor.java
- doc_expiration / expired_docs_filter
                     DocExpirationUpdateProcessorFactory.java
- version_constraints DocBasedVersionConstraintsProcessor.java
- content_hash_version ContentHashVersionProcessor.java
- tolerant_split     TolerantUpdateProcessor.java (maxErrors partition)
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


def parse_date_field(field: str, formats: list[str]) -> Processor:
    """ParseDateFieldUpdateProcessorFactory: try each configured format in
    order; the first that parses wins (the reference attempts its
    ``format`` patterns per value and mutates to a Date on success).  A
    DataFrame column holds one type, so values no format accepts become
    null rather than staying strings — the one honest divergence from the
    per-value mixed-type mutation a document store allows."""

    def run(df: DataFrame) -> DataFrame:
        attempts = [F.try_to_timestamp(F.col(field), F.lit(f)) for f in formats]
        return df.withColumn(field, F.coalesce(*attempts))

    return run


def parse_numeric_field(field: str, type_name: str = "long") -> Processor:
    """ParseInt/Long/Float/DoubleFieldUpdateProcessorFactory: parse the
    string value into the named numeric type (``int``/``long``/``float``/
    ``double``); unparseable values become null (see parse_date_field
    note).  Uses try_cast so a bad value never fails the job — the
    reference likewise leaves the chain running."""
    if type_name not in ("int", "long", "float", "double"):
        raise ValueError(f"unsupported numeric type {type_name!r}")
    return lambda df: df.withColumn(
        field, F.col(field).try_cast(type_name)
    )


def parse_boolean_field(
    field: str,
    true_values: tuple[str, ...] = ("true",),
    false_values: tuple[str, ...] = ("false",),
    case_sensitive: bool = False,
) -> Processor:
    """ParseBooleanFieldUpdateProcessorFactory: values in ``trueValues``
    -> true, in ``falseValues`` -> false, anything else null (reference
    default caseSensitive=false, trueValues=[true], falseValues=[false])."""

    def norm(vals: tuple[str, ...]) -> list[str]:
        return [v if case_sensitive else v.lower() for v in vals]

    tv, fv = norm(true_values), norm(false_values)

    def run(df: DataFrame) -> DataFrame:
        v = F.col(field) if case_sensitive else F.lower(F.col(field))
        return df.withColumn(
            field,
            F.when(v.isin(tv), F.lit(True)).when(v.isin(fv), F.lit(False)),
        )

    return run


def first_field_value(*fields: str) -> Processor:
    """FirstFieldValueUpdateProcessorFactory: keep only the first value of
    each multivalued (array) field."""

    def run(df: DataFrame) -> DataFrame:
        for f in fields:
            df = df.withColumn(f, F.col(f).getItem(0))
        return df

    return run


def last_field_value(*fields: str) -> Processor:
    """LastFieldValueUpdateProcessorFactory: keep only the last value."""

    def run(df: DataFrame) -> DataFrame:
        for f in fields:
            df = df.withColumn(f, F.element_at(F.col(f), -1))
        return df

    return run


def min_field_value(*fields: str) -> Processor:
    """MinFieldValueUpdateProcessorFactory: collapse the multivalued field
    to its minimum (natural ordering of the element type)."""

    def run(df: DataFrame) -> DataFrame:
        for f in fields:
            df = df.withColumn(f, F.array_min(F.col(f)))
        return df

    return run


def max_field_value(*fields: str) -> Processor:
    """MaxFieldValueUpdateProcessorFactory: collapse to the maximum."""

    def run(df: DataFrame) -> DataFrame:
        for f in fields:
            df = df.withColumn(f, F.array_max(F.col(f)))
        return df

    return run


def uniq_field_values(*fields: str) -> Processor:
    """UniqFieldsUpdateProcessorFactory: de-duplicate a multivalued field's
    values, keeping first-occurrence order (the reference collects into an
    insertion-ordered set)."""

    def run(df: DataFrame) -> DataFrame:
        for f in fields:
            df = df.withColumn(f, F.array_distinct(F.col(f)))
        return df

    return run


def field_name_mutating(pattern: str, replacement: str) -> Processor:
    """FieldNameMutatingUpdateProcessorFactory: rename every column whose
    name matches ``pattern`` via regex substitution (the reference's
    pattern/replacement params).  Renames collapsing two columns onto one
    name raise — same as the reference's duplicate-field error."""
    import re as _re

    rx = _re.compile(pattern)

    def run(df: DataFrame) -> DataFrame:
        mapping = {c: rx.sub(replacement, c) for c in df.columns}
        targets = list(mapping.values())
        dupes = {t for t in targets if targets.count(t) > 1}
        if dupes:
            raise ValueError(f"field-name mutation collides on {sorted(dupes)}")
        for old, new in mapping.items():
            if old != new:
                df = df.withColumnRenamed(old, new)
        return df

    return run


def ignore_large_documents(
    limit_bytes: int, fields: list[str] | None = None
) -> Processor:
    """IgnoreLargeDocumentProcessorFactory: drop documents whose estimated
    size exceeds ``limit`` (the reference estimates the raw field payload;
    here the sum of byte lengths of the named string/binary fields, or of
    every string column when ``fields`` is None) — a pushable filter, no
    shuffle."""

    def run(df: DataFrame) -> DataFrame:
        cols = fields
        if cols is None:
            cols = [
                f.name
                for f in df.schema.fields
                if f.dataType.simpleString() in ("string", "binary")
            ]
        size = sum(
            (F.coalesce(F.octet_length(F.col(c).cast("string")), F.lit(0))
             for c in cols),
            start=F.lit(0),
        )
        return df.filter(size <= int(limit_bytes))

    return run


def regexp_boost(
    src: str,
    rules: list[tuple[str, float]],
    boost_field: str = "document_boost",
) -> Processor:
    """RegexpBoostProcessor (update/processor/RegexpBoostProcessor.java):
    multiply ``boost_field`` by every rule boost whose regex matches the
    ``src`` value (the reference reads boostFile lines "pattern,boost" and
    multiplies all matching rules into the existing boost).  Missing
    boost column starts at 1.0."""

    def run(df: DataFrame) -> DataFrame:
        boost: Column = (
            F.col(boost_field).cast("double")
            if boost_field in df.columns
            else F.lit(1.0)
        )
        boost = F.coalesce(boost, F.lit(1.0))
        for pattern, b in rules:
            boost = boost * F.when(
                F.regexp_like(F.coalesce(F.col(src), F.lit("")), F.lit(pattern)),
                F.lit(float(b)),
            ).otherwise(F.lit(1.0))
        return df.withColumn(boost_field, boost)

    return run


def doc_expiration(
    ttl: str | None = None,
    ttl_field: str | None = None,
    expire_field: str = "_expire_at_",
    now=None,
) -> Processor:
    """DocExpirationUpdateProcessorFactory: stamp ``expire_field`` =
    request time + TTL.  ``ttl`` is a date-math delta string applied to
    every doc (``"+30SECONDS"``, ``"+7DAYS"``); ``ttl_field`` names a
    per-doc column carrying such a string instead (the reference's
    ttlFieldName; per-doc math needs the tiny datemath parser per distinct
    value, so those are resolved via a join of distinct TTLs — bounded by
    the number of DISTINCT ttl strings, not rows).  ``now`` pins the clock
    for tests; the reaper half of the factory is :func:`expired_docs_filter`.
    """
    from apache___solr_spark.functions.datemath import date_math

    if (ttl is None) == (ttl_field is None):
        raise ValueError("exactly one of ttl / ttl_field is required")
    anchor = (
        F.lit(now).cast("timestamp") if now is not None
        else F.current_timestamp()
    )

    def run(df: DataFrame) -> DataFrame:
        if ttl is not None:
            return df.withColumn(expire_field, date_math(anchor, ttl))
        distinct = [
            r[0]
            for r in df.select(ttl_field).distinct().collect()
            if r[0] is not None
        ]
        expire = F.lit(None).cast("timestamp")
        for spec in distinct:
            expire = F.when(
                F.col(ttl_field) == spec, date_math(anchor, spec)
            ).otherwise(expire)
        return df.withColumn(expire_field, expire)

    return run


def expired_docs_filter(
    expire_field: str = "_expire_at_", now=None
) -> Processor:
    """The reaper half of DocExpirationUpdateProcessorFactory's
    deleteChain: keep only docs that have not expired (null = never
    expires).  Runs as a pushable filter over the stored table."""
    anchor = (
        F.lit(now).cast("timestamp") if now is not None
        else F.current_timestamp()
    )
    return lambda df: df.filter(
        F.col(expire_field).isNull() | (F.col(expire_field) > anchor)
    )


def version_constraints(
    new_df: DataFrame,
    existing_df: DataFrame,
    key: str = "id",
    version_field: str = "my_version_l",
) -> DataFrame:
    """DocBasedVersionConstraintsProcessor: accept an update only when its
    user-supplied version is strictly newer than the stored document's
    (versionField semantics; older/equal updates are silently dropped).
    Within one batch the highest version per key wins.  One broadcast-able
    join on the key — no driver state."""
    w = Window.partitionBy(key).orderBy(F.col(version_field).desc())
    newest = (
        new_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    stored = existing_df.select(
        F.col(key).alias("_k"), F.col(version_field).alias("_stored_v")
    )
    return (
        newest.join(stored, on=newest[key] == stored["_k"], how="left")
        .filter(
            F.col("_stored_v").isNull()
            | (F.col(version_field) > F.col("_stored_v"))
        )
        .drop("_k", "_stored_v")
    )


def content_hash_version(
    hash_fields: list[str], version_field: str = "content_hash_"
) -> Processor:
    """ContentHashVersionProcessor: stamp a content-derived version (hash
    of the named fields) so unchanged re-adds are detectable no-ops;
    pair with :func:`version_constraints` or an anti-join on the hash to
    skip them."""
    return lambda df: df.withColumn(
        version_field,
        F.xxhash64(*[F.col(f) for f in hash_fields]).cast("string"),
    )


def tolerant_split(
    df: DataFrame, required: list[str]
) -> tuple[DataFrame, DataFrame]:
    """TolerantUpdateProcessor: instead of failing the whole batch on a
    bad document, partition it into (accepted, rejected) — rejected docs
    are those missing any ``required`` field (the batch analog of
    collecting per-doc errors up to maxErrors while the rest index).  Both
    halves share one scan; no shuffle."""
    pred = F.lit(True)
    for f in required:
        pred = pred & F.col(f).isNotNull()
    return df.filter(pred), df.filter(~pred)
