"""Sources / sinks: the reference's loaders and response writers, Spark-first.

Solr parses update payloads into SolrInputDocuments via per-format loaders
(solr/core/src/java/org/apache/solr/handler/loader/: JsonLoader ~700 LoC,
CSVLoaderBase, XMLLoader) and serializes results via response writers
(solr/core/src/java/org/apache/solr/response/).  Spark's readers/writers
subsume the parsing; these wrappers pin down the engine-facing conventions
(schema-on-read, uniqueKey enforcement, sorted export).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_pages(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
    validate: bool = True,
) -> DataFrame:
    """Load the Common-Crawl-style pages table the index builds over.

    The canonical production source is an Iceberg table
    ``(url string, warc_ts timestamp, html binary, text string, lang string)``
    — Iceberg gives the build snapshot isolation (a resumed build re-reads
    the SAME snapshot), partition pruning, and incremental-append feeds for
    :mod:`..index.updates`.  ``fmt``:

    - ``"parquet"`` — a parquet path (the tested path in this sandbox).
    - ``"iceberg"`` — ``source`` is a catalog table name (``db.pages``) or
      a path; requires the iceberg-spark-runtime jar on the Spark
      classpath (not bundled with pyspark).  Raises a clear RuntimeError
      if the runtime is missing instead of an opaque ClassNotFound deep
      in a job.
    - ``"auto"`` — iceberg when ``source`` looks like a catalog table name
      (dotted, no path separator, no ``.parquet`` suffix), else parquet.

    With ``validate=True`` the pages schema is checked for the five
    canonical columns up front, so a mis-shaped table fails at load with a
    readable message rather than inside the analysis UDF.
    """
    if fmt == "auto":
        looks_like_table = (
            "." in source
            and "/" not in source
            and not source.endswith(".parquet")
        )
        fmt = "iceberg" if looks_like_table else "parquet"
    if fmt == "parquet":
        df = spark.read.parquet(source)
    elif fmt == "iceberg":
        try:
            df = (
                spark.read.format("iceberg").load(source)
                if "/" in source
                else spark.table(source)
            )
        except Exception as exc:  # ClassNotFound / AnalysisException
            raise RuntimeError(
                "iceberg source requires the iceberg-spark-runtime jar on "
                "the Spark classpath (spark.jars.packages="
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>) "
                f"and a configured catalog; underlying error: {exc}"
            ) from exc
    else:
        raise ValueError(f"unknown pages format {fmt!r}")
    if validate:
        missing = [c for c in PAGES_COLUMNS if c not in df.columns]
        if missing:
            raise ValueError(
                f"pages table at {source!r} is missing columns {missing}; "
                f"expected {PAGES_COLUMNS}, got {tuple(df.columns)}"
            )
    return df


def read_json_docs(
    spark: SparkSession, path: str, schema: str | None = None, unique_key: str = "id"
) -> DataFrame:
    """JsonLoader equivalent (handler/loader/JsonLoader.java): JSON lines ->
    docs; duplicate uniqueKey keeps the LAST occurrence, matching Solr's
    overwrite-on-add semantics (DirectUpdateHandler2.addDoc: updateDocument
    replaces by id)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    df = reader.json(path)
    return _last_wins(df, unique_key)


def read_csv_docs(
    spark: SparkSession, path: str, schema: str | None = None, **options
) -> DataFrame:
    """CSVLoader equivalent (handler/loader/CSVLoaderBase.java)."""
    reader = spark.read.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_jdbc_stream(
    spark: SparkSession, url: str, table: str, **options
) -> DataFrame:
    """JDBCStream equivalent (solrj-streaming/.../stream/JDBCStream.java,
    751 LoC): pull rows from an RDBMS into the dataflow."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def export_sorted(
    df: DataFrame, path: str, sort_cols: list[Column], fmt: str = "parquet"
) -> None:
    """/export handler equivalent (handler/export/ExportWriter.java:98,388):
    full sorted result-set export.  The reference streams 30k-doc batches
    through a queue of docValues iterators; Spark's external sort +
    columnar write is the same capability without the hand-built queue."""
    out = df.sort(*sort_cols)
    getattr(out.write.mode("overwrite"), fmt)(path)


def write_response(df: DataFrame, path: str, fmt: str = "json") -> None:
    """Response writers (response/JSONResponseWriter.java,
    CSVResponseWriter.java, response/CborResponseWriter.java, ...) ->
    df.write.<fmt>.

    ``fmt="cbor"``: one RFC 8949 payload file per partition (an array of
    doc maps — the shape read_cbor_docs round-trips), encoded with the
    repo's own cbor_dumps tables.  Executors write directly to ``path``,
    which therefore must be a filesystem every executor can reach (local
    dir in local mode, a shared mount on a cluster; an object-store
    committer is the documented seam)."""
    writer = df.write.mode("overwrite")
    if fmt == "json":
        writer.json(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "cbor":
        import os as _os

        from apache___solr_spark.sources.binformats import cbor_dumps

        _os.makedirs(path, exist_ok=True)
        cols = df.columns

        def _write_part(idx: int, rows):
            docs = [dict(zip(cols, r)) for r in rows]
            if not docs:
                return iter(())
            tmp = _os.path.join(path, f".part-{idx:05d}.cbor.tmp")
            with open(tmp, "wb") as f:
                f.write(cbor_dumps(docs))
            _os.replace(tmp, _os.path.join(path, f"part-{idx:05d}.cbor"))
            return iter(())

        df.rdd.mapPartitionsWithIndex(_write_part).count()
    else:
        raise NotImplementedError(f"format {fmt!r}")


def _last_wins(df: DataFrame, unique_key: str) -> DataFrame:
    """Duplicate uniqueKey keeps the LAST occurrence — Solr's
    overwrite-on-add (DirectUpdateHandler2.addDoc: updateDocument by id)."""
    if unique_key not in df.columns:
        return df
    return (
        df.withColumn("_arrival", F.monotonically_increasing_id())
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(unique_key).orderBy(
                    F.col("_arrival").desc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_arrival")
    )


def _docs_from_binary_files(
    spark: SparkSession, path: str, extract, unique_key: str
) -> DataFrame:
    """Shared shape for binary update-payload formats: a distributed
    binaryFile scan, per-file decode in an Arrow-batched UDF (one task per
    payload file — the scalable unit), docs re-parsed from JSON lines with
    schema inference, then last-wins uniqueKey dedup."""
    import json as _json
    from typing import Iterator

    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["content"]:
                for doc in extract(bytes(payload)):
                    out.append(_json.dumps(doc, default=str))
            yield pd.DataFrame({"value": out})

    jsonl = raw.mapInPandas(parse, schema="value string")
    df = spark.read.json(jsonl.rdd.map(lambda r: r["value"]))
    return _last_wins(df, unique_key)


def read_javabin_docs(
    spark: SparkSession, path: str, unique_key: str = "id"
) -> DataFrame:
    """JavabinLoader equivalent (handler/loader/JavabinLoader.java): decode
    JavaBin update payloads (JavaBinUpdateRequestCodec NamedList with a
    streamed docs iterator, or a bare marshalled doc list) into docs.
    The wire format is implemented from JavaBinCodec.java's public tag
    table in sources/binformats.py."""
    from apache___solr_spark.sources.binformats import (
        javabin_extract_docs,
        javabin_loads,
    )

    def extract(payload: bytes) -> list[dict]:
        return javabin_extract_docs(javabin_loads(payload))

    return _docs_from_binary_files(spark, path, extract, unique_key)


def read_cbor_docs(
    spark: SparkSession, path: str, unique_key: str = "id"
) -> DataFrame:
    """CborLoader equivalent (handler/loader/CborLoader.java): each payload
    file is a CBOR array of doc maps, a single doc map, or a sequence of
    doc maps; empty docs are dropped (CborLoader.handleDoc guards
    !doc.isEmpty())."""
    from apache___solr_spark.sources.binformats import cbor_loads

    def extract(payload: bytes) -> list[dict]:
        items = cbor_loads(payload, stream=True)
        docs: list[dict] = []
        for item in items:
            if isinstance(item, list):
                docs.extend(d for d in item if isinstance(d, dict) and d)
            elif isinstance(item, dict) and item:
                docs.append(item)
        return docs

    return _docs_from_binary_files(spark, path, extract, unique_key)


def read_xml_docs(
    spark: SparkSession, path: str, unique_key: str = "id"
) -> DataFrame:
    """XMLLoader equivalent (handler/loader/XMLLoader.java): parse Solr
    ``<add><doc><field name="...">value</field>...`` update XML into docs.

    Each input file is one update payload (spark.read wholetext), parsed
    with the stdlib ElementTree inside an Arrow-batched UDF — no external
    XML package needed.  Multi-valued fields collapse to the LAST value
    (the engine is schema-on-read; widen to arrays downstream if needed),
    and duplicate uniqueKeys keep the last occurrence (overwrite-on-add,
    DirectUpdateHandler2.addDoc semantics).
    """
    import json as _json
    from typing import Iterator

    import pandas as pd

    raw = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            out = []
            for payload in pdf["value"]:
                root = ET.fromstring(payload)
                docs = root.iter("doc") if root.tag != "doc" else [root]
                for doc in docs:
                    rec: dict = {}
                    for f in doc.iter("field"):
                        rec[f.attrib["name"]] = f.text
                    out.append(_json.dumps(rec))
            yield pd.DataFrame({"value": out})

    jsonl = raw.mapInPandas(parse, schema="value string")
    df = spark.read.json(jsonl.rdd.map(lambda r: r["value"]))
    return _last_wins(df, unique_key)


def read_pdf_docs(spark: SparkSession, path: str) -> DataFrame:
    """ExtractingRequestHandler equivalent for text-based PDFs
    (solr/modules/extraction/.../ExtractingDocumentLoader.java:51 — Tika
    extract -> one doc per rich file, uniqueKey = resource name): a
    distributed binaryFile scan with per-file extraction in an
    Arrow-batched UDF.  Returns (id=file path, text, n_pages); files the
    pure-Python extractor cannot handle surface their reason in ``err``
    instead of failing the scan (ExtractingDocumentLoader's
    ignoreTikaException behavior)."""
    from typing import Iterator

    import pandas as pd

    from apache___solr_spark.sources.pdf_extract import extract_pdf_pages

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts, npages, errs = [], [], [], []
            for p, payload in zip(pdf["path"], pdf["content"]):
                ids.append(p)
                try:
                    pages = extract_pdf_pages(bytes(payload))
                    texts.append("\f".join(pages))
                    npages.append(len(pages))
                    errs.append(None)
                except (ValueError, NotImplementedError) as e:
                    texts.append(None)
                    npages.append(0)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {"id": ids, "text": texts, "n_pages": npages, "err": errs}
            )

    return raw.mapInPandas(
        parse, schema="id string, text string, n_pages int, err string"
    )
