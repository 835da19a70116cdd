"""Incremental / streaming operators.

The reference's incremental surface is pull-based:
- topic() (solrj-streaming/.../stream/TopicStream.java:74-110): at-least-once
  pub/sub by ``_version_`` checkpoint persisted in a checkpoint collection.
- daemon() (stream/DaemonStream.java): re-run an inner expression on an
  interval, queueing results.

Structured Streaming subsumes both: a file (or Kafka) source with a
``checkpointLocation`` IS topic() — offsets tracked, at-least-once delivery,
resume across restarts; a Trigger.AvailableNow foreachBatch loop IS daemon().
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def topic_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> DataFrame:
    """topic()-equivalent incremental source: new files under ``path`` are
    delivered exactly once per checkpoint (vs the reference's at-least-once
    `_version_` watermark — Structured Streaming's offset log is strictly
    stronger)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("path", path)
        .load()
    )


def index_topic(
    spark: SparkSession,
    src_path: str,
    schema: str,
    checkpoint_dir: str,
    index_dir: str,
    cfg=None,
    timeout_sec: float | None = 120.0,
):
    """Streaming ingestion into the incremental index: a topic() source over
    ``src_path`` drained through foreachBatch, each micro-batch appended as
    an immutable segment via add_docs (TopicStream -> /update handler
    parity: at-least-once delivery of new pages, segment-per-batch, resume
    across restarts from the checkpoint).  Run optimize() afterwards to
    fold segments and re-baseline stats."""
    from apache___solr_spark.config import DEFAULT_CONFIG
    from apache___solr_spark.index.updates import add_docs

    cfg = cfg or DEFAULT_CONFIG
    stream = topic_stream(spark, src_path, schema, checkpoint_dir)

    def _ingest(df: DataFrame, epoch_id: int) -> None:
        add_docs(spark, index_dir, df, cfg=cfg)

    return daemon_batch(stream, checkpoint_dir, _ingest, timeout_sec)


def daemon_batch(
    stream_df: DataFrame,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    timeout_sec: float | None = 60.0,
):
    """daemon()-equivalent: drain everything currently available through
    ``batch_fn`` (micro-batches), checkpointing progress, then stop.

    Re-invoking later resumes from the checkpoint — the batch analog of the
    reference daemon's interval re-runs.
    """
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
