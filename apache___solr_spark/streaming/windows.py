"""Event-time windowed aggregation with late-data watermarks.

The reference has NO event-time windows or late-data semantics — its
nearest primitives are timeseries() gap buckets
(solrj-streaming/.../stream/TimeSeriesStream.java:59, a batch
reaggregation) and `_version_` ordering in the update log
(update/UpdateLog.java:105).  SURVEY §2.10 inventoried this as the one
streaming capability a web-scale ingest pipeline needs that the reference
cannot express; Structured Streaming gives it natively, so these wrappers
complete the streaming surface the Spark-first way:

- :func:`windowed_agg` — tumbling/sliding event-time windows over a
  stream, with a watermark bounding state and dropping late rows
  (``withWatermark`` + ``window()``; state is purged once the watermark
  passes a window's end, so unbounded streams run in bounded memory).
- :func:`sessionized_agg` — dynamic-gap session windows
  (``session_window``), the sessionization stage of clickstream/event
  training data.

Both return streaming DataFrames to compose with
streaming.topic.daemon_batch (availableNow drain + checkpoint resume).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    stream_df: DataFrame,
    ts_col: str,
    window: str,
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) event-time windows.

    Late rows older than ``watermark`` behind the max observed event time
    are DROPPED (the late-data contract the reference lacks); windows emit
    in append mode once the watermark passes their end, which also purges
    their state — the 100 TB/day property.
    """
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    keys = keys or []
    wm = stream_df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    out = wm.groupBy(win.alias("win"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def sessionized_agg(
    stream_df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    watermark: str = "10 minutes",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows: a session extends while events arrive within
    ``gap`` of the previous one (``session_window`` dynamic windows),
    keyed by ``keys`` (e.g. user_id) — bounded state via the watermark."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    wm = stream_df.withWatermark(ts_col, watermark)
    out = wm.groupBy(
        F.session_window(F.col(ts_col), gap).alias("win"),
        *[F.col(k) for k in keys],
    ).agg(*aggs)
    return out.select(
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        *[c for c in out.columns if c != "win"],
    )
