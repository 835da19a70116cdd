"""Structured-Streaming analogs of topic()/daemon(): incremental delivery
with checkpointed resume."""

from __future__ import annotations

import os

from apache___solr_spark.streaming import daemon_batch, topic_stream


def _write_batch(spark, path, start, n):
    spark.range(start, start + n).toDF("id").write.mode("append").parquet(path)


def test_topic_checkpoint_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink: list[int] = []

    def collect_batch(df, epoch_id):
        sink.extend(r["id"] for r in df.collect())

    _write_batch(spark, src, 0, 5)
    stream = topic_stream(spark, src, "id long", ckpt)
    daemon_batch(stream, ckpt, collect_batch)
    assert sorted(sink) == list(range(5))

    # new data arrives; a second daemon run delivers ONLY the delta
    sink.clear()
    _write_batch(spark, src, 100, 3)
    stream = topic_stream(spark, src, "id long", ckpt)
    daemon_batch(stream, ckpt, collect_batch)
    assert sorted(sink) == [100, 101, 102]
    assert os.path.exists(os.path.join(ckpt, "offsets"))
