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


def test_streaming_incremental_index_equals_batch_build(spark, tmp_path):
    """Two streamed micro-batches indexed via index_topic (readStream ->
    foreachBatch -> add_docs segments) followed by optimize() must score
    identically (per url) to ONE batch build over the union corpus — the
    streaming extension of the add_docs equivalence (TopicStream ->
    /update parity, solrj-streaming/.../stream/TopicStream.java:74-110)."""
    import pyarrow as pa
    import pyarrow.parquet as paq

    from apache___solr_spark.config import IndexConfig
    from apache___solr_spark.corpus import generate_pages
    from apache___solr_spark.index.builder import build_index
    from apache___solr_spark.index.updates import optimize
    from apache___solr_spark.query.engine import SearchEngine
    from apache___solr_spark.streaming import index_topic

    cfg = IndexConfig(block_range=32, salt_range=128, n_buckets=8)
    base_tbl = generate_pages(120, seed=42)
    base_path = str(tmp_path / "base.parquet")
    paq.write_table(base_tbl, base_path)
    idx = str(tmp_path / "idx")
    build_index(spark, base_path, idx, cfg=cfg)

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    src = str(tmp_path / "topic_src")
    os.makedirs(src)
    ckpt = str(tmp_path / "topic_ckpt")

    def _batch(tag: str, texts: list[str]) -> list[dict]:
        return [
            {"url": f"zzs-{tag}-{i}", "warc_ts": None, "html": None,
             "text": t, "lang": "en"}
            for i, t in enumerate(texts)
        ]

    b1 = _batch("a", ["web data streamed page", "qqstreamuniq web merge"])
    b2 = _batch("b", ["data qqstreamuniq", "web web data page site"])
    paq.write_table(
        pa.Table.from_pylist(b1, schema=base_tbl.schema), src + "/b1.parquet"
    )
    index_topic(spark, src, schema, ckpt, idx, cfg=cfg)
    paq.write_table(
        pa.Table.from_pylist(b2, schema=base_tbl.schema), src + "/b2.parquet"
    )
    index_topic(spark, src, schema, ckpt, idx, cfg=cfg)  # delivers ONLY b2
    optimize(spark, idx, cfg=cfg)

    union_rows = base_tbl.to_pylist() + b1 + b2
    fresh_pages = str(tmp_path / "fresh.parquet")
    paq.write_table(
        pa.Table.from_pylist(union_rows, schema=base_tbl.schema), fresh_pages
    )
    fresh_idx = str(tmp_path / "fresh_idx")
    build_index(spark, fresh_pages, fresh_idx, cfg=cfg)

    stream_eng = SearchEngine(spark, idx, cfg=cfg)
    fresh_eng = SearchEngine(spark, fresh_idx, cfg=cfg)
    for q in ("web", "qqstreamuniq", "web AND data", '"web data"'):
        a = {
            (r["url"], round(r["score"], 5))
            for r in stream_eng.search(q, k=200, prune=False).collect()
        }
        b = {
            (r["url"], round(r["score"], 5))
            for r in fresh_eng.search(q, k=200, prune=False).collect()
        }
        assert a == b, q
