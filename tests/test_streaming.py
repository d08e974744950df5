"""Streaming incremental workspace: file-source micro-batches drive the
same classify→embed→MERGE path as batch sync; offsets checkpoint so a
second drain ingests only new files; replay converges (idempotent MERGE)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from semtools_spark.operators.workspace import Workspace
from semtools_spark.streaming.incremental import process_available


def _write_docs(spark, path, rows, mode="append"):
    df = spark.createDataFrame(rows, "doc_id long, text string, mtime long")
    df.coalesce(1).write.mode(mode).parquet(path)


def test_streaming_incremental_sync(spark, tmp_path):
    src = str(tmp_path / "docs_stream")
    ckpt = str(tmp_path / "ckpt")
    ws = Workspace(spark, str(tmp_path / "ws"), dim=16)

    _write_docs(spark, src, [(1, "alpha beta gamma", 10), (2, "delta epsilon", 10)])
    r1 = process_available(spark, src, ws, ckpt)
    assert sum(b.get("new", 0) for b in r1) == 2
    assert ws.stats()["total_documents"] == 2
    n_lines_1 = ws.stats()["total_lines"]

    # second drop: one brand-new doc + one changed doc (text grew)
    _write_docs(spark, src, [(3, "zeta eta", 20), (2, "delta epsilon theta", 20)])
    r2 = process_available(spark, src, ws, ckpt)
    assert sum(b.get("new", 0) for b in r2) == 1
    assert sum(b.get("changed", 0) for b in r2) == 1
    assert ws.stats()["total_documents"] == 3
    assert ws.stats()["total_lines"] >= n_lines_1 + 1

    # doc 2's embeddings were REPLACED, not duplicated (idempotent MERGE)
    lines2 = ws.lines().filter(F.col("doc") == 2)
    assert lines2.count() == 1
    assert lines2.first().line == "delta epsilon theta"

    # draining again with no new files is a no-op (offsets checkpointed)
    r3 = process_available(spark, src, ws, ckpt)
    assert not r3
    assert ws.stats()["total_documents"] == 3

    # sanity: search still works over the streamed-in store
    hit = ws.search("delta epsilon theta", top_k=1).first()
    assert hit.doc == 2
    assert os.path.isdir(ckpt)


def test_windowed_event_stats_stream_matches_batch(spark, tmp_path):
    """Watermarked tumbling-window aggregation over a streamed event drop
    equals the same expressions run as a batch query — one aggregation
    shape, two execution modes."""
    from pyspark.sql import types as T

    from semtools_spark.streaming.windows import (
        run_windowed_stats_available,
        windowed_event_stats,
    )

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
        ]
    )
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=m), etype, float(m) / 7 + 0.5)
        for m in range(0, 150, 5)
        for etype in ("click", "view")
    ]
    src = str(tmp_path / "events_stream")
    df = spark.createDataFrame(rows, schema)
    df.coalesce(2).write.mode("append").parquet(src)

    got = run_windowed_stats_available(
        spark, src, str(tmp_path / "ckpt"), schema, query_name="wes_test"
    )
    want = windowed_event_stats(spark.read.schema(schema).parquet(src))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) == 6  # 3 hourly windows x 2 event types
