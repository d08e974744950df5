"""Streaming incremental workspace maintenance.

The reference's workspace loop is batch-incremental: scan → classify
New/Changed → re-embed → upsert (src/workspace/store.rs:549-611 plus
src/search/mod.rs:146-216). This module lifts the same maintenance onto a
Structured Streaming file source: new parquet files landing in a
directory become micro-batches, and each micro-batch runs the identical
classify→embed→MERGE dataflow via ``foreachBatch`` — so the stream and
the batch job share one code path (``Workspace.sync``), the property that
makes the semantics testable once and deployable both ways.

Exactly-once story: the streaming checkpoint (source offsets) decides
*which files* a micro-batch sees; the MERGE itself is idempotent on the
natural key (doc, line_no), so replays after failure converge to the
same table — the streaming analog of the reference's deterministic-id
upserts (store.rs:972-975).

``process_available`` uses ``Trigger.AvailableNow`` so tests and backfills
drain everything pending and stop — the recommended pattern for
file-source catch-up processing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from semtools_spark.operators.workspace import Workspace

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("mtime", T.LongType(), True),
    ]
)


def process_available(
    spark: SparkSession,
    source_dir: str,
    workspace: Workspace,
    checkpoint_dir: str,
    schema: T.StructType = DOC_STREAM_SCHEMA,
) -> list[dict]:
    """Drain all pending files from ``source_dir`` into the workspace.

    Each micro-batch calls Workspace.sync (classify → embed New∪Changed →
    MERGE) — no per-row Python beyond the embed pandas UDF. Returns the
    per-batch state counts, in order."""
    results: list[dict] = []

    def _sync_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        counts = workspace.sync(batch_df, id_col="doc_id", mtime_col="mtime")
        results.append({"batch_id": batch_id, **counts})

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_sync_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return results
