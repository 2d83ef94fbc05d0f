"""Structured Streaming ingestion into the index.

The reference has NO streaming operators (SURVEY §2.9): its nearest analogue
is the buffered-writer + explicit-commit NRT cycle (node.rs:1243-1261).
This module is the Spark-native upgrade of that cycle: a `readStream`
source drains through `foreachBatch` into the same SegmentWriter upsert
path, committing once per micro-batch — each micro-batch IS a reference
"commit", so searchers see batch boundaries atomically.

Exactly-once: foreachBatch can replay a batch after failure. put_documents
stages a NEW segment per call, so a replayed batch would double-stage;
the epoch ledger (processed_epochs.json) makes the sink idempotent —
a replayed epoch_id is skipped before any staging happens.

Usage:
    ingestor = StreamingIngestor(spark, builder)
    q = (spark.readStream.schema(...).parquet(src_dir)
         .writeStream.foreachBatch(ingestor)
         .trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


class StreamingIngestor:
    """foreachBatch sink: upsert + commit per micro-batch, idempotent."""

    def __init__(self, spark, builder):
        from bayard_spark.build.segments import SegmentWriter

        self.spark = spark
        self.builder = builder
        self.writer = SegmentWriter(spark, builder)
        self._ledger = os.path.join(
            builder.paths.root, "processed_epochs.json"
        )

    def _processed(self) -> set[int]:
        if not os.path.exists(self._ledger):
            return set()
        with open(self._ledger) as f:
            return set(json.load(f))

    def _mark(self, epoch_id: int) -> None:
        done = self._processed()
        done.add(int(epoch_id))
        tmp = self._ledger + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(done), f)
        os.replace(tmp, self._ledger)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if int(epoch_id) in self._processed():
            return  # replayed epoch → already committed, skip (idempotent)
        if batch_df.isEmpty():
            self._mark(epoch_id)
            return
        self.writer.put_documents(batch_df)
        self.writer.commit()
        self._mark(epoch_id)


def start_ingest(
    spark,
    builder,
    source_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ),
    available_now: bool = True,
):
    """File-source streaming ingestion; availableNow drains-and-stops (use
    False for a continuous micro-batch query)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        stream.writeStream.foreachBatch(StreamingIngestor(spark, builder))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
