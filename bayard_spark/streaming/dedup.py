"""Streaming cross-batch exact dedup — the online twin of
functions/dedup.dedupe_exact for continuously arriving corpora.

A crawl never stops; dedup can't either. This stage drains a
`readStream` source through `foreachBatch` and emits, per micro-batch,
only the rows whose content hash has never been seen in ANY earlier
batch (nor earlier — by smaller id — within the same batch). The "seen"
state is NOT the Spark state store: at web scale the hash set is
billions of rows, so it lives as an ordinary epoch-partitioned parquet
table that joins distributedly, compacts like any other table, and
survives checkpoint loss.

Replay safety (foreachBatch can re-run an epoch after a crash): every
write this sink makes is routed to an epoch=<id> subdirectory in
overwrite mode, so a replayed epoch overwrites its own partial output
instead of appending duplicates — and the anti-join reads only state
from epochs STRICTLY BEFORE the current one, so an epoch that half-wrote
its own hashes before dying cannot anti-join itself into emptiness on
replay.

Winner rule (deterministic): within a batch the smallest `id_col` per
hash survives; across batches the earliest epoch wins. With a source
whose files arrive in id order this reduces to global min-id per hash —
which is what the driver gate's DuckDB twin replays.

Scale shape per batch: one window over the batch's own hashes (batch-
sized, not corpus-sized), one anti-join against the seen table (shuffle
join on an md5-uniform key — no skew), two partition-local writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class StreamingDeduper:
    """foreachBatch sink: emit first-seen rows per content hash.

    out_dir   — deduped rows land here, partitioned by epoch
    state_dir — seen (hash) rows, partitioned by epoch
    """

    def __init__(
        self,
        spark,
        out_dir: str,
        state_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.state_dir = state_dir
        self.text_col = text_col
        self.id_col = id_col

    def _epoch_path(self, root: str, epoch_id: int) -> str:
        return os.path.join(root, f"epoch={int(epoch_id)}")

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        epoch_id = int(epoch_id)
        b = batch_df.withColumn(
            "_h", F.md5(F.coalesce(F.col(self.text_col), F.lit("")))
        )
        # within-batch winner: smallest id per hash (deterministic)
        w = Window.partitionBy("_h").orderBy(F.col(self.id_col).asc())
        b = (
            b.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # cross-batch: drop hashes seen in any STRICTLY EARLIER epoch
        # (never the current one — a replayed epoch must not anti-join
        # against its own half-written state)
        prior = [
            p
            for p in self._state_epochs()
            if p < epoch_id
        ]
        if prior:
            seen = self.spark.read.parquet(
                *[self._epoch_path(self.state_dir, p) for p in prior]
            )
            b = b.join(F.broadcast(seen) if self._small(seen) else seen,
                       "_h", "left_anti")
        b.persist()
        try:
            b.drop("_h").write.mode("overwrite").parquet(
                self._epoch_path(self.out_dir, epoch_id)
            )
            b.select("_h").write.mode("overwrite").parquet(
                self._epoch_path(self.state_dir, epoch_id)
            )
        finally:
            b.unpersist()

    def _state_epochs(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        out = []
        for name in os.listdir(self.state_dir):
            if name.startswith("epoch="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    # broadcast only a plausibly driver-sized seen set; a web-scale
    # state table must shuffle-join (same discipline as the tombstone
    # anti-join gate in build/segments.py)
    SEEN_BROADCAST_MAX_FILES = 64

    def _small(self, seen: DataFrame) -> bool:
        return len(seen.inputFiles()) <= self.SEEN_BROADCAST_MAX_FILES


def start_streaming_dedup(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """Wire source → StreamingDeduper. Returns the StreamingQuery."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = stream.writeStream.foreachBatch(
        StreamingDeduper(spark, out_dir, state_dir, text_col, id_col)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
