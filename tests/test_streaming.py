"""Structured Streaming ingestion → segment commits (SURVEY §2.9 analogue)."""

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayard_spark.build.indexer import IndexBuilder
from bayard_spark.build.segments import CommitLog
from bayard_spark.query import SearchEngine
from bayard_spark.schema import webtext_index_meta
from bayard_spark.sources.webtext import synthesize_batch, webtext_df
from bayard_spark.streaming.ingest import StreamingIngestor, start_ingest


@pytest.fixture()
def stream_env(spark):
    root = tempfile.mkdtemp(prefix="stream_idx_")
    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    meta = webtext_index_meta(num_buckets=4, num_waves=1)
    builder = IndexBuilder(spark, meta, root)
    builder.build(webtext_df(spark, 100, partitions=4))
    yield root, src, ckpt, builder
    for d in (root, src, ckpt):
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_ingest_commits_batches(spark, stream_env):
    root, src, ckpt, builder = stream_env
    # two file drops → two micro-batches under availableNow? (file source
    # may batch them together; either way, all docs must land committed)
    pdf1 = synthesize_batch(np.arange(1000, 1020), seed=7)
    pdf2 = synthesize_batch(np.arange(2000, 2010), seed=7)
    spark.createDataFrame(pdf1).write.mode("overwrite").parquet(f"{src}/d1")
    spark.createDataFrame(pdf2).write.mode("overwrite").parquet(f"{src}/d2")

    q = start_ingest(spark, builder, f"{src}/d*", ckpt)
    q.awaitTermination(120)

    log = CommitLog(root)
    assert len(log.committed_segments()) >= 1
    engine = SearchEngine(spark, root)
    n = engine.docs.filter(
        F.col("url").isin(
            [pdf1["url"][0], pdf2["url"][0]]
        )
    ).count()
    assert n == 2


def test_epoch_replay_is_idempotent(spark, stream_env):
    root, src, ckpt, builder = stream_env
    ing = StreamingIngestor(spark, builder)
    batch = spark.createDataFrame(synthesize_batch(np.arange(5000, 5005), seed=3))
    ing(batch, epoch_id=0)
    segs_after_first = CommitLog(root).committed_segments()
    ing(batch, epoch_id=0)  # replay
    assert CommitLog(root).committed_segments() == segs_after_first
    ing(batch.limit(0), epoch_id=1)  # empty batch commits nothing
    assert CommitLog(root).committed_segments() == segs_after_first


class TestStreamingDedup:
    """Cross-batch exact dedup (streaming/dedup.py): first-seen wins,
    replayed epochs are idempotent, state anti-join never eats its own
    epoch."""

    def _env(self):
        dirs = [tempfile.mkdtemp(prefix=f"sdedup_{k}_")
                for k in ("out", "state")]
        return dirs

    def test_batchwise_semantics_and_replay(self, spark):
        from bayard_spark.streaming.dedup import StreamingDeduper

        out, state = self._env()
        try:
            d = StreamingDeduper(spark, out, state)
            b0 = spark.createDataFrame(
                [(5, "alpha"), (3, "alpha"), (7, "beta")],
                "doc_id long, text string",
            )
            b1 = spark.createDataFrame(
                [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, None)],
                "doc_id long, text string",
            )
            d(b0, 0)
            d(b1, 1)
            got = {
                r["doc_id"]
                for r in spark.read.parquet(out).collect()
            }
            # within-batch min id (3 beats 5), cross-batch dup dropped
            # (10 loses to epoch 0's alpha), NULL text hashes like ""
            assert got == {3, 7, 11, 13}
            # replay epoch 1 (crash-after-state-write scenario): its own
            # epoch-1 state must NOT anti-join it into emptiness, and
            # overwrite mode must not duplicate rows
            d(b1, 1)
            got2 = spark.read.parquet(out).collect()
            assert {r["doc_id"] for r in got2} == {3, 7, 11, 13}
            assert len(got2) == 4
        finally:
            for p in (out, state):
                shutil.rmtree(p, ignore_errors=True)

    def test_end_to_end_stream(self, spark):
        from bayard_spark.streaming.dedup import start_streaming_dedup

        src = tempfile.mkdtemp(prefix="sdedup_src_")
        out, state = self._env()
        ckpt = tempfile.mkdtemp(prefix="sdedup_ckpt_")
        try:
            rows = [
                [(0, "x"), (1, "y")],
                [(2, "x"), (3, "z")],
                [(4, "z"), (5, "w"), (6, "w")],
            ]
            for i, batch in enumerate(rows):
                tmp = tempfile.mkdtemp(prefix="sdedup_tmp_")
                spark.createDataFrame(
                    batch, "doc_id long, text string"
                ).coalesce(1).write.mode("overwrite").parquet(tmp)
                pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
                dst = os.path.join(src, f"b{i}.parquet")
                shutil.copy(os.path.join(tmp, pf), dst)
                os.utime(dst, times=(1_700_000_000 + i, 1_700_000_000 + i))
                shutil.rmtree(tmp, ignore_errors=True)
            schema = "doc_id long, text string"
            q = start_streaming_dedup(
                spark, src, schema, out, state, ckpt
            )
            q.awaitTermination(300)
            got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
            assert got == {0, 1, 3, 5}
        finally:
            for p in (src, out, state, ckpt):
                shutil.rmtree(p, ignore_errors=True)
