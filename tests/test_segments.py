"""Segment lifecycle: put/delete/commit/rollback/merge (SURVEY §2.1)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bayard_spark.build.indexer import IndexBuilder
from bayard_spark.build.segments import (
    CommitLog,
    SegmentWriter,
    merge_segments,
    visible_docs,
)
from bayard_spark.query import SearchEngine
from bayard_spark.schema import webtext_index_meta
from bayard_spark.sources.webtext import webtext_df


def term_q(t):
    return {"kind": "term", "options": {"field": "text", "term": t}}


@pytest.fixture()
def index_root(spark):
    root = tempfile.mkdtemp(prefix="seg_idx_")
    meta = webtext_index_meta(num_buckets=4, num_waves=1)
    builder = IndexBuilder(spark, meta, root)
    builder.build(webtext_df(spark, 200, partitions=4))
    yield root, builder
    shutil.rmtree(root, ignore_errors=True)


def new_batch(spark, urls_texts):
    return spark.createDataFrame(
        [(u, "2025-06-01 00:00:00", t, "en") for u, t in urls_texts],
        "url string, warc_ts string, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))


class TestSegments:
    def test_put_invisible_until_commit_then_visible(self, spark, index_root):
        root, builder = index_root
        w = SegmentWriter(spark, builder)
        w.put_documents(
            new_batch(spark, [("https://new.example/1", "zzzunique token here")])
        )
        e1 = SearchEngine(spark, root)
        assert e1.scores(term_q("zzzunique")).count() == 0  # staged only
        w.commit()
        e2 = SearchEngine(spark, root)
        assert e2.scores(term_q("zzzunique")).count() == 1

    def test_upsert_replaces_old_version(self, spark, index_root):
        root, builder = index_root
        w = SegmentWriter(spark, builder)
        w.put_documents(
            new_batch(spark, [("https://u.example/x", "firstversion words")])
        )
        w.commit()
        w2 = SegmentWriter(spark, builder)
        w2.put_documents(
            new_batch(spark, [("https://u.example/x", "secondversion words")])
        )
        w2.commit()
        e = SearchEngine(spark, root)
        assert e.scores(term_q("firstversion")).count() == 0
        assert e.scores(term_q("secondversion")).count() == 1
        urls = [
            r["url"]
            for r in visible_docs(spark, e.paths)
            .filter(F.col("url") == "https://u.example/x")
            .collect()
        ]
        assert len(urls) == 1

    def test_delete_documents(self, spark, index_root):
        root, builder = index_root
        w = SegmentWriter(spark, builder)
        w.put_documents(
            new_batch(spark, [("https://del.example/1", "doomedterm here")])
        )
        w.commit()
        w2 = SegmentWriter(spark, builder)
        w2.delete_documents(["https://del.example/1"])
        w2.commit()
        e = SearchEngine(spark, root)
        assert e.scores(term_q("doomedterm")).count() == 0

    def test_rollback_discards_staged(self, spark, index_root):
        root, builder = index_root
        w = SegmentWriter(spark, builder)
        w.put_documents(
            new_batch(spark, [("https://rb.example/1", "rollbackterm")])
        )
        w.rollback()
        w.commit()  # commits nothing
        e = SearchEngine(spark, root)
        assert e.scores(term_q("rollbackterm")).count() == 0
        assert CommitLog(root).committed_segments() == []

    def test_merge_compacts_and_applies_tombstones(self, spark, index_root):
        root, builder = index_root
        w = SegmentWriter(spark, builder)
        w.put_documents(
            new_batch(spark, [("https://m.example/1", "mergeterm alpha")])
        )
        w.commit()
        w2 = SegmentWriter(spark, builder)
        w2.put_documents(
            new_batch(spark, [("https://m.example/1", "mergeterm beta")])
        )
        w2.commit()
        e_before = SearchEngine(spark, root)
        n_before = e_before.scores(term_q("mergeterm")).count()
        assert n_before == 1

        merge_segments(spark, builder)
        assert CommitLog(root).committed_segments() == []
        e = SearchEngine(spark, root)
        assert e.tombstones is None
        assert e.scores(term_q("mergeterm")).count() == 1
        assert e.scores(term_q("alpha")).count() == 0
        assert e.scores(term_q("beta")).count() == 1
        # base corpus still fully searchable after merge
        assert e.scores(term_q("the")).count() > 0
