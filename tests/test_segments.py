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


class TestTombstoneCount:
    def test_footer_count_matches_and_overcounts_dups(self, spark, index_root):
        """count_tombstone_rows is metadata-only (parquet footers): equal
        to the distinct tombstone count normally, and an OVER-count when
        the same doc is tombstoned in two commits — the safe direction
        for the broadcast gate."""
        from bayard_spark.build.segments import (
            count_tombstone_rows,
            load_tombstones,
        )
        from bayard_spark.query.engine import IndexPaths

        root, builder = index_root
        w = SegmentWriter(spark, builder)
        w.put_documents(
            new_batch(spark, [("https://tsc.example/1", "alpha beta"),
                              ("https://tsc.example/2", "gamma delta")])
        )
        w.commit()
        paths = IndexPaths(root)
        assert count_tombstone_rows(paths) in (0, None) or \
            count_tombstone_rows(paths) == 0

        w2 = SegmentWriter(spark, builder)
        w2.delete_documents(["https://tsc.example/1", "https://tsc.example/2"])
        w2.commit()
        distinct = load_tombstones(spark, paths).count()
        footer = count_tombstone_rows(paths)
        assert footer == distinct == 2

        # deleting an already-deleted url matches no LIVE docs
        # (_existing_docs is commit-log aware), so the new tombstone file
        # is empty and the footer count stays exact
        w3 = SegmentWriter(spark, builder)
        w3.delete_documents(["https://tsc.example/1"])
        w3.commit()
        assert load_tombstones(spark, paths).count() == 2
        assert count_tombstone_rows(paths) == 2

        e = SearchEngine(spark, root)
        assert e._n_tombstones == 2
        assert e.scores(term_q("alpha")).count() == 0
