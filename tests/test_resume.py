"""Resumability: interrupted builds restart from lineage and converge to the
same index (FIXTURES.md §5: restart → identical query results)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bayard_spark.build.indexer import IndexBuilder
from bayard_spark.query import SearchEngine
from bayard_spark.schema import webtext_index_meta
from bayard_spark.sources.webtext import webtext_df


class _Boom(RuntimeError):
    pass


def test_resume_after_midbuild_failure(spark):
    rootA = tempfile.mkdtemp(prefix="resA_")
    rootB = tempfile.mkdtemp(prefix="resB_")
    try:
        meta = webtext_index_meta(num_buckets=4, num_waves=2)
        src = webtext_df(spark, 300, partitions=4)

        # A: uninterrupted build
        IndexBuilder(spark, meta, rootA).build(src)

        # B: kill the build right after wave 0 completes, then resume
        builder = IndexBuilder(spark, meta, rootB)
        original = builder.blockify_wave

        def sabotage(staging, wave, hot_terms):
            if wave == 1:  # wave 0 completed AND its lineage was logged
                builder.blockify_wave = original  # next run is clean
                raise _Boom("simulated driver loss before wave 1")
            return original(staging, wave, hot_terms)

        builder.blockify_wave = sabotage
        with pytest.raises(_Boom):
            builder.build(src)
        # lineage shows partial progress
        assert os.path.exists(os.path.join(rootB, "lineage", "blocks_w0.json"))
        assert not os.path.exists(
            os.path.join(rootB, "lineage", "blocks_w1.json")
        )

        report = builder.build(src)  # resume
        assert "blocks_w0" in report.stages_skipped
        assert "blocks_w1" in report.stages_run
        assert "docs" in report.stages_skipped
        assert "staging" in report.stages_skipped

        # identical query results across the two indexes
        ea, eb = SearchEngine(spark, rootA), SearchEngine(spark, rootB)
        for term in ["the", "water", "father"]:
            q = {"kind": "term", "options": {"field": "text", "term": term}}
            ra = sorted(
                (r["doc_id"], round(r["score"], 10))
                for r in ea.scores(q).collect()
            )
            rb = sorted(
                (r["doc_id"], round(r["score"], 10))
                for r in eb.scores(q).collect()
            )
            assert ra == rb
    finally:
        shutil.rmtree(rootA, ignore_errors=True)
        shutil.rmtree(rootB, ignore_errors=True)


def test_resume_noop_when_complete(spark):
    root = tempfile.mkdtemp(prefix="resC_")
    try:
        meta = webtext_index_meta(num_buckets=4, num_waves=1)
        src = webtext_df(spark, 120, partitions=4)
        b = IndexBuilder(spark, meta, root)
        b.build(src)
        rep = b.build(src)
        assert rep.stages_run == []
        assert set(rep.stages_skipped) >= {"docs", "blocks_w0", "stats"}
    finally:
        shutil.rmtree(root, ignore_errors=True)
