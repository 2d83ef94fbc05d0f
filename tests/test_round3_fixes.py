"""Round-3 fixes (VERDICT r2 'What's wrong' + 'Next round' items 4/5/9).

- fuzzy/regex expansion is capped by max_expansions: a pathological
  pattern ('.*') errors fast instead of collecting the term dictionary
  to the driver — on BOTH the preloaded-dict branch and the distributed
  branch.
- the preload branch routes to the distributed expansion above
  PRELOAD_EXPAND_MAX dictionary entries, with identical results.
- SegmentWriter persists next_doc_id in the commit log (no O(#segments)
  max jobs per put) and assigns ids bucket-offset style (multi-partition)
  for large batches.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bayard_spark.build.indexer import IndexBuilder
from bayard_spark.build.segments import CommitLog, SegmentWriter, visible_docs
from bayard_spark.query import SearchEngine
from bayard_spark.schema import webtext_index_meta
from bayard_spark.sources.webtext import webtext_df


def _regex_q(pat):
    return {"kind": "regex", "options": {"field": "text", "regex": pat}}


def _fuzzy_q(term, distance):
    return {
        "kind": "fuzzy_term",
        "options": {"field": "text", "term": term, "distance": distance},
    }


class TestExpansionGuards:
    def test_regex_cap_preloaded(self, spark, built, tmp_index_root):
        eng = SearchEngine(spark, tmp_index_root, max_expansions=5)
        with pytest.raises(ValueError, match="max_expansions"):
            eng.scores(_regex_q(".*")).count()

    def test_regex_cap_distributed(self, spark, built, tmp_index_root):
        eng = SearchEngine(
            spark, tmp_index_root, preload_dictionary=False, max_expansions=5
        )
        with pytest.raises(ValueError, match="max_expansions"):
            eng.scores(_regex_q(".*")).count()

    def test_fuzzy_cap_both_branches(self, spark, built, tmp_index_root):
        for preload in (True, False):
            eng = SearchEngine(
                spark,
                tmp_index_root,
                preload_dictionary=preload,
                max_expansions=2,
            )
            with pytest.raises(ValueError, match="max_expansions"):
                # distance 3 around a short common stem matches >2 terms
                eng.scores(_fuzzy_q("data", 3)).count()

    def test_preload_routing_matches_preload_results(
        self, spark, built, tmp_index_root
    ):
        # force the big-dictionary route on a preloaded engine: results
        # must be identical to the driver-side expansion
        base, _ = built
        routed = SearchEngine(spark, tmp_index_root)
        routed.PRELOAD_EXPAND_MAX = 0  # instance override → distributed path
        for q in (_regex_q("jo[a-z]*"), _fuzzy_q("query", 1)):
            want = {
                (r["doc_id"], round(r["score"], 9))
                for r in base.scores(q).collect()
            }
            got = {
                (r["doc_id"], round(r["score"], 9))
                for r in routed.scores(q).collect()
            }
            assert got == want


class TestIncrementalPutScale:
    @pytest.fixture()
    def index_root(self, spark):
        root = tempfile.mkdtemp(prefix="seg_idx_r3_")
        meta = webtext_index_meta(num_buckets=4, num_waves=1)
        builder = IndexBuilder(spark, meta, root)
        builder.build(webtext_df(spark, 200, partitions=4))
        yield root, builder
        shutil.rmtree(root, ignore_errors=True)

    @staticmethod
    def _batch(spark, n, prefix="https://bulk.example/"):
        rows = [
            (f"{prefix}{i:05d}", "2025-06-01 00:00:00",
             f"bulkput doc number {i} alpha beta", "en")
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "url string, warc_ts string, text string, lang string"
        ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    def test_large_put_bucket_offset_ids(self, spark, index_root):
        root, builder = index_root
        w = SegmentWriter(spark, builder, bulk_id_threshold=10)
        w.put_documents(self._batch(spark, 50))
        w.commit()

        log = CommitLog(root)
        state = log.read()
        assert state["next_doc_id"] == 250  # 200 base + 50 put

        seg = state["segments"][-1]
        seg_docs = spark.read.parquet(log.io.path("segments", seg, "docs"))
        rows = seg_docs.select(
            "doc_id", "url",
            F.pmod(F.xxhash64("url"), F.lit(4)).cast("int").alias("b"),
        ).collect()
        ids = sorted(r["doc_id"] for r in rows)
        assert ids == list(range(200, 250))  # dense, after the high-water
        # ids were assigned per-BUCKET (multi-partition path), not by one
        # global url window: ordering by doc_id must equal ordering by
        # (bucket, url), which differs from plain url order here
        by_id = sorted(rows, key=lambda r: r["doc_id"])
        assert [(r["b"], r["url"]) for r in by_id] == sorted(
            (r["b"], r["url"]) for r in rows
        )
        assert len({r["b"] for r in rows}) > 1

    def test_next_doc_id_survives_new_writer(self, spark, index_root):
        root, builder = index_root
        w1 = SegmentWriter(spark, builder, bulk_id_threshold=10)
        w1.put_documents(self._batch(spark, 15))
        w1.commit()
        # fresh writer: must start at the persisted high-water mark (no
        # segment scan needed) and never reuse ids
        w2 = SegmentWriter(spark, builder, bulk_id_threshold=10)
        w2.put_documents(self._batch(spark, 3, prefix="https://w2.example/"))
        w2.commit()
        assert CommitLog(root).read()["next_doc_id"] == 218
        docs = visible_docs(spark, builder.paths)
        n = docs.count()
        assert docs.select("doc_id").distinct().count() == n
