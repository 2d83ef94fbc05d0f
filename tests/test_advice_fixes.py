"""Regression tests for the round-1 ADVICE findings.

1. total_hits must be computed from an UNPRUNED plan (block-max pruning made
   count_and_top_docs report 1152 for 1600 matches).
2. Block-max pruning must be disabled once tombstones exist (build-time τ is
   unsound over deleted docs — silently wrong top-k after delete+commit).
3. Arrow fast path must refuse [stop_word, lower_case] chains (it always
   lowercases first; the pandas path honors configured order).
4. Phrase queries on record='freq'/'basic' fields raise a clear error
   (the reference rejects them; previously an executor TypeError).
5. Response shape per docs/rest_api/search_api.md: score=0 under field sort,
   sort_value=0 under score sort, integer unix timestamp.
6. fuzzy/regex expansion is a distributed job — results identical with the
   driver dictionary preload disabled.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bayard_spark.build.indexer import IndexBuilder
from bayard_spark.build.segments import SegmentWriter
from bayard_spark.query import SearchEngine
from bayard_spark.schema import webtext_index_meta

N = 1600  # > 8 * block_size(128) so the pruning gate opens for 'common'


@pytest.fixture(scope="module")
def pruned_idx(spark):
    """1600 docs, every one containing 'common' (df=1600 > 1024 gate), with a
    planted score gradient: doc i repeats 'common' (i % 5 + 1) times inside
    filler, so high-tf docs are scattered across blocks."""
    root = tempfile.mkdtemp(prefix="prune_idx_")
    rows = []
    for i in range(N):
        reps = " ".join(["common"] * (i % 5 + 1))
        filler = " ".join(f"w{j}" for j in range((i * 7) % 11 + 3))
        rows.append((f"https://p.example/{i:05d}", f"2024-01-01 00:{i % 60:02d}:00",
                     f"{filler} {reps}", "en"))
    src = spark.createDataFrame(
        rows, "url string, warc_ts string, text string, lang string"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    meta = webtext_index_meta(num_buckets=4, num_waves=1)
    builder = IndexBuilder(spark, meta, root)
    builder.build(src, resume=False)
    yield spark, root, builder
    shutil.rmtree(root, ignore_errors=True)


class TestPrunedCount:
    def test_total_hits_counts_all_matches(self, pruned_idx):
        spark, root, _ = pruned_idx
        engine = SearchEngine(spark, root)
        resp = engine.search({
            "query": {"kind": "term",
                      "options": {"field": "text", "term": "common"}},
            "collection_kind": "count_and_top_docs",
            "hits": 10,
        })
        assert resp.total_hits == N
        assert len(resp.documents) == 10

    def test_count_only_unpruned(self, pruned_idx):
        spark, root, _ = pruned_idx
        engine = SearchEngine(spark, root)
        resp = engine.search({
            "query": {"kind": "term",
                      "options": {"field": "text", "term": "common"}},
            "collection_kind": "count",
        })
        assert resp.total_hits == N
        assert resp.documents == []


class TestTombstonePruning:
    def test_topk_correct_after_delete_above_pruning_gate(self, pruned_idx):
        spark, root, builder = pruned_idx
        # ground truth BEFORE deletes, unpruned: full ranking of 'common'
        engine0 = SearchEngine(spark, root)
        q = {"kind": "term", "options": {"field": "text", "term": "common"}}
        full = sorted(
            [(r["doc_id"], r["score"]) for r in engine0.scores(q).collect()],
            key=lambda kv: (-kv[1], kv[0]),
        )
        # delete the current top-20 docs by url, commit
        doomed_ids = {d for d, _ in full[:20]}
        urls = [
            r["url"]
            for r in engine0.docs.filter(
                F.col("doc_id").isin(sorted(doomed_ids))
            ).collect()
        ]
        writer = SegmentWriter(spark, builder)
        writer.delete_documents(urls)
        writer.commit()

        engine = SearchEngine(spark, root)
        assert engine.tombstones is not None
        resp = engine.search({
            "query": q, "collection_kind": "count_and_top_docs", "hits": 10,
        })
        expected_survivors = [d for d, _ in full if d not in doomed_ids][:10]
        got_urls = [d["id"] for d in resp.documents]
        url_of = {
            r["doc_id"]: r["url"]
            for r in engine0.docs.filter(
                F.col("doc_id").isin(expected_survivors)
            ).collect()
        }
        assert got_urls == [url_of[d] for d in expected_survivors]
        assert resp.total_hits == N - 20


class TestArrowFilterOrder:
    def test_stop_word_before_lower_case_falls_back(self):
        from bayard_spark.analysis import arrow_native
        from bayard_spark.analysis.analyzer import build_analyzer

        ok = build_analyzer("ok", {
            "tokenizer": {"name": "simple"},
            "filters": [{"name": "lower_case"},
                        {"name": "stop_word", "args": {"words": ["the"]}}],
        })
        bad = build_analyzer("bad", {
            "tokenizer": {"name": "simple"},
            "filters": [{"name": "stop_word", "args": {"words": ["the"]}},
                        {"name": "lower_case"}],
        })
        assert arrow_native.supports(ok)
        assert not arrow_native.supports(bad)


class TestPhraseRecordValidation:
    def test_phrase_on_freq_field_raises(self, pruned_idx):
        spark, root, _ = pruned_idx
        engine = SearchEngine(spark, root)
        # 'lang' is indexed raw/basic in the webtext meta
        with pytest.raises(ValueError, match="positions"):
            engine.scores({
                "kind": "phrase",
                "options": {"field": "lang", "phrase_terms": ["en", "de"]},
            })


class TestResponseShape:
    def test_field_sort_zeroes_score_and_int_timestamp(self, pruned_idx):
        spark, root, _ = pruned_idx
        engine = SearchEngine(spark, root)
        resp = engine.search({
            "query": {"kind": "all"},
            "sort": {"field": "warc_ts", "order": "asc"},
            "hits": 3,
        })
        for d in resp.documents:
            assert d["score"] == 0.0
            assert isinstance(d["timestamp"], int)
            assert d["sort_value"] is not None

    def test_score_sort_zeroes_sort_value(self, pruned_idx):
        spark, root, _ = pruned_idx
        engine = SearchEngine(spark, root)
        resp = engine.search({
            "query": {"kind": "term",
                      "options": {"field": "text", "term": "common"}},
            "hits": 3,
        })
        for d in resp.documents:
            assert d["sort_value"] == 0
            assert d["score"] > 0.0
            assert isinstance(d["timestamp"], int)


class TestDistributedExpansion:
    def test_fuzzy_regex_without_dictionary_preload(self, pruned_idx):
        spark, root, _ = pruned_idx
        warm = SearchEngine(spark, root, preload_dictionary=True)
        cold = SearchEngine(spark, root, preload_dictionary=False)
        assert warm._dict_complete and not cold._dict_complete
        for q in [
            {"kind": "fuzzy_term",
             "options": {"field": "text", "term": "commn", "distance": 1}},
            {"kind": "fuzzy_term",
             "options": {"field": "text", "term": "ocmmon", "distance": 1,
                         "transposition_cost_one": True}},
            {"kind": "fuzzy_term",
             "options": {"field": "text", "term": "comm", "distance": 0,
                         "prefix": True}},
            {"kind": "regex", "options": {"field": "text", "regex": "w[0-9]+"}},
        ]:
            a = {r["doc_id"]: r["score"] for r in warm.scores(q).collect()}
            b = {r["doc_id"]: r["score"] for r in cold.scores(q).collect()}
            assert set(a) == set(b), q
            for d in a:
                assert a[d] == pytest.approx(b[d], rel=1e-12), q
