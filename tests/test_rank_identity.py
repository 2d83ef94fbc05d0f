"""Rank-identity gate: Spark engine vs pure-Python oracle (SURVEY §5).

Builds a real index (build pipeline → parquet) over deterministic synthetic
webtext, then runs the reference query-shape set (BASELINE.md: term, phrase,
boolean must/should/must_not, range, query_string, all, boost, fuzzy_term,
regex — mirroring /root/reference/examples/*_query.json) on BOTH engines and
asserts identical top-k doc ids AND BM25 scores (rel tol 1e-9; k1=1.2,
b=0.75; ties broken by doc_id asc).
"""

import math

import numpy as np
import pytest

from bayard_spark.build.indexer import IndexBuilder
from bayard_spark.oracle import OracleIndex
from bayard_spark.query import SearchEngine
from bayard_spark.schema import webtext_index_meta
from bayard_spark.sources.webtext import synthesize_batch, webtext_df

N_DOCS = 600
K = 10

QUERIES = [
    ("term", {"kind": "term", "options": {"field": "text", "term": "the"}}),
    ("term_rare", {"kind": "term", "options": {"field": "text", "term": "father"}}),
    ("term_missing", {"kind": "term", "options": {"field": "text", "term": "zzzz"}}),
    (
        "phrase",
        {"kind": "phrase",
         "options": {"field": "text", "phrase_terms": ["of", "the"], "slop": 0}},
    ),
    (
        "phrase_slop",
        {"kind": "phrase",
         "options": {"field": "text", "phrase_terms": ["the", "and"], "slop": 2}},
    ),
    (
        "bool_must",
        {"kind": "boolean", "options": {"subqueries": [
            {"occurrence": "must",
             "query": {"kind": "term", "options": {"field": "text", "term": "water"}}},
            {"occurrence": "must",
             "query": {"kind": "term", "options": {"field": "text", "term": "earth"}}},
        ]}},
    ),
    (
        "bool_should",
        {"kind": "boolean", "options": {"subqueries": [
            {"occurrence": "should",
             "query": {"kind": "term", "options": {"field": "text", "term": "mother"}}},
            {"occurrence": "should",
             "query": {"kind": "term", "options": {"field": "text", "term": "father"}}},
        ]}},
    ),
    (
        "bool_must_not",
        {"kind": "boolean", "options": {"subqueries": [
            {"occurrence": "must",
             "query": {"kind": "term", "options": {"field": "text", "term": "world"}}},
            {"occurrence": "must_not",
             "query": {"kind": "term", "options": {"field": "text", "term": "the"}}},
        ]}},
    ),
    (
        "bool_nested",
        {"kind": "boolean", "options": {"subqueries": [
            {"occurrence": "should",
             "query": {"kind": "boolean", "options": {"subqueries": [
                 {"occurrence": "must",
                  "query": {"kind": "term",
                            "options": {"field": "text", "term": "light"}}},
                 {"occurrence": "must_not",
                  "query": {"kind": "term",
                            "options": {"field": "text", "term": "dark"}}},
             ]}}},
            {"occurrence": "should",
             "query": {"kind": "term", "options": {"field": "text", "term": "house"}}},
        ]}},
    ),
    ("all", {"kind": "all"}),
    (
        "boost",
        {"kind": "boost", "options": {
            "query": {"kind": "term", "options": {"field": "text", "term": "year"}},
            "boost": 2.0}},
    ),
    (
        "range",
        {"kind": "range", "options": {"field": "lang", "start": "de", "end": "es"}},
    ),
    (
        "fuzzy",
        {"kind": "fuzzy_term", "options": {
            "field": "text", "term": "wird", "distance": 1,
            "transposition_cost_one": True, "prefix": False}},
    ),
    (
        "regex",
        {"kind": "regex", "options": {"field": "text", "regex": "wa.+"}},
    ),
    (
        "query_string",
        {"kind": "query_string", "options": {
            "query": 'water "of the" -mother', "default_search_fields": ["text"]}},
    ),
    (
        "query_string_and",
        {"kind": "query_string", "options": {
            "query": "water AND earth", "default_search_fields": ["text"]}},
    ),
    (
        "query_string_parens",
        {"kind": "query_string", "options": {
            "query": "(water OR earth) AND light",
            "default_search_fields": ["text"]}},
    ),
    (
        "query_string_not",
        {"kind": "query_string", "options": {
            "query": "water NOT (mother OR father)",
            "default_search_fields": ["text"]}},
    ),
    (
        "query_string_boost",
        {"kind": "query_string", "options": {
            "query": 'water^2 "of the"^0.5 earth',
            "default_search_fields": ["text"]}},
    ),
    (
        "boost_of_boolean",
        {"kind": "boost", "options": {"boost": 0.5, "query": {
            "kind": "boolean", "options": {"subqueries": [
                {"occurrence": "must", "query": {
                    "kind": "term",
                    "options": {"field": "text", "term": "light"}}},
                {"occurrence": "should", "query": {
                    "kind": "term",
                    "options": {"field": "text", "term": "kind"}}},
            ]}}}},
    ),
    (
        "bool_of_phrase_and_fuzzy",
        {"kind": "boolean", "options": {"subqueries": [
            {"occurrence": "should", "query": {
                "kind": "phrase", "options": {
                    "field": "text",
                    "phrase_terms": ["in", "the"], "slop": 0}}},
            {"occurrence": "should", "query": {
                "kind": "fuzzy_term", "options": {
                    "field": "text", "term": "watre", "distance": 2,
                    "transposition_cost_one": True}}},
        ]}},
    ),
    (
        "must_not_only",
        {"kind": "boolean", "options": {"subqueries": [
            {"occurrence": "must_not", "query": {
                "kind": "term",
                "options": {"field": "text", "term": "the"}}},
        ]}},
    ),
    (
        "raw_field_term",
        {"kind": "term", "options": {"field": "lang", "term": "de"}},
    ),
    (
        "regex_all_suffix",
        {"kind": "regex", "options": {"field": "text", "regex": ".*ther"}},
    ),
    (
        "phrase_three_terms",
        {"kind": "phrase", "options": {
            "field": "text", "phrase_terms": ["the", "of", "the"],
            "slop": 1}},
    ),
    (
        "deep_nesting",
        {"kind": "boost", "options": {"boost": 3.0, "query": {
            "kind": "boolean", "options": {"subqueries": [
                {"occurrence": "must", "query": {
                    "kind": "boolean", "options": {"subqueries": [
                        {"occurrence": "should", "query": {
                            "kind": "term", "options": {
                                "field": "text", "term": "mother"}}},
                        {"occurrence": "should", "query": {
                            "kind": "term", "options": {
                                "field": "text", "term": "father"}}},
                    ]}}},
                {"occurrence": "must_not", "query": {
                    "kind": "range", "options": {
                        "field": "lang", "start": "zh", "end": "zz"}}},
            ]}}}},
    ),
]


@pytest.mark.parametrize("name,query", QUERIES, ids=[q[0] for q in QUERIES])
def test_rank_identity(built, name, query):
    engine, oracle = built
    expected = oracle.top_k(query, k=K)
    got_rows = (
        engine.scores(query, topk_hint=K)
        .orderBy("score", ascending=False)
        .collect()
    )
    got_sorted = sorted(
        [(r["doc_id"], r["score"]) for r in got_rows],
        key=lambda kv: (-kv[1], kv[0]),
    )[:K]
    assert [d for d, _ in got_sorted] == [d for d, _ in expected], (
        f"{name}: doc ids diverge\n spark={got_sorted}\n oracle={expected}"
    )
    for (gd, gs), (ed, es) in zip(got_sorted, expected):
        assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12), (
            f"{name}: score mismatch doc {gd}: spark={gs!r} oracle={es!r}"
        )


def test_count_matches_oracle(built):
    engine, oracle = built
    q = {"kind": "term", "options": {"field": "text", "term": "the"}}
    assert engine.scores(q).count() == len(oracle.run(q))


def test_search_response_shape(built):
    engine, _ = built
    resp = engine.search(
        {
            "query": {"kind": "term", "options": {"field": "text", "term": "the"}},
            "collection_kind": "count_and_top_docs",
            "fields": ["lang"],
            "offset": 0,
            "hits": 5,
        }
    )
    assert resp.total_hits > 0
    assert len(resp.documents) == 5
    d0 = resp.documents[0]
    assert set(d0) == {"id", "score", "timestamp", "sort_value", "fields"}
    assert d0["id"].startswith("https://")
    assert d0["fields"]["lang"]


def test_search_offset_pagination(built):
    engine, oracle = built
    q = {"kind": "term", "options": {"field": "text", "term": "water"}}
    full = engine.search({"query": q, "hits": 10, "offset": 0})
    page2 = engine.search({"query": q, "hits": 5, "offset": 5})
    assert [d["id"] for d in page2.documents] == [
        d["id"] for d in full.documents[5:]
    ]


def test_sort_by_fast_field(built):
    engine, _ = built
    resp = engine.search(
        {
            "query": {"kind": "all"},
            "sort": {"field": "warc_ts", "order": "desc"},
            "hits": 5,
        }
    )
    ts = [d["sort_value"] for d in resp.documents]
    assert ts == sorted(ts, reverse=True)
