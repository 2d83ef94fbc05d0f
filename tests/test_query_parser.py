"""query_string parser → DSL AST (parser grammar + analysis rules)."""

import pytest

from bayard_spark.analysis.analyzer import build_analyzers
from bayard_spark.query.parser import parse_query_string

AN = build_analyzers({})
FA = {"name": "default", "description": "default", "url": "raw"}


def parse(q, fields=("description",)):
    return parse_query_string(q, list(fields), AN, FA)


class TestParser:
    def test_single_term(self):
        assert parse("rust") == {
            "kind": "term",
            "options": {"field": "description", "term": "rust"},
        }

    def test_analysis_applied(self):
        # default analyzer lowercases; multi-token text → phrase
        assert parse("RUST") == {
            "kind": "term",
            "options": {"field": "description", "term": "rust"},
        }
        assert parse('"Programming Language"') == {
            "kind": "phrase",
            "options": {
                "field": "description",
                "phrase_terms": ["programming", "language"],
                "slop": 0,
            },
        }

    def test_default_is_disjunction(self):
        ast = parse("rust go")
        occs = [sq["occurrence"] for sq in ast["options"]["subqueries"]]
        assert occs == ["should", "should"]

    def test_and_upgrades_to_must(self):
        ast = parse("rust AND go")
        occs = [sq["occurrence"] for sq in ast["options"]["subqueries"]]
        assert occs == ["must", "must"]

    def test_plus_minus_prefixes(self):
        ast = parse("+rust -javascript go")
        occs = [sq["occurrence"] for sq in ast["options"]["subqueries"]]
        assert occs == ["must", "must_not", "should"]

    def test_field_qualified(self):
        ast = parse("name:rust")
        assert ast["options"]["field"] == "name"

    def test_multi_field_expansion(self):
        ast = parse("rust", fields=("name", "description"))
        subs = ast["options"]["subqueries"]
        assert [s["query"]["options"]["field"] for s in subs] == [
            "name",
            "description",
        ]
        assert all(s["occurrence"] == "should" for s in subs)

    def test_empty_fields_error(self):
        # query_string.rs:20-22
        with pytest.raises(ValueError):
            parse("rust", fields=())

    def test_punctuation_only_clause_dropped(self):
        ast = parse("rust !!!")
        assert ast["kind"] == "term"  # '!!!' analyzes to nothing

    def test_empty_query(self):
        ast = parse("")
        assert ast == {"kind": "boolean", "options": {"subqueries": []}}

    def test_quoted_phrase_with_field(self):
        ast = parse('name:"multi paradigm"')
        assert ast["kind"] == "phrase"
        assert ast["options"]["field"] == "name"
        assert ast["options"]["phrase_terms"] == ["multi", "paradigm"]
