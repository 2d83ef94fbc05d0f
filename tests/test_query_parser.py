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


class TestExtendedGrammar:
    """Parens grouping, NOT, and ^boost (tantivy QueryParser surface the
    reference delegates to — query_string.rs:35-39)."""

    def test_not_is_must_not(self):
        ast = parse("rust NOT go")
        subs = ast["options"]["subqueries"]
        assert [s["occurrence"] for s in subs] == ["should", "must_not"]
        assert subs[1]["query"]["options"]["term"] == "go"

    def test_parens_group_nested_boolean(self):
        ast = parse("(rust OR go) AND fast")
        subs = ast["options"]["subqueries"]
        assert [s["occurrence"] for s in subs] == ["must", "must"]
        inner = subs[0]["query"]
        assert inner["kind"] == "boolean"
        inner_occs = [s["occurrence"] for s in inner["options"]["subqueries"]]
        assert inner_occs == ["should", "should"]

    def test_and_scope_is_per_level(self):
        # AND inside the parens must not upgrade outer clauses
        ast = parse("slow (rust AND go)")
        subs = ast["options"]["subqueries"]
        assert [s["occurrence"] for s in subs] == ["should", "should"]
        inner_occs = [
            s["occurrence"]
            for s in subs[1]["query"]["options"]["subqueries"]
        ]
        assert inner_occs == ["must", "must"]

    def test_term_boost(self):
        ast = parse("rust^2")
        assert ast["kind"] == "boost"
        assert ast["options"]["boost"] == 2.0
        assert ast["options"]["query"]["options"]["term"] == "rust"

    def test_phrase_boost(self):
        ast = parse('"programming language"^0.5')
        assert ast["kind"] == "boost"
        assert ast["options"]["boost"] == 0.5
        assert ast["options"]["query"]["kind"] == "phrase"

    def test_group_boost(self):
        ast = parse("(rust go)^3")
        assert ast["kind"] == "boost"
        assert ast["options"]["boost"] == 3.0
        assert ast["options"]["query"]["kind"] == "boolean"

    def test_not_of_group(self):
        ast = parse("fast NOT (rust OR go)")
        subs = ast["options"]["subqueries"]
        assert [s["occurrence"] for s in subs] == ["should", "must_not"]
        assert subs[1]["query"]["kind"] == "boolean"

    def test_mixed_prefix_and_parens(self):
        ast = parse('+fast -(go) "systems language"')
        subs = ast["options"]["subqueries"]
        assert [s["occurrence"] for s in subs] == [
            "must", "must_not", "should",
        ]
