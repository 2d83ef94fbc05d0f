"""query_string parser → JSON-DSL AST.

The reference delegates to tantivy's QueryParser over default_search_fields
(bayard/src/search/query/query_string.rs:16-40; errors when the field list is
empty :20-22). This is our own parser for the grammar subset the reference
documents and its examples exercise (docs/query_dsl.md:151-169):

    clause   := [+|-] [field ':'] ( '"' phrase '"' | word )
    expr     := clause ((AND|OR)? clause)*

Semantics (documented; the oracle and the Spark engine share this exact
function, so rank-identity holds by construction):
- bare clauses default to `should` (tantivy default is disjunction;
  set_conjunction_by_default is never called by the reference)
- any explicit AND connector upgrades non-negated clauses to `must`
- `+` → must, `-` → must_not
- an unqualified clause searches every default field (should-of-fields)
- clause text is analyzed with the target field's analyzer; one token →
  term query, many tokens → phrase query (slop 0); zero tokens → dropped
- a quoted clause is always a phrase when it analyzes to >1 token
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<connector>AND|OR)(?=\s|$)
      | (?P<prefix>[+-])?
        (?:(?P<field>[\w.]+):)?
        (?:"(?P<phrase>[^"]*)"|(?P<word>[^\s"]+))
    )""",
    re.VERBOSE,
)


def parse_query_string(
    query: str,
    default_search_fields: list[str],
    analyzers,
    field_analyzers: dict[str, str],
) -> dict:
    if not default_search_fields:
        # query_string.rs:20-22
        raise ValueError("default_search_fields must not be empty")

    raw_clauses = []
    saw_and = False
    pos = 0
    while pos < len(query):
        m = TOKEN_RE.match(query, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        if m.group("connector"):
            if m.group("connector") == "AND":
                saw_and = True
            continue
        raw_clauses.append(
            (
                m.group("prefix"),
                m.group("field"),
                m.group("phrase") if m.group("phrase") is not None
                else m.group("word"),
            )
        )

    def leaf(field: str, text: str) -> dict | None:
        aname = field_analyzers.get(field, "default")
        toks = analyzers[aname].analyze_one(text)
        if not toks:
            return None
        if len(toks) == 1:
            return {"kind": "term",
                    "options": {"field": field, "term": toks[0]}}
        return {
            "kind": "phrase",
            "options": {"field": field, "phrase_terms": toks, "slop": 0},
        }

    subqueries = []
    for prefix, field, text in raw_clauses:
        fields = [field] if field else list(default_search_fields)
        leaves = [x for x in (leaf(f, text) for f in fields) if x]
        if not leaves:
            continue
        if len(leaves) == 1:
            q = leaves[0]
        else:
            q = {
                "kind": "boolean",
                "options": {
                    "subqueries": [
                        {"occurrence": "should", "query": x} for x in leaves
                    ]
                },
            }
        if prefix == "+":
            occ = "must"
        elif prefix == "-":
            occ = "must_not"
        else:
            occ = "must" if saw_and else "should"
        subqueries.append({"occurrence": occ, "query": q})

    if not subqueries:
        return {"kind": "boolean", "options": {"subqueries": []}}
    if len(subqueries) == 1 and subqueries[0]["occurrence"] == "should":
        return subqueries[0]["query"]
    return {"kind": "boolean", "options": {"subqueries": subqueries}}
