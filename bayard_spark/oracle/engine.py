"""Slow-but-obvious in-memory reference engine.

This is the executable specification of the engine's semantics (SURVEY §2.7,
§5): dict-based postings, exact BM25 with GLOBAL stats (one logical index —
the documented divergence from the reference's per-shard stats), f64
accumulation, ties broken by doc_id ascending. The Spark engine must be
rank-identical (doc ids AND scores) to this on any corpus.

Query semantics mirror bayard/src/search/query.rs:74-132 and the per-kind
modules (term.rs, boolean.rs, phrase.rs, fuzzy_term.rs, regex.rs, range.rs,
boost.rs, all.rs, query_string.rs):
- term/phrase args are used verbatim (NOT re-analyzed) — term.rs:21
- boolean: must intersect / must_not subtract / should union; scores of
  matching must+should clauses SUM (boolean.rs:272-290)
- boost multiplies (boost.rs:10-14); all/range score 1.0 (query_dsl.md:21,173)
- phrase: ordered adjacency within slop; scored as a term with
  tf = phrase-occurrence count and idf = Σ idf of constituent terms
- fuzzy_term: Levenshtein ≤ distance (optional Damerau transposition=1,
  optional prefix mode: some prefix of the indexed term matches)
- regex: full-match over the term dictionary (regex.rs:12-25)
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pandas as pd

from bayard_spark import BM25_B, BM25_K1
from bayard_spark.analysis.analyzer import Analyzer, build_analyzers


def levenshtein(a: str, b: str, transposition: bool = False) -> int:
    la, lb = len(a), len(b)
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                transposition
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[lb]


def prefix_edit_distance(query: str, term: str, transposition: bool) -> int:
    """min distance between query and any prefix of term."""
    best = len(query)
    for j in range(len(term) + 1):
        best = min(best, levenshtein(query, term[:j], transposition))
        if best == 0:
            return 0
    return best


class OracleIndex:
    def __init__(
        self,
        analyzers: dict[str, Analyzer] | None = None,
        field_analyzers: dict[str, str] | None = None,
        k1: float = BM25_K1,
        b: float = BM25_B,
        lossy_fieldnorms: bool = False,
    ):
        self.analyzers = analyzers or build_analyzers({})
        self.field_analyzers = field_analyzers or {}
        self.k1 = k1
        self.b = b
        self.lossy_fieldnorms = lossy_fieldnorms
        # field -> term -> {doc_id: [positions]}
        self.postings: dict[str, dict[str, dict[int, list[int]]]] = defaultdict(
            lambda: defaultdict(dict)
        )
        self.doc_len: dict[str, dict[int, int]] = defaultdict(dict)
        self.docs: dict[int, dict] = {}

    # ---------- build ----------

    def add(self, doc_id: int, fields: dict) -> None:
        self.docs[doc_id] = fields
        for fname, value in fields.items():
            if isinstance(value, (bytes, bytearray)):
                # bytes field: one raw base64 term (docs/schema.md:106-122)
                import base64

                tok = base64.b64encode(bytes(value)).decode()
                self.postings[fname][tok].setdefault(doc_id, []).append(0)
                self.doc_len[fname][doc_id] = 1
                continue
            if isinstance(value, dict):
                # json_object: dynamic leaf expansion, terms '<path>=<token>'
                # (docs/schema.md:125-157); scalar leaves stringified the
                # JSON way (true/1.5/abc), tf aggregated across leaves
                import json as _json

                aname = self.field_analyzers.get(fname, "default")
                an = self.analyzers[aname]
                n_tokens = 0
                pos = 0

                def walk(obj, prefix=""):
                    nonlocal n_tokens, pos
                    for k, v in obj.items():
                        path = f"{prefix}.{k}" if prefix else k
                        if isinstance(v, dict):
                            walk(v, path)
                            continue
                        sval = v if isinstance(v, str) else _json.dumps(v)
                        for tok in an.analyze_one(sval):
                            self.postings[fname][f"{path}={tok}"].setdefault(
                                doc_id, []
                            ).append(pos)
                            pos += 1
                            n_tokens += 1

                walk(value)
                self.doc_len[fname][doc_id] = n_tokens
                continue
            if not isinstance(value, str):
                continue
            aname = self.field_analyzers.get(fname, "default")
            an = self.analyzers[aname]
            frame = an.tokenize(pd.Series([value]))
            toks = list(zip(frame["token"], frame["pos"]))
            self.doc_len[fname][doc_id] = len(toks)
            for tok, pos in toks:
                self.postings[fname][tok].setdefault(doc_id, []).append(int(pos))

    @property
    def n_docs(self) -> int:
        return len(self.docs)

    def avg_len(self, field: str) -> float:
        lens = self.doc_len.get(field, {})
        # average over ALL docs of the index (docs without the field count 0),
        # matching the Spark engine's stats table (total_len / n_docs)
        return (sum(lens.values()) / self.n_docs) if self.n_docs else 0.0

    # ---------- scoring ----------

    def idf(self, field: str, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _tf_norm(self, field: str, doc_id: int, tf: float) -> float:
        dl = self.doc_len[field].get(doc_id, 0)
        if self.lossy_fieldnorms:
            from bayard_spark.fieldnorm import quantize_one

            dl = quantize_one(dl)
        avg = self.avg_len(field)
        denom = tf + self.k1 * (1 - self.b + self.b * dl / avg) if avg else tf + self.k1
        return tf * (self.k1 + 1) / denom

    # ---------- query kinds → {doc_id: score} ----------

    def q_all(self) -> dict[int, float]:
        return {d: 1.0 for d in self.docs}

    def q_term(self, field: str, term: str) -> dict[int, float]:
        plist = self.postings.get(field, {}).get(term, {})
        if not plist:
            return {}
        idf = self.idf(field, len(plist))
        return {
            d: idf * self._tf_norm(field, d, len(pos))
            for d, pos in plist.items()
        }

    def q_phrase(
        self, field: str, phrase_terms: list[str], slop: int = 0
    ) -> dict[int, float]:
        if len(phrase_terms) < 2:
            raise ValueError("phrase requires >= 2 terms")  # phrase.rs:13-33
        plists = [self.postings.get(field, {}).get(t) for t in phrase_terms]
        if any(p is None for p in plists):
            return {}
        common = set(plists[0])
        for p in plists[1:]:
            common &= set(p)
        out = {}
        sum_idf = sum(self.idf(field, len(p)) for p in plists)
        for d in common:
            count = self._phrase_matches([p[d] for p in plists], slop)
            if count:
                out[d] = sum_idf * self._tf_norm(field, d, count)
        return out

    @staticmethod
    def _phrase_matches(pos_lists: list[list[int]], slop: int) -> int:
        """Count ordered occurrences: positions p_i for term i with
        0 < p_{i+1} - p_i <= slop + 1 (slop = max extra gap; 0 = adjacent)."""
        count = 0
        for p0 in pos_lists[0]:
            prev_opts = [p0]
            ok = True
            for nxt in pos_lists[1:]:
                new_opts = [
                    q
                    for q in nxt
                    if any(0 < q - p <= slop + 1 for p in prev_opts)
                ]
                if not new_opts:
                    ok = False
                    break
                prev_opts = new_opts
            if ok:
                count += 1
        return count

    def q_range(self, field: str, start, end) -> dict[int, float]:
        out = {}
        for d, fields in self.docs.items():
            v = fields.get(field)
            if v is not None and start <= v < end:  # half-open, range.rs:52-101
                out[d] = 1.0
        return out

    def q_fuzzy(
        self,
        field: str,
        term: str,
        distance: int = 1,
        transposition_cost_one: bool = False,
        prefix: bool = False,
    ) -> dict[int, float]:
        out: dict[int, float] = {}
        for t in self.postings.get(field, {}):
            d = (
                prefix_edit_distance(term, t, transposition_cost_one)
                if prefix
                else levenshtein(term, t, transposition_cost_one)
            )
            if d <= distance:
                for doc, score in self.q_term(field, t).items():
                    out[doc] = out.get(doc, 0.0) + score
        return out

    def q_regex(self, field: str, pattern: str) -> dict[int, float]:
        rx = re.compile(pattern)
        out: dict[int, float] = {}
        for t in self.postings.get(field, {}):
            if rx.fullmatch(t):
                for doc, score in self.q_term(field, t).items():
                    out[doc] = out.get(doc, 0.0) + score
        return out

    def q_boolean(self, subqueries: list[tuple[str, dict[int, float]]]) -> dict[int, float]:
        musts = [s for occ, s in subqueries if occ == "must"]
        shoulds = [s for occ, s in subqueries if occ == "should"]
        must_nots = [s for occ, s in subqueries if occ == "must_not"]
        if musts:
            cand = set(musts[0])
            for m in musts[1:]:
                cand &= set(m)
        elif shoulds:
            cand = set()
            for s in shoulds:
                cand |= set(s)
        else:
            cand = set(self.docs)
        for mn in must_nots:
            cand -= set(mn)
        out = {}
        for d in cand:
            sc = sum(m[d] for m in musts)
            sc += sum(s.get(d, 0.0) for s in shoulds)
            out[d] = sc
        return out

    def q_boost(self, scores: dict[int, float], boost: float) -> dict[int, float]:
        return {d: s * boost for d, s in scores.items()}

    # ---------- JSON DSL evaluation ----------

    def run(self, query: dict) -> dict[int, float]:
        kind = query["kind"]
        opts = query.get("options", {})
        if kind == "all":
            return self.q_all()
        if kind == "term":
            return self.q_term(opts["field"], opts["term"])
        if kind == "phrase":
            return self.q_phrase(
                opts["field"], opts["phrase_terms"], opts.get("slop", 0)
            )
        if kind == "range":
            return self.q_range(opts["field"], opts["start"], opts["end"])
        if kind == "fuzzy_term":
            return self.q_fuzzy(
                opts["field"],
                opts["term"],
                opts.get("distance", 1),
                opts.get("transposition_cost_one", False),
                opts.get("prefix", False),
            )
        if kind == "regex":
            return self.q_regex(opts["field"], opts["regex"])
        if kind == "boost":
            return self.q_boost(self.run(opts["query"]), opts["boost"])
        if kind == "boolean":
            subs = [
                (sq["occurrence"], self.run(sq["query"]))
                for sq in opts["subqueries"]
            ]
            return self.q_boolean(subs)
        if kind == "query_string":
            from bayard_spark.query.parser import parse_query_string

            ast = parse_query_string(
                opts["query"],
                opts["default_search_fields"],
                self.analyzers,
                self.field_analyzers,
            )
            return self.run(ast)
        raise ValueError(f"unknown query kind {kind!r}")

    def top_k(
        self, query: dict, k: int = 10, offset: int = 0
    ) -> list[tuple[int, float]]:
        scores = self.run(query)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[offset : offset + k]
