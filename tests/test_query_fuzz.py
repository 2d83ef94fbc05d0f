"""Randomized rank-identity fuzz: generated query ASTs, engine vs oracle.

Complements the fixed 27-shape suite in test_rank_identity.py: a seeded
generator composes arbitrary nestings of all 9 DSL kinds over the same
built corpus, and the engine must stay rank-identical (ids AND scores) to
the oracle on every one. Shapes are deterministic per seed, so failures
reproduce.
"""

import math
import random

import pytest

N_QUERIES = 30
K = 10

# vocabulary mix: common function words, mid-frequency, rare, and absent
VOCAB = [
    "the", "of", "and", "water", "earth", "light", "dark", "house",
    "mother", "father", "year", "world", "kind", "old", "little", "zzzz",
    "wird", "way", "day", "eye",
]


def gen_query(rng: random.Random, depth: int = 0) -> dict:
    kinds = ["term", "term", "term", "phrase", "boost", "fuzzy_term",
             "regex", "range", "all"]
    if depth < 2:
        kinds += ["boolean", "boolean", "boolean"]
    kind = rng.choice(kinds)
    if kind == "term":
        return {"kind": "term", "options": {
            "field": "text", "term": rng.choice(VOCAB)}}
    if kind == "phrase":
        n = rng.choice([2, 2, 3])
        return {"kind": "phrase", "options": {
            "field": "text",
            "phrase_terms": [rng.choice(VOCAB) for _ in range(n)],
            "slop": rng.choice([0, 0, 1, 2]),
        }}
    if kind == "boost":
        return {"kind": "boost", "options": {
            "boost": rng.choice([0.5, 2.0, 3.0]),
            "query": gen_query(rng, depth + 1)}}
    if kind == "fuzzy_term":
        return {"kind": "fuzzy_term", "options": {
            "field": "text",
            "term": rng.choice(["watre", "mothr", "yeer", "wrld"]),
            "distance": rng.choice([1, 2]),
            "transposition_cost_one": rng.random() < 0.5,
            "prefix": rng.random() < 0.25,
        }}
    if kind == "regex":
        return {"kind": "regex", "options": {
            "field": "text",
            "regex": rng.choice([r"wa.*", r".*ther", r"li..t", r"d[ao]y",
                                 r"ho[a-z]+e"]),
        }}
    if kind == "range":
        lo, hi = sorted(rng.sample(["aa", "de", "en", "fr", "zz"], 2))
        return {"kind": "range", "options": {
            "field": "lang", "start": lo, "end": hi}}
    if kind == "all":
        return {"kind": "all"}
    # boolean
    n = rng.choice([2, 2, 3])
    occs = [rng.choice(["must", "should", "should", "must_not"])
            for _ in range(n)]
    if all(o == "must_not" for o in occs):
        occs[0] = "should"
    return {"kind": "boolean", "options": {"subqueries": [
        {"occurrence": o, "query": gen_query(rng, depth + 1)}
        for o in occs
    ]}}


@pytest.mark.parametrize("seed", range(N_QUERIES))
def test_fuzzed_rank_identity(built, seed):
    engine, oracle = built
    rng = random.Random(20260816 + seed)
    query = gen_query(rng)
    expected = oracle.top_k(query, k=K)
    got = sorted(
        [(r["doc_id"], r["score"]) for r in engine.scores(query).collect()],
        key=lambda kv: (-kv[1], kv[0]),
    )[:K]
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"seed {seed}: ids diverge for {query}\n"
        f" spark={got}\n oracle={expected}"
    )
    for (gd, gs), (_, es) in zip(got, expected):
        assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12), (
            f"seed {seed}: score mismatch doc {gd} for {query}: "
            f"{gs!r} vs {es!r}"
        )
