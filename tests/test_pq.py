"""PQ / IVF-PQ vs an independent numpy reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bayard_spark.functions.similarity import (
    deterministic_centroids,
    ivf_assign,
    ivf_pq_search,
    pq_codebooks,
    pq_encode,
    pq_search,
)


def ref_encode(x, books):
    """Naive reference: full ||x-c||^2, argmin (first on ties)."""
    m, k, dsub = books.shape
    codes = np.empty((len(x), m), dtype=int)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def ref_adc(codes, books, q):
    m, k, dsub = books.shape
    dist = np.zeros(len(codes))
    for j in range(m):
        table = ((books[j] - q[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(
            axis=1
        )
        dist += table[codes[:, j]]
    return dist


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(300, 32)).astype(np.float64)
    x[250] = x[0]  # exact duplicate of the query vector
    rows = [(i, x[i].tolist()) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, x


class TestPQ:
    def test_codebook_shape_and_determinism(self, spark, emb):
        df, x = emb
        b1 = pq_codebooks(df, m=4, k=8)
        b2 = pq_codebooks(df.repartition(7), m=4, k=8)
        assert b1.shape == (4, 8, 8)
        assert np.array_equal(b1, b2)
        with pytest.raises(ValueError, match="not divisible"):
            pq_codebooks(df, m=5, k=8)

    def test_encode_matches_reference(self, spark, emb):
        df, x = emb
        books = pq_codebooks(df, m=4, k=8)
        got = {
            r.vec_id: list(r.pq_code)
            for r in pq_encode(df, books).collect()
        }
        want = ref_encode(x, books)
        for i in range(len(x)):
            assert got[i] == list(want[i]), i

    def test_search_matches_reference_ranking(self, spark, emb):
        df, x = emb
        books = pq_codebooks(df, m=4, k=8)
        codes = ref_encode(x, books)
        q = x[0]
        dist = ref_adc(codes, books, q)
        order = sorted(range(len(x)), key=lambda i: (round(dist[i], 6), i))
        got = pq_search(pq_encode(df, books), books, q.tolist(), topk=12)
        got_rows = got.collect()
        assert [r.vec_id for r in got_rows] == order[:12]
        for r in got_rows:
            assert r.pq_dist == pytest.approx(dist[r.vec_id], abs=1e-6)

    def test_duplicate_of_query_ranks_top(self, spark, emb):
        df, x = emb
        books = pq_codebooks(df, m=4, k=8)
        top = pq_search(
            pq_encode(df, books), books, x[0].tolist(), topk=2
        ).collect()
        assert {top[0].vec_id, top[1].vec_id} == {0, 250}
        assert top[0].pq_dist == top[1].pq_dist  # identical codes

    def test_ivf_pq_equals_manual_probe_restriction(self, spark, emb):
        df, x = emb
        cents = deterministic_centroids(df, 6)
        books = pq_codebooks(df, m=4, k=8)
        # metric-aligned layout: L2 assignment to match the L2 ADC scan
        enc = pq_encode(ivf_assign(df, cents, metric="l2"), books)
        q = x[3]
        got = ivf_pq_search(enc, cents, books, q.tolist(), topk=5, nprobe=2)
        d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
        probes = np.argsort(d2, kind="stable")[:2].tolist()
        manual = pq_search(
            enc.filter(F.col("centroid").isin(probes)), books, q.tolist(), 5
        )
        assert [r.vec_id for r in got.collect()] == [
            r.vec_id for r in manual.collect()
        ]

    def test_ivf_assign_l2_matches_reference(self, spark, emb):
        df, x = emb
        cents = deterministic_centroids(df, 6)
        got = {
            r.vec_id: r.centroid
            for r in ivf_assign(df, cents, metric="l2").collect()
        }
        want = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(
            axis=1
        )
        assert all(got[i] == want[i] for i in range(len(x)))
        with pytest.raises(ValueError, match="metric"):
            ivf_assign(df, cents, metric="dot")

    def test_search_plan_is_jvm_only(self, spark, emb):
        df, x = emb
        books = pq_codebooks(df, m=4, k=8)
        codes = ref_encode(x, books)
        codes_df = spark.createDataFrame(
            [(i, [int(c) for c in codes[i]]) for i in range(len(x))],
            "vec_id long, pq_code array<int>",
        )
        plan = (
            pq_search(codes_df, books, x[0].tolist(), 5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the ADC scan over stored codes is pure JVM — no Python eval node
        assert "EvalPython" not in plan and "InPandas" not in plan
        assert "TakeOrderedAndProject" in plan


class TestKmeansRefine:
    def test_reduces_quantization_error_and_is_deterministic(self):
        from bayard_spark.functions.similarity import kmeans_refine

        rng = np.random.default_rng(3)
        # 4 well-separated blobs
        centers = rng.normal(scale=10, size=(4, 8))
        sample = np.vstack(
            [c + rng.normal(scale=0.5, size=(50, 8)) for c in centers]
        )
        init = sample[:4]  # a poor init: all from the first blob

        def err(cents):
            d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            return d2.min(axis=1).sum()

        refined = kmeans_refine(sample, init, n_iter=15)
        assert err(refined) < 0.25 * err(init)
        again = kmeans_refine(sample, init, n_iter=15)
        assert np.array_equal(refined, again)
        assert not np.array_equal(refined, init)  # input not mutated in place
        assert np.array_equal(init, sample[:4])

    def test_empty_cluster_keeps_position(self):
        from bayard_spark.functions.similarity import kmeans_refine

        sample = np.zeros((5, 2)) + [[0, 0], [0, 1], [1, 0], [1, 1], [0.5, 0.5]]
        init = np.array([[0.5, 0.5], [100.0, 100.0]])
        out = kmeans_refine(sample, init, n_iter=3)
        assert np.array_equal(out[1], [100.0, 100.0])  # never won a member


class TestRegexPrefix:
    """_regex_literal_prefix: every fullmatch of the pattern must start
    with the returned prefix (safety), checked by brute force."""

    def test_cases(self):
        from bayard_spark.query.engine import SearchEngine

        p = SearchEngine._regex_literal_prefix
        assert p("jo[a-z]*") == "jo"
        assert p("join") == "join"
        assert p("jo*") == "j"      # quantified 'o' is optional
        assert p("a{2}b") == ""     # conservative before '{'
        assert p("jo|x") == ""      # top-level alternation: no prefix
        assert p("(jo)x") == ""
        assert p("jo\\.x") == "jo"
        assert p("^jo") == ""
        assert p("") == ""

    def test_safety_brute_force(self):
        import itertools
        import re

        from bayard_spark.query.engine import SearchEngine

        pats = [
            "ab[cd]*", "a*b", "ab|cd", "a(b|c)d", "abc?", "ab{1,2}c",
            "a.c", "abc", "a\\db", "ab$", "a+b",
        ]
        words = [
            "".join(w)
            for n in range(1, 5)
            for w in itertools.product("abcd1", repeat=n)
        ]
        for pat in pats:
            prefix = SearchEngine._regex_literal_prefix(pat)
            rx = re.compile(pat)
            for w in words:
                if rx.fullmatch(w):
                    assert w.startswith(prefix), (pat, w, prefix)


class TestRegexRequiredLiterals:
    """_regex_required_literals: every fullmatch of the pattern must
    CONTAIN every returned literal (no false negatives), brute-forced
    over a small alphabet; plus shape cases for the r7 dictionary
    contains-prefilter."""

    def test_cases(self):
        from bayard_spark.query.engine import SearchEngine

        r = SearchEngine._regex_required_literals
        assert r(".*journal.*") == ["journal"]
        assert r("[a-z]*journal[0-9]+") == ["journal"]
        assert r("jo[a-z]*") == ["jo"]
        assert r("a{2,3}") == []          # quantifier body never a literal
        assert r(".{2}x") == ["x"]
        assert r("jo|x") == []            # alternation voids requirements
        assert r("(?i)abc") == []         # inline flags void requirements
        assert r("(foo|bar)baz") == ["baz"]  # groups opaque
        assert r("foo(bar)?") == ["foo"]
        assert r("a+b") == ["a", "b"]     # '+' keeps its atom, ends the run
        assert r("a*b") == ["b"]
        assert r(r"\d+abc") == ["abc"]
        assert r(r"ab\.cd") == ["ab.cd"]
        assert r("") == []
        # classes INSIDE groups must not corrupt depth tracking (r7
        # review finding: '(a[)]b*c)?x' used to claim ']','c' required)
        assert r("(a[)]b*c)?x") == ["x"]
        assert r("[(]ab") == ["ab"]
        assert r("(x[([]y)z") == ["z"]

    def test_safety_brute_force(self):
        import itertools
        import re

        from bayard_spark.query.engine import SearchEngine

        pats = [
            "ab[cd]*", "a*b", "a(b|c)d", "abc?", "ab{1,2}c", "a.c",
            "abc", "a\\db", "a+b", ".*bc.*", "a.?c", "[ab]+cd[ab]*",
            "a{2}bc", "a\\.b", "x(yz)*w", "a..b", "ab+c", "]a",
            "(a[.]b*c)?d", "[(]ab", "(a[(]b)?cd", "a[]]b",
        ]
        words = [
            "".join(w)
            for n in range(1, 6)
            for w in itertools.product("abcd.1", repeat=n)
        ]
        for pat in pats:
            req = SearchEngine._regex_required_literals(pat)
            rx = re.compile(pat)
            for w in words:
                if rx.fullmatch(w):
                    for lit in req:
                        assert lit in w, (pat, w, lit)
