"""bigram_logprob vs a hand-computed numpy reference; training_order
determinism/balance/order invariants."""

import math

import pytest
from pyspark.sql import functions as F

from bayard_spark.functions.sampling import training_order
from bayard_spark.functions.textstats import bigram_logprob

LAM = 0.8


def ref_bigram(rows, lam=LAM):
    """Independent reference: dict counting, pure python."""
    toks = {}
    for doc_id, text in rows:
        toks[doc_id] = (
            [w for w in "".join(
                c if c.isalnum() else " " for c in text.lower()
            ).split() if w]
            if text is not None
            else None
        )
    uni, big, total = {}, {}, 0
    for ws in toks.values():
        if not ws:
            continue
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
            total += 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    out = {}
    for doc_id, ws in toks.items():
        if not ws or len(ws) < 2:
            out[doc_id] = None
            continue
        lps = [
            math.log(
                lam * big[(a, b)] / uni[a] + (1 - lam) * uni[b] / total
            )
            for a, b in zip(ws, ws[1:])
        ]
        out[doc_id] = sum(lps) / len(lps)
    return out


class TestBigramLogprob:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (0, "the cat sat on the mat"),
            (1, "the cat ate the cat food"),
            (2, "dog"),  # single token -> NULL
            (3, ""),  # no tokens -> NULL
            (4, None),  # NULL text -> NULL
            (5, "the the the"),  # repeated-token bigrams
            (6, "Cat! The... cat?"),  # punctuation + case folding
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_matches_reference(self, spark, corpus):
        got = {
            r.doc_id: r.logprob for r in bigram_logprob(corpus).collect()
        }
        want = ref_bigram([(r.doc_id, r.text) for r in corpus.collect()])
        assert set(got) == set(want)
        for k in want:
            if want[k] is None:
                assert got[k] is None, k
            else:
                assert got[k] == pytest.approx(want[k], abs=1e-12), k

    def test_shuffle_branch_identical(self, spark, corpus):
        a = sorted(
            (r.doc_id, r.logprob) for r in bigram_logprob(corpus).collect()
        )
        b = sorted(
            (r.doc_id, r.logprob)
            for r in bigram_logprob(corpus, broadcast_pairs_max=0).collect()
        )
        for (i, x), (j, y) in zip(a, b):
            assert i == j
            assert (x is None and y is None) or x == pytest.approx(
                y, abs=1e-12
            )

    def test_pair_count_skips_measuring(self, spark, corpus):
        c = bigram_logprob(corpus, pair_count=10).collect()
        d = bigram_logprob(corpus).collect()
        assert sorted((r.doc_id, r.logprob) for r in c) == sorted(
            (r.doc_id, r.logprob) for r in d
        )


class TestCorpusReport:
    def test_hand_computed(self, spark):
        from bayard_spark.functions.textstats import corpus_report

        rows = [
            (0, "the cat sat"),       # 3 tokens
            (1, "the cat sat"),       # dup of 0
            (2, None),                # null
            (3, "   "),               # empty (0 tokens)
            (4, "dog! dog, dog"),     # 3 tokens
            (5, ""),                  # empty
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = corpus_report(df).collect()[0]
        assert r.n_docs == 6
        assert r.n_null_text == 1
        assert r.n_empty_text == 2
        assert r.total_tokens == 9
        assert r.avg_tokens == 3.0
        assert r.total_chars == len("the cat sat") * 2 + 3 + len("dog! dog, dog")
        assert r.n_distinct_texts == 4  # dup text counts once; null excluded
        assert r.n_dup_docs == 2
        assert r.n_distinct_words == 4  # the cat sat dog

    def test_words_skippable(self, spark):
        from bayard_spark.functions.textstats import corpus_report

        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        r = corpus_report(df, words=False).collect()[0]
        assert r.n_distinct_words is None and r.total_tokens == 2


class TestTrainingOrder:
    @pytest.fixture(scope="class")
    def ids(self, spark):
        return spark.range(0, 2000).select(F.col("id").alias("doc_id"))

    @staticmethod
    def _global(rows):
        """The operator's defined global order (what partitionBy-written
        files replay: file dirs in file_id order, rows in written order)."""
        return [
            r.doc_id
            for r in sorted(
                rows, key=lambda r: (r._file_id, r._order_key, r.doc_id)
            )
        ]

    def test_partitioning_independent(self, spark, ids):
        a = self._global(
            training_order(ids.repartition(1), num_files=8).collect()
        )
        b = self._global(
            training_order(ids.repartition(13), num_files=8).collect()
        )
        assert a == b
        assert sorted(a) == list(range(2000))

    def test_file_slices_are_key_ranges(self, spark, ids):
        rows = training_order(ids, num_files=8).collect()
        # bucket is monotone in key: sorting by (file, key, id) == sorting
        # by (key, id) alone — so the file split never reorders the stream
        by_file = self._global(rows)
        by_key = [
            r.doc_id
            for r in sorted(rows, key=lambda r: (r._order_key, r.doc_id))
        ]
        assert by_file == by_key

    def test_clustered_and_sorted_within_tasks(self, spark, ids):
        parts = (
            training_order(ids, num_files=8)
            .rdd.glom()
            .map(
                lambda rs: [
                    (r["_file_id"], r["_order_key"], r["doc_id"]) for r in rs
                ]
            )
            .collect()
        )
        for p in parts:
            assert p == sorted(p)  # writer sees each file's rows in order

    def test_seed_changes_permutation(self, spark, ids):
        a = self._global(training_order(ids, seed=1, num_files=4).collect())
        b = self._global(training_order(ids, seed=2, num_files=4).collect())
        assert a != b and sorted(a) == sorted(b)

    def test_files_balanced(self, spark, ids):
        rows = training_order(ids, num_files=8).collect()
        from collections import Counter

        c = Counter(r._file_id for r in rows)
        assert set(c) <= set(range(8))
        assert max(c.values()) < 2 * (2000 / 8)  # uniform hash, no hot file

    def test_shuffled_not_identity(self, spark, ids):
        a = self._global(training_order(ids, num_files=4).collect())
        assert a != sorted(a)
