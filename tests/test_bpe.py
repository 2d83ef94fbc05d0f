"""BPE train/encode vs an INDEPENDENT naive reference written here.

The reference implementations below recount every pair from scratch each
round (training) and rescan the whole symbol list each step (encoding) —
no incremental indexing, no memoization — so agreement checks the
production module's optimizations, not just its spec.
"""

import random
import re

import pytest

from bayard_spark.functions.bpe import (
    EOW,
    bpe_encode,
    encode_word,
    merges_df,
    train_bpe,
    train_bpe_on_types,
)

# ---------------------------------------------------------------------------
# naive references (independent of the module's internals)
# ---------------------------------------------------------------------------


def naive_merge(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def naive_train(types, num_merges):
    words = {i: tuple(w) + (EOW,) for i, (w, _) in enumerate(types)}
    freqs = {i: c for i, (_, c) in enumerate(types)}
    merges = []
    for _ in range(num_merges):
        stats = {}
        for i, syms in words.items():
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                stats[p] = stats.get(p, 0) + freqs[i]
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {i: naive_merge(s, best) for i, s in words.items()}
    return merges


def naive_encode(word, merges):
    syms = tuple(word) + (EOW,)
    ranks = {p: i for i, p in enumerate(merges)}
    while True:
        cands = [
            (ranks[(syms[j], syms[j + 1])], (syms[j], syms[j + 1]))
            for j in range(len(syms) - 1)
            if (syms[j], syms[j + 1]) in ranks
        ]
        if not cands:
            return syms
        syms = naive_merge(syms, min(cands)[1])


TOK = re.compile(r"[\W_]+", re.UNICODE)


def naive_encode_doc(text, merges):
    out = []
    for w in TOK.split(text.lower()):
        if w:
            out.extend(naive_encode(w, merges))
    return out


# ---------------------------------------------------------------------------
# unit: training
# ---------------------------------------------------------------------------


class TestTrain:
    def test_textbook_example(self):
        # Sennrich et al. §3.2's shape: low/lower/newest/widest.
        types = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = train_bpe_on_types(types, 4)
        assert merges == naive_train(types, 4)
        # est is the dominant pair family: (e,s) count 9 first.
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", EOW)

    def test_tie_break_lexicographic(self):
        # (a,b) and (c,d) both count 3 → (a,b) wins by pair ASC.
        types = [("ab", 3), ("cd", 3)]
        merges = train_bpe_on_types(types, 1)
        assert merges[0] == ("a", "b")

    def test_exhaustion_stops_early(self):
        types = [("ab", 1)]
        # a+b, ab+</w> — then single-symbol words have no pairs left.
        merges = train_bpe_on_types(types, 10)
        assert merges == [("a", "b"), ("ab", EOW)]

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_vs_naive(self, seed):
        rng = random.Random(seed)
        vocab = set()
        while len(vocab) < 40:
            vocab.add(
                "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 7)))
            )
        types = [(w, rng.randint(1, 50)) for w in sorted(vocab)]
        assert train_bpe_on_types(types, 25) == naive_train(types, 25)

    def test_overlap_counting_positional(self):
        # "aaaa" has three positional (a,a) occurrences vs "bc"x2 = 2 —
        # positional counting (subword-nmt get_stats) must pick (a,a).
        types = [("aaaa", 1), ("bc", 2)]
        merges = train_bpe_on_types(types, 1)
        assert merges[0] == ("a", "a")


# ---------------------------------------------------------------------------
# unit: encoding
# ---------------------------------------------------------------------------


class TestEncodeWord:
    def test_matches_naive_random(self):
        rng = random.Random(7)
        vocab = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 8)))
            for _ in range(60)
        ]
        types = [(w, rng.randint(1, 9)) for w in sorted(set(vocab))]
        merges = train_bpe_on_types(types, 30)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in vocab + ["zzz", "a", "dcba"]:
            assert encode_word(w, ranks) == naive_encode(w, merges)

    def test_roundtrip_reconstructs_word(self):
        types = [("hello", 3), ("help", 2), ("yellow", 1)]
        merges = train_bpe_on_types(types, 8)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in ["hello", "help", "yellow", "hell", "lo"]:
            toks = encode_word(w, ranks)
            assert "".join(toks).replace(EOW, "") == w
            assert toks[-1].endswith(EOW)

    def test_unseen_chars_stay_single(self):
        merges = [("a", "b")]
        ranks = {p: i for i, p in enumerate(merges)}
        assert encode_word("xy", ranks) == ("x", "y", EOW)


# ---------------------------------------------------------------------------
# Spark end-to-end
# ---------------------------------------------------------------------------


class TestSpark:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (0, "the low lower lowest of the newest widest"),
            (1, "low low low newest newest"),
            (2, "Wide_st WIDEST wide st"),  # case folding + underscore split
            (3, ""),  # token-less
            (4, None),  # NULL
            (5, "punct, punct; punct!"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_train_distributed_matches_local(self, spark, corpus):
        merges = train_bpe(corpus, 12)
        # independent: count words locally with the same pre-tokenizer
        local = {}
        for r in corpus.collect():
            if r.text:
                for w in TOK.split(r.text.lower()):
                    if w:
                        local[w] = local.get(w, 0) + 1
        types = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))
        assert merges == naive_train(types, 12)

    def test_encode_end_to_end(self, spark, corpus):
        merges = train_bpe(corpus, 12)
        out = {
            r.doc_id: r.bpe_tokens
            for r in bpe_encode(corpus, merges).collect()
        }
        for r in corpus.collect():
            if r.text is None:
                assert out[r.doc_id] is None
            else:
                assert out[r.doc_id] == naive_encode_doc(r.text, merges)
        assert out[3] == []  # empty text → []

    def test_max_word_types_cap_deterministic(self, spark, corpus):
        # cap=3 keeps the 3 most frequent types (count desc, word asc)
        merges_capped = train_bpe(corpus, 5, max_word_types=3)
        local = {}
        for r in corpus.collect():
            if r.text:
                for w in TOK.split(r.text.lower()):
                    if w:
                        local[w] = local.get(w, 0) + 1
        types = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert merges_capped == naive_train(types, 5)

    def test_merges_df_shape(self, spark):
        df = merges_df(spark, [("a", "b"), ("ab", EOW)])
        assert [(r.rank, r.left, r.right) for r in df.collect()] == [
            (1, "a", "b"),
            (2, "ab", EOW),
        ]

    def test_encode_ids(self, spark, corpus):
        from bayard_spark.functions.bpe import bpe_vocab

        merges = train_bpe(corpus, 12)
        vocab = bpe_vocab(merges)
        # layout: sorted base alphabet + </w> first, merge products after
        assert vocab[EOW] < 37 and len(vocab) == 37 + len(
            {l + r for l, r in merges}
        )
        out = {
            r.doc_id: (r.bpe_tokens, r.bpe_ids)
            for r in bpe_encode(corpus, merges, vocab=vocab).collect()
        }
        for doc_id, (toks, ids) in out.items():
            if toks is None:
                assert ids is None
            else:
                assert ids == [vocab.get(t, -1) for t in toks]
        # every token of this corpus is in-vocab (alnum alphabet)
        flat = [
            i for _, ids in out.values() if ids is not None for i in ids
        ]
        assert flat and all(i >= 0 for i in flat)
