"""Analysis-pipeline unit tests ported from the reference's inline Rust tests.

Each case cites the reference test it reproduces (file:line under
/root/reference/bayard/src/index/).
"""

import pandas as pd
import pytest

from bayard_spark.analysis import (
    build_analyzer,
    tokenize_facet,
    tokenize_ngram,
    tokenize_raw,
    tokenize_simple,
    tokenize_whitespace,
)
from bayard_spark.analysis.analyzer import build_analyzers, builtin_analyzers
from bayard_spark.analysis.filters import (
    filter_alpha_num_only,
    filter_ascii_folding,
    filter_lower_case,
    filter_remove_long,
    filter_stemming,
    filter_stop_word,
)
from bayard_spark.analysis.stemmer import porter2_stem


def toks(frame):
    return frame["token"].tolist()


class TestTokenizers:
    def test_simple(self):
        # tokenizer/simple.rs:12-29
        f = tokenize_simple(pd.Series(["hello world!"]), offsets=True)
        assert f[["token", "start", "end"]].values.tolist() == [
            ["hello", 0, 5],
            ["world", 6, 11],
        ]
        assert f["pos"].tolist() == [0, 1]

    def test_simple_unicode_and_punct(self):
        f = tokenize_simple(pd.Series(["c'est l'été—déjà 42"]))
        assert toks(f) == ["c", "est", "l", "été", "déjà", "42"]

    def test_simple_leading_separator_positions(self):
        f = tokenize_simple(pd.Series([",hello world"]))
        assert f[["token", "pos"]].values.tolist() == [["hello", 0], ["world", 1]]

    def test_simple_empty_and_null(self):
        f = tokenize_simple(pd.Series(["", None, "   "]))
        assert len(f) == 0

    def test_whitespace(self):
        # tokenizer/whitespace.rs:42-59 — punctuation kept
        f = tokenize_whitespace(pd.Series(["hello world!"]), offsets=True)
        assert f[["token", "start", "end"]].values.tolist() == [
            ["hello", 0, 5],
            ["world!", 6, 12],
        ]

    def test_raw(self):
        # tokenizer/raw.rs:72-83 — whole value = one token
        f = tokenize_raw(pd.Series(["hello world!"]), offsets=True)
        assert f[["token", "pos", "start", "end"]].values.tolist() == [
            ["hello world!", 0, 0, 12]
        ]

    def test_ngram_2_3(self):
        # tokenizer/ngram.rs:57-130: "hello" min=2 max=3
        f = tokenize_ngram(pd.Series(["hello"]), 2, 3, False, offsets=True)
        assert f[["token", "start", "end"]].values.tolist() == [
            ["he", 0, 2], ["hel", 0, 3], ["el", 1, 3], ["ell", 1, 4],
            ["ll", 2, 4], ["llo", 2, 5], ["lo", 3, 5],
        ]
        assert (f["pos"] == 0).all()

    def test_ngram_prefix_only(self):
        # tokenizer/ngram.rs:160-198: "hello" min=2 max=5 prefix_only
        f = tokenize_ngram(pd.Series(["hello"]), 2, 5, True)
        assert toks(f) == ["he", "hel", "hell", "hello"]

    def test_ngram_validation(self):
        with pytest.raises(ValueError):
            tokenize_ngram(pd.Series(["x"]), 0, 2)
        with pytest.raises(ValueError):
            tokenize_ngram(pd.Series(["x"]), 3, 2)

    def test_facet_ancestors(self):
        # docs/analyzers.md:81-89
        f = tokenize_facet(pd.Series(["/language/rust"]))
        assert toks(f) == ["/language", "/language/rust"]


class TestFilters:
    def test_lower_case(self):
        # token_filter/lower_case.rs:103-106
        f = tokenize_simple(pd.Series(["HELLO World"]))
        assert toks(filter_lower_case(f)) == ["hello", "world"]

    def test_ascii_folding(self):
        # token_filter/ascii_folding.rs:134-137: Rámon → Ramon
        f = tokenize_simple(pd.Series(["Rámon rượu çà"]))
        assert toks(filter_ascii_folding(f)) == ["Ramon", "ruou", "ca"]

    def test_ascii_folding_preserves_non_latin(self):
        f = tokenize_simple(pd.Series(["日本語 test"]))
        assert toks(filter_ascii_folding(f)) == ["日本語", "test"]

    def test_alpha_num_only(self):
        # token_filter/alpha_num_only.rs:165-171
        f = tokenize_whitespace(pd.Series(["hello 123 world! déjà ok2"]))
        assert toks(filter_alpha_num_only(f)) == ["hello", "123", "ok2"]

    def test_remove_long(self):
        # token_filter/remove_long.rs:227-243: limit 10 keeps byte-len <= 9
        f = tokenize_whitespace(
            pd.Series(["short 123456789 1234567890 exactlyten"])
        )
        assert toks(filter_remove_long(f, 10)) == ["short", "123456789"]

    def test_remove_long_counts_utf8_bytes(self):
        f = tokenize_whitespace(pd.Series(["ééééé aaaaaaaaa"]))  # 10 bytes, 9
        assert toks(filter_remove_long(f, 10)) == ["aaaaaaaaa"]

    def test_stop_word(self):
        # token_filter/stop_word.rs:342-378
        f = tokenize_simple(pd.Series(["the quick brown fox"]))
        assert toks(filter_stop_word(f, ["the", "a"])) == ["quick", "brown", "fox"]
        assert toks(filter_stop_word(f, None)) == ["the", "quick", "brown", "fox"]

    def test_stemming_english(self):
        # token_filter/stemming.rs:294-307 (Snowball English)
        f = tokenize_simple(pd.Series(["running flies consistently"]))
        assert toks(filter_stemming(f)) == ["run", "fli", "consist"]

    def test_stemming_other_language_gated(self):
        # german now ships (see test_snowball.py); unknown langs still error
        f = tokenize_simple(pd.Series(["laufen"]))
        out = filter_stemming(f, "german")
        assert out["token"].tolist() == ["lauf"]
        with pytest.raises(ValueError):
            filter_stemming(f, "klingon")

    def test_filter_keeps_positions(self):
        # dropped tokens leave positional gaps (tantivy semantics)
        f = tokenize_simple(pd.Series(["the quick the fox"]))
        out = filter_stop_word(f, ["the"])
        assert out[["token", "pos"]].values.tolist() == [["quick", 1], ["fox", 3]]


class TestPorter2:
    def test_vocabulary_pairs(self):
        cases = {
            "consigned": "consign", "consistency": "consist",
            "knackeries": "knackeri", "kneaded": "knead", "knees": "knee",
            "generated": "generat", "generally": "general",
            "generously": "generous", "skies": "sky", "dying": "die",
            "news": "news", "cries": "cri", "arguments": "argument",
            "hopefulness": "hope", "beautifully": "beauti",
            "multiply": "multipli", "running": "run", "hopping": "hop",
            "national": "nation", "relational": "relat",
            "controllable": "control", "agreed": "agre", "feed": "feed",
            "exceed": "exceed", "succeeding": "succeed", "sized": "size",
        }
        assert {w: porter2_stem(w) for w in cases} == cases


class TestAnalyzer:
    def test_reference_default_analyzer_chain(self):
        # examples/meta.json "default": simple → remove_long(40) →
        # ascii_folding → lower_case (order as configured there)
        cfg = {
            "tokenizer": {"name": "simple"},
            "filters": [
                {"name": "remove_long", "args": {"length_limit": 40}},
                {"name": "ascii_folding"},
                {"name": "lower_case"},
            ],
        }
        a = build_analyzer("default", cfg)
        assert a.analyze_one("Rámon's RUST-lang!") == ["ramon", "s", "rust", "lang"]

    def test_builtins(self):
        b = builtin_analyzers()
        assert b["raw"].analyze_one("Hello World!") == ["Hello World!"]
        assert b["default"].analyze_one("Hello World!") == ["hello", "world"]

    def test_build_analyzers_overlay(self):
        out = build_analyzers(
            {"ng": {"tokenizer": {"name": "ngram",
                                  "args": {"min_gram": 2, "max_gram": 2}}}}
        )
        assert set(out) >= {"raw", "default", "ng"}
        assert out["ng"].analyze_one("abc") == ["ab", "bc"]

    def test_unknown_tokenizer_and_filter(self):
        with pytest.raises(ValueError):
            build_analyzer("x", {"tokenizer": {"name": "nope"}})
        with pytest.raises(ValueError):
            build_analyzer(
                "x",
                {"tokenizer": {"name": "simple"}, "filters": [{"name": "nope"}]},
            )

    def test_terms_per_row_alignment(self):
        a = builtin_analyzers()["default"]
        out = a.terms_per_row(pd.Series(["Hello world", "", "Rust"]))
        assert out.tolist() == [["hello", "world"], [], ["rust"]]
