"""Snowball stemmer golden tests.

Fixtures in tests/data/snowball/<lang>.tsv hold (word, expected-stem) pairs
generated from PostgreSQL's dict_snowball — the upstream Snowball algorithms
compiled into postgres, i.e. the same public algorithms the reference's
rust-stemmers uses (bayard/src/index/token_filter/stemming.rs:249-265).
Regenerate with: python tools/snowball_check.py <lang> --dump-golden <tsv>.
"""

import os

import pandas as pd
import pytest

from bayard_spark.analysis.filters import filter_stemming
from bayard_spark.analysis.snowball import STEMMERS

DATA = os.path.join(os.path.dirname(__file__), "data", "snowball")
LANGS = sorted(
    f[:-4]
    for f in os.listdir(DATA)
    if f.endswith(".tsv") and not f.endswith("_realwords.tsv")
)
# Real-word held-out sets for the FITTED stemmers (VERDICT r4 Next #8):
# natural inflected vocabulary never part of any fitting grid, oracle
# answers pinned from postgres dict_snowball via
# tools/snowball_realwords.py --dump. 100% agreement measured for all
# four at pin time.
REALWORD_LANGS = sorted(
    f[: -len("_realwords.tsv")]
    for f in os.listdir(DATA)
    if f.endswith("_realwords.tsv")
)


def load_pairs(lang):
    with open(os.path.join(DATA, f"{lang}.tsv")) as f:
        return [tuple(line.rstrip("\n").split("\t")) for line in f if line.strip()]


@pytest.mark.parametrize("lang", LANGS)
def test_golden_pairs(lang):
    stem = STEMMERS[lang]
    pairs = load_pairs(lang)
    assert len(pairs) > 500
    bad = [(w, stem(w), e) for w, e in pairs if stem(w) != e]
    assert not bad, f"{lang}: {len(bad)}/{len(pairs)} mismatches, first: {bad[:5]}"


@pytest.mark.parametrize("lang", REALWORD_LANGS)
def test_realword_heldout_pairs(lang):
    stem = STEMMERS[lang]
    with open(os.path.join(DATA, f"{lang}_realwords.tsv")) as f:
        pairs = [
            tuple(line.rstrip("\n").split("\t")) for line in f if line.strip()
        ]
    assert len(pairs) > 100
    bad = [(w, stem(w), e) for w, e in pairs if stem(w) != e]
    assert not bad, (
        f"{lang} real-word agreement regressed: {len(bad)}/{len(pairs)}"
        f" mismatches, first: {bad[:5]}"
    )


@pytest.mark.parametrize("lang", LANGS)
def test_filter_stemming_accepts_language(lang):
    frame = pd.DataFrame({"idx": [0], "token": ["universal"], "pos": [0]})
    out = filter_stemming(frame, language=lang)
    assert len(out) == 1


def test_unknown_language_rejected():
    frame = pd.DataFrame({"idx": [0], "token": ["x"], "pos": [0]})
    with pytest.raises(ValueError):
        filter_stemming(frame, language="klingon")


def test_not_yet_ported_language_gated():
    # languages the reference declares that are not yet ported raise a
    # clear NotImplementedError (docs/analyzers.md:229 lists 18)
    from bayard_spark.analysis.filters import SNOWBALL_LANGUAGES

    frame = pd.DataFrame({"idx": [0], "token": ["x"], "pos": [0]})
    for lang in SNOWBALL_LANGUAGES:
        if lang in STEMMERS:
            continue
        with pytest.raises(NotImplementedError):
            filter_stemming(frame, language=lang)
