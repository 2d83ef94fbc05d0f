"""Shared helpers for the pure-Python Snowball stemmers.

The reference's stemming filter accepts 18 Snowball languages
(bayard/src/index/token_filter/stemming.rs:249-265; docs/analyzers.md:229).
No stemming package ships in this environment, so each language is a hand
port of the PUBLIC Snowball algorithm description (snowballstem.org).
Every port is pinned by golden (word → stem) fixtures generated from
PostgreSQL's dict_snowball (the same upstream algorithms compiled into
postgres) — see tests/data/snowball/ and tests/test_snowball.py.
"""

from __future__ import annotations


def r1_of(word: str, vowels: str) -> int:
    """Start index of R1: after the first non-vowel following a vowel."""
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return len(word)


def r2_of(word: str, vowels: str, r1: int | None = None) -> int:
    """Start index of R2: R1 of the R1 region."""
    if r1 is None:
        r1 = r1_of(word, vowels)
    sub = word[r1:]
    for i in range(1, len(sub)):
        if sub[i] not in vowels and sub[i - 1] in vowels:
            return r1 + i + 1
    return len(word)


def longest_suffix(word: str, suffixes, start: int = 0) -> str | None:
    """Longest suffix of `word` from `suffixes` fully inside word[start:].

    Snowball's `among` picks the longest matching entry; region checks apply
    to the whole suffix (it must lie inside the region).
    """
    best = None
    for s in suffixes:
        if word.endswith(s) and len(word) - len(s) >= start:
            if best is None or len(s) > len(best):
                best = s
    return best
