"""Tokenizers, vectorized over pandas Series of strings.

The canonical token-stream representation is a pandas DataFrame with columns

    idx   : int64   positional index of the source row within the batch
    token : object  token text
    pos   : int64   token position (index among emitted tokens, per source row)

Byte offsets (``start``/``end`` columns) are only materialized when
``offsets=True`` — they exist solely so unit tests can assert the reference's
exact offset expectations (e.g. bayard/src/index/tokenizer/simple.rs:12-29);
the index itself stores positions, never offsets, so the hot path skips them.

Reference semantics reproduced:
- raw:        whole value = single token, pos 0
              (bayard/src/index/tokenizer/raw.rs:63-65)
- simple:     split on runs of non-alphanumeric chars (Unicode), punctuation
              dropped (bayard/src/index/tokenizer/simple.rs:3-5, test :12-29)
- whitespace: split on whitespace only, punctuation kept
              (bayard/src/index/tokenizer/whitespace.rs:33-35, test :42-59)
- ngram:      char n-grams min..max (codepoints), optional prefix_only,
              position always 0 (bayard/src/index/tokenizer/ngram.rs:89-117)
- facet:      one token per ancestor path of a facet value
              (docs/analyzers.md:81-89)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Split pattern for the `simple` tokenizer: runs of chars that are not
# letter/digit. Rust char::is_alphanumeric ≈ [\p{L}\p{N}]; Python's \w adds
# underscore, so exclude it explicitly. The Spark-builtin / DuckDB parity
# pattern is '[^\\p{L}\\p{N}]+' (same char classes in Java regex and RE2).
SIMPLE_SPLIT_RE = re.compile(r"[\W_]+", re.UNICODE)
SIMPLE_SPLIT_SQL = r"[^\p{L}\p{N}]+"
WHITESPACE_SPLIT_RE = re.compile(r"\s+", re.UNICODE)
WHITESPACE_SPLIT_SQL = r"\s+"


def _empty_frame(offsets: bool) -> pd.DataFrame:
    cols = {
        "idx": pd.Series([], dtype="int64"),
        "token": pd.Series([], dtype="object"),
        "pos": pd.Series([], dtype="int64"),
    }
    if offsets:
        cols["start"] = pd.Series([], dtype="int64")
        cols["end"] = pd.Series([], dtype="int64")
    return pd.DataFrame(cols)


def _split_tokenize(
    s: pd.Series, pattern: re.Pattern, offsets: bool
) -> pd.DataFrame:
    """Vectorized split-based tokenization with emitted-token positions."""
    s = s.fillna("").astype(str).reset_index(drop=True)
    if len(s) == 0:
        return _empty_frame(offsets)
    if not offsets:
        ex = s.str.split(pattern.pattern, regex=True).explode()
        frame = pd.DataFrame({"idx": ex.index.to_numpy(), "token": ex.to_numpy()})
        frame = frame[frame["token"].astype(bool)]  # drop '' boundary artifacts
        frame["pos"] = frame.groupby("idx").cumcount()
        return frame.reset_index(drop=True)
    # Offsets path (tests only): byte offsets into the UTF-8 encoding, as the
    # reference asserts (tokenizer tests check offset_from/offset_to in bytes).
    rows_idx: list[int] = []
    toks: list[str] = []
    poss: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    for i, text in enumerate(s):
        pos = 0
        # token spans = complement of separator-match spans
        last = 0
        spans: list[tuple[int, int]] = []
        for m in pattern.finditer(text):
            if m.start() > last:
                spans.append((last, m.start()))
            last = m.end()
        if last < len(text):
            spans.append((last, len(text)))
        for a, b in spans:
            # byte offsets
            start_b = len(text[:a].encode("utf-8"))
            end_b = start_b + len(text[a:b].encode("utf-8"))
            rows_idx.append(i)
            toks.append(text[a:b])
            poss.append(pos)
            starts.append(start_b)
            ends.append(end_b)
            pos += 1
    return pd.DataFrame(
        {"idx": rows_idx, "token": toks, "pos": poss, "start": starts, "end": ends}
    )


def tokenize_simple(s: pd.Series, offsets: bool = False) -> pd.DataFrame:
    """Split on non-alphanumeric runs; 'hello world!' → hello, world."""
    return _split_tokenize(s, SIMPLE_SPLIT_RE, offsets)


def tokenize_whitespace(s: pd.Series, offsets: bool = False) -> pd.DataFrame:
    """Split on whitespace runs only; 'hello world!' → hello, world!"""
    return _split_tokenize(s, WHITESPACE_SPLIT_RE, offsets)


def tokenize_raw(s: pd.Series, offsets: bool = False) -> pd.DataFrame:
    """Whole value = single token at pos 0 (empty string emits no token,
    matching tantivy's RawTokenizer behaviour on empty input)."""
    s = s.fillna("").astype(str).reset_index(drop=True)
    mask = s.astype(bool)
    frame = pd.DataFrame(
        {
            "idx": np.flatnonzero(mask.to_numpy()),
            "token": s[mask].to_numpy(),
        }
    )
    frame["pos"] = 0
    if offsets:
        frame["start"] = 0
        frame["end"] = frame["token"].str.encode("utf-8").str.len().astype("int64")
    return frame


def tokenize_ngram(
    s: pd.Series,
    min_gram: int = 1,
    max_gram: int = 2,
    prefix_only: bool = False,
    offsets: bool = False,
) -> pd.DataFrame:
    """Char n-grams over codepoints; every token has pos 0.

    Defaults (1, 2, false) per bayard/src/index/tokenizer/ngram.rs:89-117;
    docs/analyzers.md:62-79. Emission order matches tantivy's NgramTokenizer:
    for each start offset (0.. or just 0 if prefix_only), each gram size
    min..=max that fits.
    """
    if min_gram < 1 or min_gram > max_gram:
        raise ValueError("ngram requires 1 <= min_gram <= max_gram")
    s = s.fillna("").astype(str).reset_index(drop=True)
    rows_idx: list[np.ndarray] = []
    toks: list[pd.Series] = []
    starts: list[np.ndarray] = []
    ends_cp: list[np.ndarray] = []
    lens = s.str.len().to_numpy()
    max_start = 1 if prefix_only else (int(lens.max()) if len(lens) else 0)
    for a in range(max_start if prefix_only else int(lens.max() or 0)):
        for n in range(min_gram, max_gram + 1):
            mask = lens >= a + n
            if not mask.any():
                continue
            sub = s[mask].str[a : a + n]
            rows_idx.append(np.flatnonzero(mask))
            toks.append(sub)
            starts.append(np.full(mask.sum(), a, dtype="int64"))
            ends_cp.append(np.full(mask.sum(), a + n, dtype="int64"))
    if prefix_only and len(lens):
        # only a == 0 wanted; the loop above already restricted via max_start
        pass
    if not toks:
        return _empty_frame(offsets)
    frame = pd.DataFrame(
        {
            "idx": np.concatenate(rows_idx),
            "token": pd.concat(toks, ignore_index=True).to_numpy(),
            "_a": np.concatenate(starts),
            "_b": np.concatenate(ends_cp),
        }
    )
    # reproduce tantivy emission order: by row, then start offset, then size
    frame = frame.sort_values(
        ["idx", "_a", "_b"], kind="stable", ignore_index=True
    )
    frame["pos"] = 0
    if offsets:
        # byte offsets: recompute from codepoint slices (tests only)
        texts = s.to_numpy()
        frame["start"] = [
            len(texts[i][:a].encode("utf-8"))
            for i, a in zip(frame["idx"], frame["_a"])
        ]
        frame["end"] = [
            len(texts[i][:b].encode("utf-8"))
            for i, b in zip(frame["idx"], frame["_b"])
        ]
    return frame.drop(columns=["_a", "_b"])


def tokenize_facet(s: pd.Series, offsets: bool = False) -> pd.DataFrame:
    """Facet path '/language/rust' → tokens '/language', '/language/rust'.

    One token per ancestor path including the full path, excluding the root
    (docs/analyzers.md:81-89). All positions 0.
    """
    s = s.fillna("").astype(str).reset_index(drop=True)
    rows_idx: list[int] = []
    toks: list[str] = []
    for i, v in enumerate(s):
        if not v or v == "/":
            continue
        parts = [p for p in v.split("/") if p]
        acc = ""
        for p in parts:
            acc += "/" + p
            rows_idx.append(i)
            toks.append(acc)
    frame = pd.DataFrame({"idx": rows_idx, "token": toks})
    frame["pos"] = 0
    if offsets:
        frame["start"] = 0
        frame["end"] = frame["token"].str.encode("utf-8").str.len().astype("int64")
    return frame


def tokenize_lindera(s: pd.Series, **kw) -> pd.DataFrame:
    """CJK segmentation (lindera config surface) — see analysis/cjk.py."""
    from bayard_spark.analysis.cjk import tokenize_lindera as _impl

    return _impl(s, **kw)


TOKENIZERS = {
    "raw": tokenize_raw,
    "simple": tokenize_simple,
    "whitespace": tokenize_whitespace,
    "ngram": tokenize_ngram,
    "facet": tokenize_facet,
    "lindera": tokenize_lindera,
}
