"""Byte-pair-encoding subword tokenizer: distributed training + encoding.

Training-data pipelines tokenize the corpus before packing context windows
(functions/chunking.py); this module provides the classic BPE algorithm
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare Words
with Subword Units" — the subword-nmt reference implementation's semantics)
re-expressed for Spark:

- ``train_bpe``: word-frequency statistics are ONE distributed word-count
  ``groupBy`` (partial-agg friendly — the shuffle carries word TYPES, not
  corpus tokens), capped to the ``max_word_types`` most frequent types with
  a deterministic tie-break, then the merge loop runs driver-side over the
  capped type table with incremental pair-count maintenance (the
  subword-nmt indexing trick: only words containing the merged pair are
  re-scanned).  The cap is the documented sampling rule — at web scale the
  type table is Zipf-truncated, which is how production tokenizers (GPT-2,
  SentencePiece on samples) are actually trained; the cap bounds driver
  memory to O(max_word_types), NOT O(corpus).
- ``bpe_encode``: applies a learned merge table to every document.  The
  per-word merge loop is not expressible as a fixed-depth column
  expression, so it runs in ``mapInPandas`` with a capped PER-TASK
  UNIQUE-WORD memo: the Python merge loop runs once per distinct word
  (Zipf-sublinear), while the unavoidable O(corpus tokens) fan-out stays
  C-level (findall / factorize / numpy indexing / chain — no per-token
  Python bytecode).  The merge table itself rides the task closure
  (≤ num_merges rows — a 32k-merge vocabulary is a few hundred KB).

Determinism contract (shared with the DuckDB twin in __spark_entry__.py):

- pre-tokenization: ``lower(text)`` split on ``[^\\p{L}\\p{N}]+``, empty
  tokens dropped (the same rule as functions/textstats.py TOKEN_SPLIT);
- a word's initial symbol sequence is its characters followed by a
  terminal ``</w>`` symbol;
- training picks, each round, the pair with the highest summed frequency,
  ties broken by (left ASC, right ASC). NOTE (deliberate divergence,
  ADVICE r6): subword-nmt's ``max(stats, key=lambda x: (stats[x], x))``
  breaks frequency ties by the LARGEST pair instead; on tied corpora a
  model trained here can differ from a subword-nmt-trained one. The ASC
  tie-break is kept because the DuckDB twin replays it (ORDER BY left,
  right) and the gate bit-compares 12 unrolled rounds against it — the
  counting/merge semantics themselves match subword-nmt exactly;
  occurrence counting is positional (``aaa`` contributes (a,a) twice),
  exactly subword-nmt's ``get_stats``;
- encoding repeatedly merges ALL occurrences (leftmost-nonoverlapping) of
  the lowest-rank pair present until no learned pair remains.

Beyond-the-reference operator: mosuka/bayard tokenizes with tantivy
analyzers (no subword model); BPE is the training-data-pipeline addition.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from collections.abc import Iterator
from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bayard_spark.functions.textstats import TOKEN_SPLIT

EOW = "</w>"


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — one explode + one groupBy.

    Partial aggregation makes the shuffle carry word TYPES per partition,
    not corpus tokens; this is the only distributed pass training needs.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != ""
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _pairs_of(symbols: tuple[str, ...]) -> Iterator[tuple[str, str]]:
    for i in range(len(symbols) - 1):
        yield (symbols[i], symbols[i + 1])


def _merge_word(
    symbols: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Merge all leftmost-nonoverlapping occurrences of ``pair``."""
    lft, rgt = pair
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == lft and symbols[i + 1] == rgt:
            out.append(lft + rgt)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe_on_types(
    types: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a (word, count) type table.

    Incremental pair-count maintenance: a pair→word index restricts each
    round's rescan to the words that actually contained the merged pair
    (subword-nmt's optimization) — O(affected words), not O(types), per
    round after the first.
    """
    words: list[tuple[str, ...]] = []
    counts: list[int] = []
    for w, c in types:
        words.append(tuple(w) + (EOW,))
        counts.append(int(c))

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, syms in enumerate(words):
        c = counts[idx]
        for p in _pairs_of(syms):
            pair_counts[p] += c
            pair_words[p].add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            key = (-c, p)
            if best is None or key < best[0]:
                best = (key, p)
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        for idx in list(pair_words[pair]):
            old = words[idx]
            new = _merge_word(old, pair)
            c = counts[idx]
            for p in _pairs_of(old):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(idx)
                    if not s:
                        del pair_words[p]
            for p in _pairs_of(new):
                pair_counts[p] += c
                pair_words[p].add(idx)
            words[idx] = new
    return merges


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_word_types: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed word counts → capped type table → driver merge loop.

    The cap keeps, deterministically, the ``max_word_types`` most frequent
    word types (ties by word ASC) — the Zipf truncation every production
    subword trainer applies; driver memory is O(max_word_types) regardless
    of corpus size.
    """
    wc = word_counts(docs, text_col)
    rows = (
        wc.orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_word_types)
        .collect()
    )
    return train_bpe_on_types([(r["word"], r["count"]) for r in rows], num_merges)


def merges_df(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """Materialize a merge list as (rank, left, right) — the model table."""
    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField("left", T.StringType()),
            T.StructField("right", T.StringType()),
        ]
    )
    return spark.createDataFrame(
        [(i + 1, l, r) for i, (l, r) in enumerate(merges)], schema
    )


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Encode one word: repeatedly merge the lowest-rank pair present."""
    syms = tuple(word) + (EOW,)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        prev = None
        for s in syms:
            if prev is not None:
                r = ranks.get((prev, s))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (prev, s)
            prev = s
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair)
    return syms


def bpe_vocab(
    merges: list[tuple[str, str]], alphabet: list[str] | None = None
) -> dict[str, int]:
    """Deterministic token→id table: the (sorted) base alphabet + ``</w>``
    first, then every merge product in rank order — the GPT-2-style vocab
    layout, reproducible from (merges, alphabet) alone with no extra
    state to persist."""
    if alphabet is None:
        alphabet = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
            str(d) for d in range(10)
        ]
    vocab: dict[str, int] = {}
    for sym in sorted(set(alphabet) | {EOW}):
        vocab[sym] = len(vocab)
    for l, r in merges:
        tok = l + r
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    memo_max: int = 4_000_000,
    vocab: dict[str, int] | None = None,
    ids_col: str = "bpe_ids",
    oov_id: int = -1,
) -> DataFrame:
    """Append ``out_col: array<string>`` of BPE tokens per document.

    mapInPandas kernel.  The Python MERGE LOOP runs only once per
    distinct word (a per-task memo, capped at ``memo_max`` entries so an
    adversarial partition — URL soup, hex ids — cannot OOM the worker;
    past the cap words still encode, they just stop being cached).  The
    per-token work, which is inherently O(corpus tokens) because the
    output is, stays at C level: pandas ``str.findall`` tokenization,
    ``pd.factorize`` for the word→code map, numpy fancy indexing to fan
    encoded lists back over the token stream, and ``itertools.chain`` to
    assemble each doc's array — no per-token Python bytecode.  NULL text
    encodes to NULL; token-less text to [].

    With ``vocab`` (see :func:`bpe_vocab`) an ``ids_col: array<int>``
    rides along — tokens outside the vocab map to ``oov_id`` (possible
    only when the corpus alphabet outgrows the vocab's).
    """
    ranks = {p: i for i, p in enumerate(merges)}
    in_schema = docs.schema
    extra = [T.StructField(out_col, T.ArrayType(T.StringType()))]
    if vocab is not None:
        extra.append(T.StructField(ids_col, T.ArrayType(T.IntegerType())))
    out_schema = T.StructType(list(in_schema.fields) + extra)
    # Python-re twin of TOKEN_SPLIT ([^\p{L}\p{N}]+ as a SPLIT): \w is
    # L* ∪ N* ∪ {_}, so the TOKEN pattern [^\W_]+ (word chars minus the
    # underscore) captures exactly the non-empty split pieces.
    tok_pat = r"[^\W_]+"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc_unique(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = list(encode_word(w, ranks))
                if len(memo) < memo_max:
                    memo[w] = got
            return got

        for pdf in batches:
            texts = pdf[text_col]
            notnull = texts.notna().to_numpy()
            out = np.empty(len(pdf), dtype=object)
            out_ids = np.empty(len(pdf), dtype=object)
            if notnull.any():
                words = (
                    texts[notnull].str.lower().str.findall(tok_pat)
                )  # C-regex tokenization
                counts = words.str.len().to_numpy()
                flat = (
                    list(chain.from_iterable(words))
                    if counts.sum()
                    else []
                )
                codes, uniques = pd.factorize(
                    pd.Series(flat, dtype=object), use_na_sentinel=False
                ) if flat else (np.array([], dtype=np.int64), [])
                enc_arr = np.empty(len(uniques), dtype=object)
                ids_arr = np.empty(len(uniques), dtype=object)
                for i, u in enumerate(uniques):  # merge loop: uniques only
                    toks = enc_unique(u)
                    enc_arr[i] = toks
                    if vocab is not None:
                        ids_arr[i] = [vocab.get(t, oov_id) for t in toks]
                tok_enc = enc_arr[codes]  # numpy fan-out over the stream
                bounds = np.concatenate(([0], np.cumsum(counts)))
                spans = list(zip(bounds[:-1], bounds[1:]))
                docs_out = [
                    list(chain.from_iterable(tok_enc[s:e])) for s, e in spans
                ]
                out_nn = np.empty(len(docs_out), dtype=object)
                out_nn[:] = docs_out
                out[notnull] = out_nn
                if vocab is not None:
                    id_enc = ids_arr[codes]
                    ids_out = [
                        list(chain.from_iterable(id_enc[s:e])) for s, e in spans
                    ]
                    ids_nn = np.empty(len(ids_out), dtype=object)
                    ids_nn[:] = ids_out
                    out_ids[notnull] = ids_nn
            out[~notnull] = None
            res = pdf.copy()
            res[out_col] = out
            if vocab is not None:
                out_ids[~notnull] = None
                res[ids_col] = out_ids
            yield res

    return docs.mapInPandas(kernel, out_schema)
