"""Context-window chunking: document → fixed-token-budget training chunks.

Two standard shapes, both zero-shuffle (chunking is embarrassingly
row-parallel — every operator here emits chunks from a single document
row, so the plan is scan → project/explode → done; at 100 TB the only
cost is the scan and the output write):

- chunk_tokens_sliding: fixed-size token windows with stride (the
  BERT-style / embedding-prep shape). Pure JVM — split, sequence,
  explode, slice; whole-stage codegen end to end.
- pack_paragraphs_greedy: greedy first-fit packing of paragraphs into
  chunks of ≤ budget tokens, never splitting a paragraph (the document-
  aware pretraining shape — Gopher/MassiveText-style corpora pack on
  natural boundaries). The greedy fold (running count resets at each
  emitted boundary) is NOT prefix-sum decomposable, so it runs in
  mapInPandas; the per-paragraph loop is the accepted per-BLOCK
  granularity (everything else in the kernel is numpy / pandas str ops).

Reference parity note: the reference engine indexes whole documents
(bayard/src/index — no sub-document windows); chunking serves the
training-data-pipeline surface over the same tables.

Token = whitespace-delimited run (same convention as
functions/textstats.token_counts).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_tokens_sliding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): sliding token windows.

    Window i covers tokens [i*stride, i*stride + size); the last window
    may be short but every token is covered. Docs with zero tokens emit
    zero chunks. stride < size ⇒ overlapping windows (the usual
    embedding-prep setting); stride == size ⇒ disjoint blocks.
    """
    if size <= 0 or stride <= 0:
        raise ValueError(f"size and stride must be positive, got {size}/{stride}")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    # number of windows: 1 + ceil(max(n - size, 0) / stride)
    last = F.ceil(
        F.greatest(F.col("_n") - size, F.lit(0)) / F.lit(stride)
    )
    out = (
        df.select(
            F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
        )
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), last)).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.slice(
                "_toks", F.col("chunk_idx") * stride + 1, size
            ).alias("_chunk"),
        )
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.array_join("_chunk", " ").alias("chunk_text"),
        F.size("_chunk").alias("n_tokens"),
    )


def pack_paragraphs_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 64,
    para_sep: str = "\n",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens, n_paras): greedy packing.

    Paragraphs (text split on para_sep, whitespace-only ones dropped)
    are packed in order: a paragraph joins the current chunk unless that
    would push it past `budget` tokens, in which case it starts a new
    chunk. A single paragraph longer than the budget gets its own
    (oversized) chunk — paragraphs are never split. Chunk text re-joins
    its paragraphs with para_sep. Docs with no paragraphs emit nothing.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    id_field = df.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, chunk_idx int, "
        "chunk_text string, n_tokens int, n_paras int"
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_ci, out_tx, out_nt, out_np = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                paras = [p for p in text.split(para_sep) if p.strip()]
                if not paras:
                    continue
                tks = [len(p.split()) for p in paras]
                # greedy fold — per-paragraph, the accepted granularity
                chunk_of = []
                chunk, running = 0, 0
                for tk in tks:
                    if running > 0 and running + tk > budget:
                        chunk += 1
                        running = tk
                    else:
                        running += tk
                    chunk_of.append(chunk)
                for ci in range(chunk + 1):
                    members = [
                        p for p, c in zip(paras, chunk_of) if c == ci
                    ]
                    out_id.append(did)
                    out_ci.append(ci)
                    out_tx.append(para_sep.join(members))
                    out_nt.append(
                        sum(t for t, c in zip(tks, chunk_of) if c == ci)
                    )
                    out_np.append(len(members))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out_id, dtype=pdf[id_col].dtype),
                    "chunk_idx": pd.Series(out_ci, dtype="int32"),
                    "chunk_text": pd.Series(out_tx, dtype="object"),
                    "n_tokens": pd.Series(out_nt, dtype="int32"),
                    "n_paras": pd.Series(out_np, dtype="int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(pack, schema)
