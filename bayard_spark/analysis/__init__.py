"""Vectorized analysis pipelines (tokenizers + token filters).

Reference semantics: bayard/src/index/tokenizer/{raw,simple,whitespace,ngram}.rs
and bayard/src/index/token_filter/{lower_case,ascii_folding,alpha_num_only,
remove_long,stemming,stop_word}.rs, configured from JSON as in
bayard/src/index/analyzer.rs:115-226.

Everything operates on pandas objects (whole Arrow batches), never per-row
Python in the Spark hot path.
"""

from bayard_spark.analysis.analyzer import Analyzer, build_analyzer
from bayard_spark.analysis.tokenizers import (
    tokenize_facet,
    tokenize_ngram,
    tokenize_raw,
    tokenize_simple,
    tokenize_whitespace,
)

__all__ = [
    "Analyzer",
    "build_analyzer",
    "tokenize_raw",
    "tokenize_simple",
    "tokenize_whitespace",
    "tokenize_ngram",
    "tokenize_facet",
]
