"""Text analysis: language ID, quality scoring, token counting,
document fingerprinting. All JVM expressions (whole-stage codegen) — the
hot path of a corpus-cleaning pipeline must not drop to Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword profiles (n-gram-free heuristic language ID:
# fraction of tokens hitting each language's function-word list).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it", "you", "that",
           "was", "for", "on", "are", "with"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein",
           "zu", "den", "von", "sie", "auf", "für"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los",
           "se", "del", "las", "una", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "du",
           "dans", "que", "qui", "pour", "sur"],
}

TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


def _tokens_col(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != ""
    )


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Append (out_col, {out_col}_score): argmax stopword-hit ratio across
    the built-in profiles; 'und' (undetermined) when no profile hits."""
    toks = _tokens_col(text_col)
    df = df.withColumn("_toks", toks)
    scores = []
    for lang, words in LANG_PROFILES.items():
        lit_words = F.array(*[F.lit(w) for w in words])
        hits = F.size(
            F.filter("_toks", lambda t: F.array_contains(lit_words, t))
        )
        ratio = F.when(F.size("_toks") > 0, hits / F.size("_toks")).otherwise(
            F.lit(0.0)
        )
        scores.append(F.struct(ratio.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return (
        df.withColumn(
            out_col,
            F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
        )
        .withColumn(f"{out_col}_score", best["score"])
        .drop("_toks")
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features used by corpus filters:
    n_chars, n_tokens, avg_token_len, distinct_ratio (repetition proxy),
    punct_ratio, digit_ratio, stopword_ratio, plus a composite [0,1]
    quality_score (documented weights — a filter heuristic, not a model)."""
    toks = _tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    distinct_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)) / n_tokens
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")) / n_chars,
    ).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        n_chars > 0, F.regexp_count(F.col(text_col), F.lit(r"[0-9]")) / n_chars
    ).otherwise(F.lit(0.0))
    avg_token_len = F.when(
        n_tokens > 0,
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / n_tokens,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    # composite: reward mid-length docs with healthy stopword share and low
    # repetition; each term clamped to [0,1]
    len_term = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    qscore = F.when(
        n_tokens > 0,
        F.lit(0.3) * len_term
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * distinct_ratio
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(qscore, 6).alias("quality_score"),
    )


BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace and BPE-ish token counts (pretraining budget estimation)."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    )
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias("n_bpe_tokens"),
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    keep: int = 8,
) -> DataFrame:
    """Winnowing-style fingerprint: md5 over the `keep` smallest k-shingle
    hashes — stable under small edits, unlike a whole-text hash."""
    toks = _tokens_col(text_col)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - k + 1, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    kept = F.slice(F.array_sort(sh), 1, keep)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(",", F.transform(kept, lambda h: h.cast("string"))))
        .alias("fingerprint"),
    )
