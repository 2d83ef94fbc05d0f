"""Token filters, vectorized over the token-frame representation.

Each filter takes and returns the token frame produced by
``bayard_spark.analysis.tokenizers`` (columns idx/token/pos[/start/end]).
Filters never reassign positions — a dropped token leaves a positional gap,
exactly as tantivy's filters behave (positions are assigned by the tokenizer).

Reference semantics:
- lower_case     bayard/src/index/token_filter/lower_case.rs:79-81
- ascii_folding  bayard/src/index/token_filter/ascii_folding.rs:110-112
                 (Lucene ASCIIFoldingFilter table; we derive the Latin
                 portion from Unicode NFKD decompositions + supplements)
- alpha_num_only bayard/src/index/token_filter/alpha_num_only.rs:141-143
- remove_long    bayard/src/index/token_filter/remove_long.rs:178-198
                 (drops tokens whose UTF-8 byte length >= limit; default 80)
- stemming       bayard/src/index/token_filter/stemming.rs:249-265
                 (Snowball; English/Porter2 implemented, other languages are
                 declared-but-gated — see stemmer.py)
- stop_word      bayard/src/index/token_filter/stop_word.rs:314-334
"""

from __future__ import annotations

import functools
import sys
import unicodedata

import pandas as pd


DEFAULT_REMOVE_LONG_LIMIT = 80  # token_filter/remove_long.rs default

# Languages the reference's stemming filter accepts (docs/analyzers.md:229).
SNOWBALL_LANGUAGES = {
    "arabic", "danish", "dutch", "english", "finnish", "french", "german",
    "greek", "hungarian", "italian", "norwegian", "portuguese", "romanian",
    "russian", "spanish", "swedish", "tamil", "turkish",
}


@functools.lru_cache(maxsize=1)
def _ascii_fold_table() -> dict[int, str]:
    """Codepoint → ASCII replacement map in the spirit of Lucene's
    ASCIIFoldingFilter: Latin letters with diacritics fold to their base
    letters; everything without an ASCII base (CJK etc.) is left untouched.

    Built from NFKD decompositions over the Latin blocks plus explicit
    supplements for non-decomposable letters.
    """
    table: dict[int, str] = {}
    for cp in list(range(0x00C0, 0x2500)):
        ch = chr(cp)
        cat = unicodedata.category(ch)
        if not cat.startswith("L"):
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        base = "".join(c for c in decomp if not unicodedata.combining(c))
        if base != ch and base and all(ord(c) < 128 for c in base):
            table[cp] = base
    supplements = {
        "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
        "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
        "þ": "th", "Þ": "TH", "ħ": "h", "Ħ": "H", "ł": "l", "Ł": "L",
        "ŉ": "n", "ı": "i", "ĸ": "q", "ƒ": "f",
    }
    for k, v in supplements.items():
        table[ord(k)] = v
    return table


def filter_lower_case(frame: pd.DataFrame) -> pd.DataFrame:
    out = frame.copy()
    out["token"] = out["token"].str.lower()
    return out


def filter_ascii_folding(frame: pd.DataFrame) -> pd.DataFrame:
    out = frame.copy()
    out["token"] = out["token"].str.translate(_ascii_fold_table())
    return out


def filter_alpha_num_only(frame: pd.DataFrame) -> pd.DataFrame:
    mask = frame["token"].str.fullmatch(r"[A-Za-z0-9]+").fillna(False)
    return frame[mask].reset_index(drop=True)


def filter_remove_long(
    frame: pd.DataFrame, length_limit: int = DEFAULT_REMOVE_LONG_LIMIT
) -> pd.DataFrame:
    # reference keeps tokens with UTF-8 byte length < limit
    # (test at token_filter/remove_long.rs:227-243: limit 10 keeps len <= 9)
    blen = frame["token"].str.encode("utf-8").str.len()
    return frame[blen < length_limit].reset_index(drop=True)


def filter_stop_word(
    frame: pd.DataFrame, words: list[str] | None = None
) -> pd.DataFrame:
    if not words:  # reference default: empty stop list (stop_word.rs:314-334)
        return frame
    return frame[~frame["token"].isin(set(words))].reset_index(drop=True)


def filter_stemming(frame: pd.DataFrame, language: str = "english") -> pd.DataFrame:
    language = (language or "english").lower()
    if language not in SNOWBALL_LANGUAGES:
        raise ValueError(f"unsupported stemming language: {language}")
    from bayard_spark.analysis.snowball import STEMMERS

    stem = STEMMERS.get(language)
    if stem is None:
        raise NotImplementedError(
            f"the '{language}' Snowball stemmer is declared in the reference "
            "(docs/analyzers.md:229) but not yet ported — see "
            "bayard_spark.analysis.snowball for the implemented set"
        )
    out = frame.copy()
    # Vectorize by stemming the (much smaller) unique vocabulary once and
    # broadcasting with a dict map — O(|vocab|) Python, O(n) C-level map.
    vocab = pd.unique(out["token"])
    mapping = {w: stem(w) for w in vocab}
    out["token"] = out["token"].map(mapping)
    return out


FILTERS = {
    "lower_case": filter_lower_case,
    "ascii_folding": filter_ascii_folding,
    "alpha_num_only": filter_alpha_num_only,
    "remove_long": filter_remove_long,
    "stemming": filter_stemming,
    "stop_word": filter_stop_word,
}
