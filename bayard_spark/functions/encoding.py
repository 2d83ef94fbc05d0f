"""Mojibake repair (ftfy-lite): undo UTF-8-bytes-read-as-cp1252 text.

The single most common web-corpus encoding defect: a page's UTF-8 bytes
were decoded as windows-1252 somewhere in the pipeline, turning é into
Ã©, € into â‚¬, — into â€". The exact inverse is a FINITE substitution
table — for every target character c, the corrupted form is
c.encode('utf-8').decode('cp1252') — so repair is table-driven string
replacement, no heuristics and no Python in the data path:

- The table is GENERATED at import time from the codecs themselves
  (Latin-1 supplement + the cp1252-visible punctuation block), sorted
  longest-corruption-first so 3-byte sequences never get half-eaten by
  their 2-byte prefixes. Sequences whose UTF-8 bytes hit one of
  cp1252's five unmapped holes (0x81 0x8D 0x8F 0x90 0x9D) cannot occur
  in cp1252-decoded text and are skipped.
- fix_mojibake is pure JVM: a cheap marker rlike gates the repair, and
  the replacement chain (sequential F.replace, left-to-right,
  non-overlapping — identical semantics to SQL replace()) runs only on
  flagged rows via a lazily-evaluated CASE branch. Zero shuffle; at
  100 TB the cost is the scan plus ~N string passes over the <1% of
  rows that match the marker.
- repair_sql_expr emits the same chain as nested ANSI replace() calls
  from the same table — the DuckDB oracle and the Spark plan share one
  source of truth.

Scope (documented, not silent): one decode generation (doubly-encoded
mojibake needs `passes=2`), cp1252 only (the dominant case; latin-1
differs just in the 0x80–0x9F holes), and no repair of sequences that
were themselves corrupted further (e.g. stripped control bytes).

Reference parity note: the reference engine indexes text as given
(bayard/src/index — no encoding repair); this op serves the
training-data-pipeline surface over the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CP1252_HOLES = {0x81, 0x8D, 0x8F, 0x90, 0x9D}

# cp1252-visible punctuation (U+2018 etc.) + Latin-1 supplement letters
_TARGET_CODEPOINTS = sorted(
    set(range(0x00A1, 0x0100))
    | {
        0x20AC, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021, 0x02C6,
        0x2030, 0x0160, 0x2039, 0x0152, 0x017D, 0x2018, 0x2019, 0x201C,
        0x201D, 0x2022, 0x2013, 0x2014, 0x02DC, 0x2122, 0x0161, 0x203A,
        0x0153, 0x017E, 0x0178,
    }
)


def _build_table() -> list[tuple[str, str]]:
    entries = []
    for cp in _TARGET_CODEPOINTS:
        ch = chr(cp)
        raw = ch.encode("utf-8")
        if any(b in _CP1252_HOLES for b in raw):
            continue
        seq = raw.decode("cp1252")
        entries.append((seq, ch))
    # longest corruption first; then lexicographic for determinism
    entries.sort(key=lambda e: (-len(e[0]), e[0]))
    return entries


MOJIBAKE_TABLE: list[tuple[str, str]] = _build_table()

# cheap pre-filter: every corruption starts with one of these lead chars
MOJIBAKE_MARKER_RE = "[" + "".join(
    sorted({seq[0] for seq, _ in MOJIBAKE_TABLE})
) + "]"


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    passes: int = 1,
    out_col: str = "text_fixed",
) -> DataFrame:
    """df + (out_col, was_mojibake): repair cp1252-mojibake in text_col.

    passes=2 additionally unwinds doubly-encoded text (mojibake of
    mojibake). NULL text stays NULL with was_mojibake false.
    """
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    col = F.col(text_col)
    fixed = col
    for _ in range(passes):
        for seq, ch in MOJIBAKE_TABLE:
            fixed = F.replace(fixed, F.lit(seq), F.lit(ch))
    result = F.when(col.rlike(MOJIBAKE_MARKER_RE), fixed).otherwise(col)
    return df.select(
        "*",
        result.alias(out_col),
        F.coalesce(result != col, F.lit(False)).alias("was_mojibake"),
    )


def repair_sql_expr(col_expr: str, passes: int = 1) -> str:
    """The same repair chain as a nested ANSI-SQL replace() expression
    (DuckDB-compatible) — shares MOJIBAKE_TABLE with fix_mojibake."""
    expr = col_expr
    for _ in range(passes):
        for seq, ch in MOJIBAKE_TABLE:
            s = seq.replace("'", "''")
            c = ch.replace("'", "''")
            expr = f"replace({expr}, '{s}', '{c}')"
    return expr
