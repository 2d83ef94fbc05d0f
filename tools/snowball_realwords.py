"""Real-word held-out validation for the FITTED Snowball ports
(turkish / arabic / greek / tamil — VERDICT r4 Next #8).

The 100% claims for these languages were scoped to probe suites
(structured prefix×stem×suffix grids + random strings, fitted until 0
mismatches). This harness measures agreement on REAL word types —
common vocabulary in natural inflected forms (tools/snowball_vocab/
real/<lang>.txt) that were never part of any fitting grid — against the
PostgreSQL dict_snowball oracle (the same upstream Snowball algorithms
the reference's rust-stemmers compiles; server setup in
tools/snowball_check.py).

Run with the postgres oracle up:
    python tools/snowball_realwords.py            # report agreement
    python tools/snowball_realwords.py --dump     # pin goldens to
                                                  # tests/data/snowball/
                                                  # <lang>_realwords.tsv

The dumped TSVs are checked OFFLINE by tests/test_snowball.py (no
postgres needed at test time), so the real-word agreement is pinned as
a regression like every other golden set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayard_spark.analysis.snowball import STEMMERS  # noqa: E402
from tools.snowball_check import pg_stem  # noqa: E402

LANGS = ["turkish", "arabic", "greek", "tamil"]
HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(os.path.dirname(HERE), "tests", "data", "snowball")


def load_words(lang: str) -> list[str]:
    path = os.path.join(HERE, "snowball_vocab", "real", f"{lang}.txt")
    with open(path) as f:
        words = [w.strip() for w in f if w.strip()]
    seen, uniq = set(), []
    for w in words:
        if w not in seen:
            seen.add(w)
            uniq.append(w)
    return uniq


def main() -> None:
    dump = "--dump" in sys.argv
    for lang in LANGS:
        fn = STEMMERS.get(lang)
        if fn is None:
            from bayard_spark.analysis.snowball import tamil

            fn = tamil.stem if lang == "tamil" else None
        words = load_words(lang)
        expected = pg_stem(lang, words)
        bad = [
            (w, fn(w), e) for w, e in zip(words, expected) if fn(w) != e
        ]
        pct = 100 * (1 - len(bad) / max(len(words), 1))
        print(f"{lang}: {len(words)} real words, {len(bad)} mismatches "
              f"({pct:.2f}% agreement)")
        for w, got, exp in bad[:20]:
            print(f"  {w!r}: got {got!r} want {exp!r}")
        if dump:
            out = os.path.join(DATA, f"{lang}_realwords.tsv")
            with open(out, "w") as f:
                for w, e in zip(words, expected):
                    f.write(f"{w}\t{e}\n")
            print(f"  wrote {len(words)} golden pairs to {out}")


if __name__ == "__main__":
    main()
