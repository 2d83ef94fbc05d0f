"""Token-level fidelity of analysis/cjk.py vs published Lindera (MeCab
ipadic) segmentations.

The golden file tests/data/cjk_lindera_golden.tsv holds sentences whose
true ipadic tokenizations are published (the reference repo's own
lindera.rs test sentence, the Lindera README examples, and canonical MeCab
demonstration sentences). Reports per-sentence token multiset F1 and the
macro average — the honest fidelity number for the dictionary-light
segmenter (VERDICT r3 #6).

Usage: python tools/cjk_fidelity.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from bayard_spark.analysis.cjk import tokenize_lindera  # noqa: E402


def segment_series(s, dict_type="ipadic", mode="normal"):
    frame = tokenize_lindera(s, dict_type=dict_type, mode=mode)
    return [
        frame[frame["idx"] == i]["token"].tolist() for i in range(len(s))
    ]

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "cjk_lindera_golden.tsv",
)


def sentence_f1(got: list[str], want: list[str]) -> float:
    g, w = Counter(got), Counter(want)
    tp = sum((g & w).values())
    if tp == 0:
        return 0.0
    prec, rec = tp / max(sum(g.values()), 1), tp / max(sum(w.values()), 1)
    return 2 * prec * rec / (prec + rec)


def measure(dict_type: str = "ipadic", mode: str = "normal"):
    rows = []
    with open(GOLDEN) as f:
        for line in f:
            text, toks = line.rstrip("\n").split("\t")
            rows.append((text, toks.split("|")))
    got_all = segment_series(
        pd.Series([t for t, _ in rows]), dict_type=dict_type, mode=mode
    )
    scores = []
    for (text, want), got in zip(rows, got_all):
        scores.append((text, got, want, sentence_f1(list(got), want)))
    return scores


def main() -> None:
    scores = measure()
    for text, got, want, f1 in scores:
        mark = "OK  " if f1 == 1.0 else f"{f1:.2f}"
        print(f"{mark} {text}")
        if f1 < 1.0:
            print(f"     got  {'|'.join(got)}")
            print(f"     want {'|'.join(want)}")
    macro = sum(f1 for *_, f1 in scores) / len(scores)
    exact = sum(1 for *_, f1 in scores if f1 == 1.0)
    print(f"\nmacro token-F1 {macro:.3f}; exact {exact}/{len(scores)}")


if __name__ == "__main__":
    main()
