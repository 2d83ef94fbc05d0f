"""Token-level fidelity of analysis/cjk.py vs published Lindera (MeCab
ipadic) segmentations — TWO metrics (ADVICE r4):

- tests/data/cjk_lindera_golden.tsv — the reference repo's own lindera.rs
  test sentence, the Lindera README examples, and canonical MeCab demos.
  Their vocabulary informed the bundled lexicon, so this measures
  IN-VOCABULARY fidelity (how well the greedy matcher reproduces ipadic
  once the words are known), not held-out generalization.
- tests/data/cjk_lindera_heldout.tsv — 40 everyday sentences with
  standard MeCab/ipadic segmentations, originally held out. Measured
  0.661 against the r4 segmenter, then consumed by r5 tuning — DEV.
- tests/data/cjk_lindera_heldout2.tsv — 40 sentences written blind
  after the r5 morphology layer froze, measured ONCE against it:
  macro token-F1 0.850, exact 21/40 (the honest r5 number). The r6
  Viterbi-lattice rewrite then tuned on its misses, so it is now
  DEV2 — no longer a held-out claim.
- tests/data/cjk_lindera_heldout3.tsv — 40 fresh sentences written
  after the r6 lattice froze, measured ONCE against it: macro 0.932,
  exact 28/40. A vocabulary-growth pass (motivated by its miss
  CATEGORIES) then made it DEV3 — no longer a held-out claim.
- tests/data/cjk_lindera_heldout4.tsv — 40 FRESH sentences written
  after the r6 vocabulary growth froze, segmentations fixed before the
  first run, measured ONCE: macro 0.933, exact 29/40. This is the
  honest current generalization number — note it matches heldout3's
  pre-growth 0.932: two independent blind draws agree the method's
  ceiling on fresh text is ~0.93 (fresh text always carries new OOV;
  in-distribution dev sets all measure 1.000). Never tune on misses
  from this file; if the segmenter changes, retire it to dev and write
  a new blind set.

Reports per-sentence token multiset F1 and the macro average per set.

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

_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data",
)
GOLDEN = os.path.join(_DATA, "cjk_lindera_golden.tsv")
HELDOUT = os.path.join(_DATA, "cjk_lindera_heldout.tsv")
HELDOUT2 = os.path.join(_DATA, "cjk_lindera_heldout2.tsv")
HELDOUT3 = os.path.join(_DATA, "cjk_lindera_heldout3.tsv")
HELDOUT4 = os.path.join(_DATA, "cjk_lindera_heldout4.tsv")


def sentence_f1(got: list[str], want: list[str]) -> float:
    g, w = Counter(got), Counter(want)
    tp = sum((g & w).values())
    if tp == 0:
        return 0.0
    prec, rec = tp / max(sum(g.values()), 1), tp / max(sum(w.values()), 1)
    return 2 * prec * rec / (prec + rec)


def measure(path: str = GOLDEN, dict_type: str = "ipadic",
            mode: str = "normal"):
    rows = []
    with open(path) as f:
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


def report(path: str, label: str, verbose: bool = True) -> float:
    scores = measure(path)
    if verbose:
        for text, got, want, f1 in scores:
            mark = "OK  " if f1 == 1.0 else f"{f1:.2f}"
            print(f"{mark} {text}")
            if f1 < 1.0:
                print(f"     got  {'|'.join(got)}")
                print(f"     want {'|'.join(want)}")
    macro = sum(f1 for *_, f1 in scores) / len(scores)
    exact = sum(1 for *_, f1 in scores if f1 == 1.0)
    print(f"{label}: macro token-F1 {macro:.3f}; "
          f"exact {exact}/{len(scores)}\n")
    return macro


def main() -> None:
    report(GOLDEN, "in-vocabulary (lexicon saw these words)")
    report(HELDOUT, "dev (held-out until the r5 morphology layer)")
    report(HELDOUT2, "dev2 (was the r5 blind set; consumed by r6 tuning)")
    report(HELDOUT3, "dev3 (was the r6 lattice blind set; consumed by "
                     "the vocabulary-growth pass)")
    report(HELDOUT4, "HELD-OUT (blind; written after the r6 vocabulary "
                     "growth froze)")


if __name__ == "__main__":
    main()
