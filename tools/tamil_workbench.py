"""Tamil reverse-derivation workbench against the postgres snowball oracle.

Generates structured + random legal-script Tamil probes, diffs the
experimental port (analysis/snowball/tamil.py) against
ts_lexize('tamil_nostop', w), and buckets mismatches by
(stripped-by-oracle, stripped-by-us) so rule gaps show up as classes, not
anecdotes. Same method that closed turkish/arabic/greek (memory notes).

Usage:
  python tools/tamil_workbench.py random 20000 [seed]   # random legal script
  python tools/tamil_workbench.py grid                  # stem x suffix grid
  python tools/tamil_workbench.py words w1 w2 ...       # ad-hoc oracle peek
"""

from __future__ import annotations

import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayard_spark.analysis.snowball.tamil import tamil  # noqa: E402
from tools.snowball_check import pg_stem  # noqa: E402

CONS = list("கஙசஞடணதநபமயரலவழளறனஜஷஸஹ")
INDEP_V = list("அஆஇஈஉஊஎஏஐஒஓஔ")
SIGNS = list("ாிீுூெேைொோௌ")
PULLI = "்"

SUFFIXES = [
    # plural / case
    "கள்", "ங்கள்", "க்கள்", "ை", "யை", "னை", "ில்", "ின்", "ால்",
    "ிலிருந்து", "ிருந்து", "ுடைய", "ிடம்", "ோடு", "ுக்கு", "க்கு",
    # clitics
    "ும்", "ா", "ே", "ோ", "ாவது", "ாக", "ாகிய", "ான",
    # tense + person
    "கிறேன்", "கிறான்", "கிறாள்", "கிறார்", "கிறது", "கிறோம்",
    "கிறீர்கள்", "கிறார்கள்", "ந்தேன்", "ந்தான்", "ந்தது", "ந்து",
    "த்தேன்", "த்தான்", "த்தது", "த்து", "ப்பேன்", "ப்பான்", "ப்பது",
    "வேன்", "வான்", "வது", "க்க", "ய",
]

STEMS = [
    "புத்தக", "வீடு", "கதை", "மரம்", "கடல்", "பால்", "தெரு", "ஆறு",
    "அவன்", "பட", "செய்", "வா", "போ", "பார்", "எடு", "கொடு",
]


def rand_word(rng: random.Random) -> str:
    """A legal-script pseudo-word: syllables (C[sign]|indep-V), optional
    final pulli — the same generator family the greek/turkish fits used."""
    n = rng.randint(2, 6)
    out = []
    for i in range(n):
        if i == 0 and rng.random() < 0.25:
            out.append(rng.choice(INDEP_V))
            continue
        c = rng.choice(CONS)
        r = rng.random()
        if r < 0.55:
            out.append(c + rng.choice(SIGNS))
        elif r < 0.8:
            out.append(c)  # inherent 'a'
        else:
            out.append(c + PULLI)
    w = "".join(out)
    if rng.random() < 0.5:
        w += rng.choice(SUFFIXES)
    return w


def bucket(word: str, got: str, want: str) -> str:
    import os.path as _p  # noqa: F401

    cp = os.path.commonprefix([word, want])
    oracle_strip = word[len(cp):] or "-"
    oracle_add = want[len(cp):] or "-"
    cp2 = os.path.commonprefix([word, got])
    our_strip = word[len(cp2):] or "-"
    our_add = got[len(cp2):] or "-"
    return f"oracle[-{oracle_strip}+{oracle_add}] ours[-{our_strip}+{our_add}]"


def run(words: list[str], show: int = 6) -> None:
    want = pg_stem("tamil", words)
    bad = [(w, tamil(w), e) for w, e in zip(words, want) if tamil(w) != e]
    print(f"{len(words)} probes, {len(bad)} mismatches "
          f"({100 * (1 - len(bad) / max(len(words), 1)):.2f}% match)")
    classes = Counter(bucket(w, g, e) for w, g, e in bad)
    by_class: dict[str, list] = {}
    for w, g, e in bad:
        by_class.setdefault(bucket(w, g, e), []).append((w, g, e))
    for cls, n in classes.most_common(25):
        print(f"\n[{n:5d}] {cls}")
        for w, g, e in by_class[cls][:show]:
            print(f"    {w!r}: got {g!r} want {e!r}")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "random"
    if mode == "random":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
        seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        rng = random.Random(seed)
        words = list(dict.fromkeys(rand_word(rng) for _ in range(n)))
        run(words)
    elif mode == "grid":
        words = [s + suf for s in STEMS for suf in SUFFIXES] + STEMS
        run(words, show=10)
    elif mode == "words":
        ws = sys.argv[2:]
        for w, e in zip(ws, pg_stem("tamil", ws)):
            mark = "OK " if tamil(w) == e else "BAD"
            print(f"{mark} {w!r}: got {tamil(w)!r} want {e!r}")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
