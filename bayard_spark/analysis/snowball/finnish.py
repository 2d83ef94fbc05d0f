"""Snowball stemmer: Finnish.

Port of the published algorithm (snowballstem.org/algorithms/finnish/
stemmer.html), validated against PostgreSQL dict_snowball golden pairs.
"""

from __future__ import annotations

_FI_VOWELS = "aeiouyäö"
_FI_RESTRICTED = "aeiouäö"  # long-vowel test set (no y)
_FI_CONS = "bcdfghjklmnpqrstvwxz"


def _r1r2(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in _FI_VOWELS and word[i - 1] in _FI_VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _FI_VOWELS and word[i - 1] in _FI_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _longest(word: str, sufs, start: int = 0) -> str | None:
    best = None
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= start:
            if best is None or len(s) > len(best):
                best = s
    return best


_STEP1_PARTICLES = ["kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä"]
_STEP2_POSS = ["si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en"]
# step-3 among: most conditions are CONTEXT-EMBEDDED entries (the licensed
# left context is part of the matched string), so failed contexts simply
# fall through to shorter entries like 'n' — verified against
# dict_snowball ('taloitta' → 'taloit', 'talusiin' → 'talus').
# (entry, n_chars_to_remove); None = routine-conditioned, handled in code
_STEP3_ENTRIES: list[tuple[str, int]] = (
    [(v + "isiin", 4) for v in _FI_RESTRICTED]
    + [(v + "iden", 3) for v in _FI_RESTRICTED]
    + [(v + "itten", 4) for v in _FI_RESTRICTED]
    + [(v + v + "seen", 4) for v in _FI_RESTRICTED]
    + [("etta", 3), ("että", 3)]
    + [
        (x, len(x))
        for x in (
            "ta tä ssa ssä sta stä lla llä lta ltä lle na nä ksi ine"
        ).split()
    ]
)
_STEP4 = "mpi mpa mpä mmi mma mmä impi impa impä immi imma immä eja ejä".split()


def finnish(word: str) -> str:
    r1, r2 = _r1r2(word)

    # step 1: particles etc (longest in R1; commit semantics)
    suf = _longest(word, _STEP1_PARTICLES + ["sti"], r1)
    if suf == "sti":
        if len(word) - 3 >= r2:
            word = word[:-3]
    elif suf:
        k = len(word) - len(suf)
        if k >= 1 and word[k - 1] in "ntaeiouyäö":
            word = word[: -len(suf)]

    # step 2: possessives (longest in R1; commit)
    r1, r2 = _r1r2(word)
    suf = _longest(word, _STEP2_POSS, r1)
    if suf == "si":
        if not (len(word) >= 3 and word[-3] == "k"):
            word = word[:-2]
    elif suf == "ni":
        word = word[:-2]
        if word.endswith("kse"):
            word = word[:-1] + "i"
    elif suf in ("nsa", "nsä", "mme", "nne"):
        word = word[: -len(suf)]
    elif suf == "an":
        if word[-4:-2] in ("ta", "na") or word[-5:-2] in (
            "ssa", "sta", "lla", "lta"
        ):
            word = word[:-2]
    elif suf == "än":
        if word[-4:-2] in ("tä", "nä") or word[-5:-2] in (
            "ssä", "stä", "llä", "ltä"
        ):
            word = word[:-2]
    elif suf == "en":
        if word[-5:-2] in ("lle", "ine"):
            word = word[:-2]

    # step 3: cases — limit-filtered longest match over context-embedded
    # entries plus the routine-conditioned 'a'/'ä' (cv) and 'n'
    r1, r2 = _r1r2(word)
    ending_removed = False
    best: tuple[str, int] | None = None
    for entry, rm in _STEP3_ENTRIES:
        if word.endswith(entry) and len(word) - len(entry) >= r1:
            if best is None or len(entry) > len(best[0]):
                best = (entry, rm)
    # routine-conditioned entries (commit on failed condition):
    # hXn for X in aeioäö (NOT u/y — dict_snowball: 'katuhun' keeps 'hun'),
    # a/ä (preceded by cv), n
    for entry in ("han", "hen", "hin", "hon", "hän", "hön", "a", "ä", "n"):
        if word.endswith(entry) and len(word) - len(entry) >= r1:
            if best is None or len(entry) > len(best[0]):
                best = (entry, 0)
    if best:
        entry, rm = best
        if rm:
            word = word[:-rm]
            ending_removed = True
        elif entry in ("han", "hen", "hin", "hon", "hän", "hön"):
            # preceded by the harmonizing vowel X
            if len(word) >= 4 and word[-4] == entry[1]:
                word = word[:-3]
                ending_removed = True
        elif entry in ("a", "ä"):
            # routine: preceded by consonant + vowel (commit on failure)
            if (
                len(word) >= 3
                and word[-2] in _FI_VOWELS
                and word[-3] in _FI_CONS
            ):
                word = word[:-1]
                ending_removed = True
        else:  # 'n'
            word = word[:-1]
            ending_removed = True
            # then: if preceded by LV or ie, delete the last vowel
            if len(word) >= 2 and (
                (word[-1] == word[-2] and word[-1] in _FI_RESTRICTED)
                or word[-2:] == "ie"
            ):
                word = word[:-1]

    # step 4: other endings (longest in R2; commit)
    r1, r2 = _r1r2(word)
    suf = _longest(word, _STEP4, r2)
    if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
        if word[-5:-3] != "po":
            word = word[:-3]
    elif suf:
        word = word[: -len(suf)]

    # step 5: plurals
    r1, r2 = _r1r2(word)
    if ending_removed:
        if word[-1:] in ("i", "j") and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if (
            word.endswith("t")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] in _FI_VOWELS
        ):
            word = word[:-1]
            r1, r2 = _r1r2(word)
            if word.endswith("imma") and len(word) - 4 >= r2:
                word = word[:-4]
            elif (
                word.endswith("mma")
                and len(word) - 3 >= r2
                and word[-5:-3] != "po"
            ):
                word = word[:-3]

    # step 6: tidy
    r1, r2 = _r1r2(word)
    # a) R1 ends LV (the pair inside R1) → remove last letter
    if (
        len(word) >= 2
        and len(word) - 2 >= r1
        and word[-1] == word[-2]
        and word[-1] in _FI_RESTRICTED
    ):
        word = word[:-1]
    # b) R1 ends cX (X in aäei; the pair inside R1) → remove last letter
    r1, r2 = _r1r2(word)
    if (
        len(word) >= 2
        and len(word) - 2 >= r1
        and word[-1] in "aäei"
        and word[-2] in _FI_CONS
    ):
        word = word[:-1]
    # c) oj / uj in R1
    r1, r2 = _r1r2(word)
    if len(word) - 2 >= r1 and word[-2:] in ("oj", "uj"):
        word = word[:-1]
    # d) jo in R1
    r1, r2 = _r1r2(word)
    if len(word) - 2 >= r1 and word[-2:] == "jo":
        word = word[:-1]
    # e) undouble final consonant pair followed by zero or more vowels
    i = len(word) - 1
    while i >= 0 and word[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and word[i] not in _FI_VOWELS and word[i] == word[i - 1]:
        word = word[:i] + word[i + 1 :]
    return word
