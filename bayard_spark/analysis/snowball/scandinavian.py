"""Snowball stemmers: Danish, Norwegian, Swedish.

Ports of the published algorithm descriptions
(snowballstem.org/algorithms/{danish,norwegian,swedish}/stemmer.html),
validated against PostgreSQL dict_snowball golden pairs.
"""

from __future__ import annotations

from bayard_spark.analysis.snowball._base import longest_suffix, r1_of

# ---------------------------------------------------------------- danish

_DA_VOWELS = "aeiouyæåø"
_DA_S_ENDINGS = set("abcdfghjklmnoprtvyzå")
_DA_STEP1 = (
    "hed ethed ered e erede ende erende ene erne ere en heden eren er heder "
    "erer heds es endes erendes enes ernes eres ens hedens erens et eret "
    "ets erets ers"
).split()
_DA_STEP3 = ["ig", "lig", "elig", "els"]


def _da_r1(word: str) -> int:
    # the region before R1 must hold at least 3 letters
    return max(r1_of(word, _DA_VOWELS), min(3, len(word)))


def danish(word: str) -> str:
    if len(word) <= 2:
        return word
    r1 = _da_r1(word)
    # step 1
    suf = longest_suffix(word, _DA_STEP1, r1)
    if suf:
        word = word[: -len(suf)]
    elif (
        len(word) - 1 >= r1
        and word.endswith("s")
        and len(word) >= 2
        and word[-2] in _DA_S_ENDINGS
    ):
        word = word[:-1]
    # step 2: consonant pair gd dt gt kt (pair inside R1) → drop last letter
    r1 = _da_r1(word)
    if len(word) - 2 >= r1 and word[-2:] in ("gd", "dt", "gt", "kt"):
        word = word[:-1]
    # step 3
    if word.endswith("igst"):
        word = word[:-2]
    r1 = _da_r1(word)
    if word.endswith("løst") and len(word) - 1 >= r1:
        word = word[:-1]
    else:
        suf = longest_suffix(word, _DA_STEP3, r1)
        if suf:
            word = word[: -len(suf)]
            r1 = _da_r1(word)
            if len(word) - 2 >= r1 and word[-2:] in ("gd", "dt", "gt", "kt"):
                word = word[:-1]
    # step 4: undouble — double consonant whose LAST char is in R1
    # (unlike step 2, the pair may straddle the R1 boundary: 'spiss'→'spis')
    r1 = _da_r1(word)
    if (
        len(word) >= 2
        and len(word) - 1 >= r1
        and word[-1] == word[-2]
        and word[-1] not in _DA_VOWELS
    ):
        word = word[:-1]
    return word


# -------------------------------------------------------------- norwegian

_NO_VOWELS = "aeiouyæåø"
_NO_S_ENDINGS = set("bcdfghjlmnoprtvyz")
_NO_STEP1_DEL = (
    "a e ede ande ende ane ene hetene en heten ar er heter as es edes "
    "endes enes hetenes ens hetens ers ets et het ast"
).split()
_NO_STEP1_ER = ["ert", "erte"]
_NO_STEP3 = "leg eleg ig eig lig elig els lov elov slov hetslov".split()


def _no_r1(word: str) -> int:
    return max(r1_of(word, _NO_VOWELS), min(3, len(word)))


def norwegian(word: str) -> str:
    if len(word) <= 2:
        return word
    r1 = _no_r1(word)
    # step 1 — longest among (delete | erte/ert→er | s after valid ending)
    cands = []
    suf = longest_suffix(word, _NO_STEP1_DEL, r1)
    if suf:
        cands.append((len(suf), "del", suf))
    suf = longest_suffix(word, _NO_STEP1_ER, r1)
    if suf:
        cands.append((len(suf), "er", suf))
    if (
        len(word) - 1 >= r1
        and word.endswith("s")
        and len(word) >= 2
        and (
            word[-2] in _NO_S_ENDINGS
            or (word[-2] == "k" and (len(word) < 3 or word[-3] not in _NO_VOWELS))
        )
    ):
        cands.append((1, "del", "s"))
    if cands:
        _, action, suf = max(cands)
        if action == "del":
            word = word[: -len(suf)]
        else:
            word = word[: -len(suf)] + "er"
    # step 2: dt or vt (pair inside R1) → drop last letter
    r1 = _no_r1(word)
    if len(word) - 2 >= r1 and word[-2:] in ("dt", "vt"):
        word = word[:-1]
    # step 3
    r1 = _no_r1(word)
    suf = longest_suffix(word, _NO_STEP3, r1)
    if suf:
        word = word[: -len(suf)]
    return word


# ---------------------------------------------------------------- swedish

_SV_VOWELS = "aeiouyäåö"
_SV_S_ENDINGS = set("bcdfghjklmnoprtvy")
_SV_STEP1 = (
    "a arna erna heterna orna ad e ade ande arne are aste en anden aren "
    "heten ern ar er heter or as arnas ernas ornas es ades andes ens arens "
    "hetens erns at andet het ast"
).split()
_SV_STEP3_DEL = ["lig", "ig", "els"]


def _sv_r1(word: str) -> int:
    return max(r1_of(word, _SV_VOWELS), min(3, len(word)))


def swedish(word: str) -> str:
    if len(word) <= 2:
        return word
    r1 = _sv_r1(word)
    # step 1
    suf = longest_suffix(word, _SV_STEP1, r1)
    if suf:
        word = word[: -len(suf)]
    elif (
        len(word) - 1 >= r1
        and word.endswith("s")
        and len(word) >= 2
        and word[-2] in _SV_S_ENDINGS
    ):
        word = word[:-1]
    # step 2: dd gd nn dt gt kt tt (pair inside R1) → drop last letter
    r1 = _sv_r1(word)
    if len(word) - 2 >= r1 and word[-2:] in (
        "dd", "gd", "nn", "dt", "gt", "kt", "tt"
    ):
        word = word[:-1]
    # step 3
    r1 = _sv_r1(word)
    if word.endswith("fullt") and len(word) - 1 >= r1:
        word = word[:-1]
    elif word.endswith("löst") and len(word) - 1 >= r1:
        word = word[:-1]
    else:
        suf = longest_suffix(word, _SV_STEP3_DEL, r1)
        if suf:
            word = word[: -len(suf)]
    return word
