"""Snowball stemmer: Hungarian.

Port of the published algorithm (snowballstem.org/algorithms/hungarian/
stemmer.html), validated against PostgreSQL dict_snowball golden pairs.
"""

from __future__ import annotations

_HU_VOWELS = "aáeéiíoóöőuúüű"
_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "sz", "ty", "zs")
_DOUBLES = (
    "bb cc ccs dd ff gg ggy jj kk ll lly mm nn nny pp rr ss ssz tt tty "
    "vv zz zzs"
).split()


def _r1_of(word: str) -> int:
    n = len(word)
    if not word:
        return 0
    if word[0] in _HU_VOWELS:
        # after the first consonant or digraph
        i = 1
        while i < n:
            if word[i] not in _HU_VOWELS:
                for d in ("dzs",) + _DIGRAPHS:
                    if word.startswith(d, i):
                        return i + len(d)
                return i + 1
            i += 1
        return n
    # begins with consonant: after the first vowel
    for i in range(1, n):
        if word[i] in _HU_VOWELS:
            return i + 1
    return n


def _longest(word: str, sufs, start: int) -> str | None:
    best = None
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= start:
            if best is None or len(s) > len(best):
                best = s
    return best


def _ends_double(word: str) -> str | None:
    for d in sorted(_DOUBLES, key=len, reverse=True):
        if word.endswith(d):
            return d
    return None


def _undouble(word: str) -> str:
    """Drop the doubling letter: bb→b, ccs→cs, ssz→sz, ggy→gy."""
    d = _ends_double(word)
    if d is None:
        return word
    return word[: -len(d)] + d[1:]


_CASE = (
    "ban ben ba be ra re nak nek val vel tól től ról ről ból ből hoz hez "
    "höz nál nél ig at et ot öt ért képp képpen kor ul ül vá vé onként "
    "enként anként ként en on an ön n t"
).split()
_OWNED = ["oké", "öké", "aké", "eké", "ké", "éi", "é", "áké", "áéi",
          "éké", "ééi", "éé"]
_SING_OWNER = (
    "ünk unk nk juk jük uk ük em om am m od ed ad öd d ja je a e o "
    "ánk ájuk ám ád á énk éjük ém éd é"
).split()
_PLUR_OWNER = (
    "jaim jeim aim eim im jaid jeid aid eid id jai jei ai ei i jaink "
    "jeink eink aink ink jaitok jeitek aitok eitek itek jeik jaik aik "
    "eik ik áim áid ái áink áitok áik éim éid éi éink éitek éik"
).split()
_PLURAL = ["ák", "ék", "ök", "ok", "ek", "ak", "k"]


def hungarian(word: str) -> str:
    r1 = _r1_of(word)

    # step 1: instrumental case — al/el in R1 preceded by double consonant
    suf = _longest(word, ["al", "el"], r1)
    if suf:
        base = word[:-2]
        if _ends_double(base):
            word = _undouble(base)

    # step 2: frequent cases
    r1 = _r1_of(word)
    suf = _longest(word, _CASE, r1)
    if suf:
        word = word[: -len(suf)]
        if word.endswith("á"):
            word = word[:-1] + "a"
        elif word.endswith("é"):
            word = word[:-1] + "e"

    # step 3: special cases (án/ánként → a, én → e)
    r1 = _r1_of(word)
    suf = _longest(word, ["án", "ánként", "én"], r1)
    if suf in ("án", "ánként"):
        word = word[: -len(suf)] + "a"
    elif suf == "én":
        word = word[:-2] + "e"

    # step 4: other cases
    r1 = _r1_of(word)
    suf = _longest(word, ["astul", "estül", "ástul", "éstül", "stul", "stül"], r1)
    if suf in ("astul", "estül", "stul", "stül"):
        word = word[: -len(suf)]
    elif suf == "ástul":
        word = word[:-5] + "a"
    elif suf == "éstül":
        word = word[:-5] + "e"

    # step 5: factive case — á/é in R1 preceded by double consonant
    r1 = _r1_of(word)
    suf = _longest(word, ["á", "é"], r1)
    if suf:
        base = word[:-1]
        if _ends_double(base):
            word = _undouble(base)

    # step 6: owned
    r1 = _r1_of(word)
    suf = _longest(word, _OWNED, r1)
    if suf in ("áké", "áéi"):
        word = word[: -len(suf)] + "a"
    elif suf in ("éké", "ééi", "éé"):
        word = word[: -len(suf)] + "e"
    elif suf:
        word = word[: -len(suf)]

    # step 7: singular owner suffixes
    r1 = _r1_of(word)
    suf = _longest(word, _SING_OWNER, r1)
    if suf:
        if suf in ("ánk", "ájuk", "ám", "ád", "á"):
            word = word[: -len(suf)] + "a"
        elif suf in ("énk", "éjük", "ém", "éd", "é"):
            word = word[: -len(suf)] + "e"
        else:
            word = word[: -len(suf)]

    # step 8: plural owner suffixes
    r1 = _r1_of(word)
    suf = _longest(word, _PLUR_OWNER, r1)
    if suf:
        if suf.startswith("á"):
            word = word[: -len(suf)] + "a"
        elif suf.startswith("é"):
            word = word[: -len(suf)] + "e"
        else:
            word = word[: -len(suf)]

    # step 9: plural
    r1 = _r1_of(word)
    suf = _longest(word, _PLURAL, r1)
    if suf == "ák":
        word = word[:-2] + "a"
    elif suf == "ék":
        word = word[:-2] + "e"
    elif suf:
        word = word[: -len(suf)]

    return word
