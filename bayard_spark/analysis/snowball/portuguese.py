"""Snowball stemmer: Portuguese.

Port of the published algorithm (snowballstem.org/algorithms/portuguese/
stemmer.html), validated against PostgreSQL dict_snowball golden pairs.
Nasal vowels ã/õ are worked as 'a~'/'o~' internally, as the spec does.
"""

from __future__ import annotations

_PT_VOWELS = "aeiouáéíóúâêô"


def _is_v(ch: str) -> bool:
    return ch in _PT_VOWELS


def _rv_of(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if not _is_v(word[1]):
        for i in range(2, n):
            if _is_v(word[i]):
                return i + 1
        return n
    if _is_v(word[0]) and _is_v(word[1]):
        for i in range(2, n):
            if not _is_v(word[i]):
                return i + 1
        return n
    return 3


def _r1r2(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if not _is_v(word[i]) and _is_v(word[i - 1]):
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_v(word[i]) and _is_v(word[i - 1]):
            r2 = i + 1
            break
    return r1, r2


_S1_DELETE_R2 = (
    "eza ezas ico ica icos icas ismo ismos ável ível ista istas oso osa "
    "osos osas amento amentos imento imentos"
).split()
_S1_ADOR = (
    "adora ador aça~o adoras adores aço~es ante antes ância"
).split()
_S1_LOGIA = ["logia", "logias"]
_S1_UCAO = ["uça~o", "uço~es"]
_S1_ENCIA = ["ência", "ências"]
_S1_IDADE = ["idade", "idades"]
_S1_IVA = ["iva", "ivo", "ivas", "ivos"]
_S1_IRA = ["ira", "iras"]

_STEP2 = (
    "ada ida ia aria eria iria ará ara erá era irá ava asse esse isse "
    "aste este iste ei arei erei irei am iam ariam eriam iriam aram eram "
    "iram avam em arem erem irem assem essem issem ado ido ando endo "
    "indo ara~o era~o ira~o ar er ir as adas idas ias arias erias irias "
    "arás aras erás eras irás avas es ardes erdes irdes ares eres ires "
    "asses esses isses astes estes istes is ais aríeis eríeis "
    "iríeis áreis areis éreis ereis íreis ireis ásseis ésseis ísseis "
    "áveis íeis eu iu ou ira iras amos "
    "áramos éramos íramos ávamos íamos aríamos eríamos iríamos "
    "emos aremos eremos iremos ássemos êssemos íssemos imos "
    "armos ermos irmos"
).split()

_STEP4 = ["os", "a", "i", "o", "á", "í", "ó"]


def _longest(word: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def portuguese(word: str) -> str:
    word = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_of(word)
    r1, r2 = _r1r2(word)

    def in_rv(w, s):
        return len(w) - len(s) >= rv

    def in_r1(w, s):
        return len(w) - len(s) >= r1

    def in_r2(w, s):
        return len(w) - len(s) >= r2

    step1_done = False
    suf = _longest(
        word,
        _S1_DELETE_R2 + _S1_ADOR + _S1_LOGIA + _S1_UCAO + _S1_ENCIA
        + ["amente", "mente"] + _S1_IDADE + _S1_IVA + _S1_IRA,
    )
    if suf:
        base = word[: -len(suf)]
        if suf in _S1_DELETE_R2:
            if in_r2(word, suf):
                word, step1_done = base, True
        elif suf in _S1_ADOR:
            # unlike Spanish/Italian, NO 'ic' follow-up here (verified:
            # dict_snowball keeps 'comunic' for 'comunicações')
            if in_r2(word, suf):
                word, step1_done = base, True
        elif suf in _S1_LOGIA:
            if in_r2(word, suf):
                word, step1_done = base + "log", True
        elif suf in _S1_UCAO:
            if in_r2(word, suf):
                word, step1_done = base + "u", True
        elif suf in _S1_ENCIA:
            if in_r2(word, suf):
                word, step1_done = base + "ente", True
        elif suf == "amente":
            if in_r1(word, suf):
                word, step1_done = base, True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for t in ("os", "ic", "ad"):
                        if word.endswith(t) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif suf == "mente":
            if in_r2(word, suf):
                word, step1_done = base, True
                for t in ("ante", "avel", "ível"):
                    if word.endswith(t) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif suf in _S1_IDADE:
            if in_r2(word, suf):
                word, step1_done = base, True
                for t in ("abil", "ic", "iv"):
                    if word.endswith(t) and len(word) - len(t) >= r2:
                        word = word[: -len(t)]
                        break
        elif suf in _S1_IVA:
            if in_r2(word, suf):
                word, step1_done = base, True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in _S1_IRA:
            if in_rv(word, suf) and base.endswith("e"):
                word, step1_done = base[:-1] + "eir", True

    step2_done = False
    if not step1_done:
        suf = _longest(word, _STEP2)
        if suf and in_rv(word, suf):
            word = word[: -len(suf)]
            step2_done = True

    if step1_done or step2_done:
        # step 3
        if word.endswith("i") and len(word) - 1 >= rv and word[:-1].endswith("c"):
            word = word[:-1]
    else:
        # step 4: residual suffix
        suf = _longest(word, _STEP4)
        if suf and in_rv(word, suf):
            word = word[: -len(suf)]

    # step 5
    if word[-1:] in ("e", "é", "ê") and len(word) - 1 >= rv:
        word = word[:-1]
        if word.endswith("gu") and len(word) - 1 >= rv:
            word = word[:-1]
        elif word.endswith("ci") and len(word) - 1 >= rv:
            word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")
