"""Snowball stemmer: Spanish.

Port of the published algorithm (snowballstem.org/algorithms/spanish/
stemmer.html), validated against PostgreSQL dict_snowball golden pairs.
"""

from __future__ import annotations

_ES_VOWELS = "aeiouáéíóúü"


def _is_v(ch: str) -> bool:
    return ch in _ES_VOWELS


def _rv_of(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if not _is_v(word[1]):
        # consonant in 2nd position: after the next vowel
        for i in range(2, n):
            if _is_v(word[i]):
                return i + 1
        return n
    if _is_v(word[0]) and _is_v(word[1]):
        # two vowels: after the next consonant
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


_PRONOUNS = (
    "me se sela selo selas selos la le lo las les los nos".split()
)
_PRON_PRE_A = ["iéndo", "ándo", "ár", "ér", "ír"]   # unaccent after removal
_PRON_PRE_B = ["ando", "iendo", "ar", "er", "ir"]
_UNACCENT = str.maketrans("áéíóú", "aeiou")

_S1_DELETE_R2 = (
    "anza anzas ico ica icos icas ismo ismos able ables ible ibles ista "
    "istas oso osa osos osas amiento amientos imiento imientos"
).split()
_S1_ADOR = (
    "adora ador ación adoras adores aciones ante antes ancia ancias"
).split()
_S1_LOGIA = ["logía", "logías"]
_S1_UCION = ["ución", "uciones"]
_S1_ENCIA = ["encia", "encias"]
_S1_IDAD = ["idad", "idades"]
_S1_IVA = ["iva", "ivo", "ivas", "ivos"]

_STEP2A = (
    "ya ye yan yen yeron yendo yo yó yas yes yais yamos"
).split()
_STEP2B_GU = ["en", "es", "éis", "emos"]
_STEP2B = (
    "arían arías arán arás aríais aría aréis aríamos aremos ará aré "
    "erían erías erán erás eríais ería eréis eríamos eremos erá eré "
    "irían irías irán irás iríais iría iréis iríamos iremos irá iré "
    "aba ada ida ía ara iera ad ed id ase iese aste iste an aban ían "
    "aran ieran asen iesen aron ieron ado ido ando iendo ió ar er ir as "
    "abas adas idas ías aras ieras ases ieses ís áis abais íais arais "
    "ierais aseis ieseis asteis isteis ados idos amos ábamos íamos "
    "imos áramos iéramos iésemos ásemos"
).split()
_STEP3_RV = ["os", "a", "o", "á", "í", "ó"]


def _longest(word: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def spanish(word: str) -> str:
    rv = _rv_of(word)
    r1, r2 = _r1r2(word)

    def in_rv(w, s):
        return len(w) - len(s) >= rv

    def in_r1(w, s):
        return len(w) - len(s) >= r1

    def in_r2(w, s):
        return len(w) - len(s) >= r2

    # step 0: attached pronoun
    suf = _longest(word, _PRONOUNS)
    if suf:
        base = word[: -len(suf)]
        pre = _longest(base, _PRON_PRE_A + _PRON_PRE_B + ["yendo"])
        if pre and len(base) - len(pre) >= rv:
            if pre == "yendo":
                k = len(base) - len(pre)
                if k >= 1 and base[k - 1] == "u":
                    word = base
            elif pre in _PRON_PRE_A:
                word = base.translate(_UNACCENT)
            else:
                word = base

    # step 1: standard suffix removal
    step1_done = False
    suf = _longest(
        word,
        _S1_DELETE_R2 + _S1_ADOR + _S1_LOGIA + _S1_UCION + _S1_ENCIA
        + ["amente", "mente"] + _S1_IDAD + _S1_IVA,
    )
    if suf:
        base = word[: -len(suf)]
        if suf in _S1_DELETE_R2:
            if in_r2(word, suf):
                word, step1_done = base, True
        elif suf in _S1_ADOR:
            if in_r2(word, suf):
                word, step1_done = base, True
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in _S1_LOGIA:
            if in_r2(word, suf):
                word, step1_done = base + "log", True
        elif suf in _S1_UCION:
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
                for t in ("ante", "able", "ible"):
                    if word.endswith(t) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif suf in _S1_IDAD:
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

    # step 2a: verb suffixes beginning y (preceded by u)
    step2_done = False
    if not step1_done:
        suf = _longest(word, _STEP2A)
        if suf and in_rv(word, suf):
            k = len(word) - len(suf)
            if k >= 1 and word[k - 1] == "u":
                word = word[: -len(suf)]
                step2_done = True
        if not step2_done:
            # step 2b
            suf = _longest(word, _STEP2B + _STEP2B_GU)
            if suf and in_rv(word, suf):
                word = word[: -len(suf)]
                if suf in _STEP2B_GU and word.endswith("gu"):
                    word = word[:-1]

    # step 3: residual
    suf = _longest(word, _STEP3_RV + ["e", "é"])
    if suf in _STEP3_RV:
        if in_rv(word, suf):
            word = word[: -len(suf)]
    elif suf in ("e", "é"):
        if in_rv(word, suf):
            word = word[:-1]
            if word.endswith("gu") and len(word) - 1 >= rv:
                word = word[:-1]

    return word.translate(_UNACCENT)
