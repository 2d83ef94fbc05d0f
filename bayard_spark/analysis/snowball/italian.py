"""Snowball stemmer: Italian.

Port of the published algorithm (snowballstem.org/algorithms/italian/
stemmer.html), validated against PostgreSQL dict_snowball golden pairs.
"""

from __future__ import annotations

_IT_VOWELS = "aeiouàèìòù"
_ACUTE2GRAVE = str.maketrans("áéíóú", "àèìòù")


def _prelude(word: str) -> str:
    word = word.translate(_ACUTE2GRAVE)
    out = list(word)
    n = len(out)
    for i in range(n):
        c = out[i]
        prev_v = i > 0 and out[i - 1] in _IT_VOWELS
        next_v = i + 1 < n and out[i + 1] in _IT_VOWELS
        if c in "ui" and prev_v and next_v:
            out[i] = c.upper()
        elif c == "u" and i > 0 and out[i - 1] == "q":
            out[i] = "U"
    return "".join(out)


def _is_v(ch: str) -> bool:
    return ch in _IT_VOWELS


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


_PRONOUNS = (
    "ci gli la le li lo mi ne si ti vi sene gliela gliele glieli glielo "
    "gliene mela mele meli melo mene tela tele teli telo tene cela cele "
    "celi celo cene vela vele veli velo vene"
).split()

_S1_DELETE_R2 = (
    "anza anze ico ici ica ice iche ichi ismo ismi abile abili ibile "
    "ibili ista iste isti istà istè istì oso osi osa ose mente atrice "
    "atrici ante anti"
).split()
_S1_AZIONE = ["azione", "azioni", "atore", "atori"]
_S1_LOGIA = ["logia", "logie"]
_S1_UZIONE = ["uzione", "uzioni", "usione", "usioni"]
_S1_ENZA = ["enza", "enze"]
_S1_AMENTO = ["amento", "amenti", "imento", "imenti"]
_S1_ITA = ["ità"]
_S1_IVO = ["ivo", "ivi", "iva", "ive"]

_STEP2 = (
    "ammo ando ano are arono asse assero assi assimo ata ate ati ato ava "
    "avamo avano avate avi avo emmo enda ende endi endo erà erai eranno "
    "ere erebbe erebbero erei eremmo eremo ereste eresti erete erò erono "
    "essero ete eva evamo evano evate evi evo Yamo iamo immo irà irai "
    "iranno ire irebbe irebbero irei iremmo iremo ireste iresti irete "
    "irò irono isca iscano isce isci isco iscono issero ita ite iti ito "
    "iva ivamo ivano ivate ivi ivo ono uta ute uti uto ar ir"
).split()


def _longest(word: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def italian(word: str) -> str:
    word = _prelude(word)
    rv = _rv_of(word)
    r1, r2 = _r1r2(word)

    def in_rv(w, s):
        return len(w) - len(s) >= rv

    def in_r1(w, s):
        return len(w) - len(s) >= r1

    def in_r2(w, s):
        return len(w) - len(s) >= r2

    # step 0: attached pronoun — preceded by ando/endo (delete) or
    # ar/er/ir (replace with e), the preceding part in RV
    suf = _longest(word, _PRONOUNS)
    if suf:
        base = word[: -len(suf)]
        pre = _longest(base, ["ando", "endo", "ar", "er", "ir"])
        if pre and len(base) - len(pre) >= rv:
            if pre in ("ando", "endo"):
                word = base
            else:
                word = base + "e"

    # step 1
    step1_done = False
    suf = _longest(
        word,
        _S1_DELETE_R2 + _S1_AZIONE + _S1_LOGIA + _S1_UZIONE + _S1_ENZA
        + _S1_AMENTO + ["amente"] + _S1_ITA + _S1_IVO,
    )
    if suf:
        base = word[: -len(suf)]
        if suf == "amente":
            if in_r1(word, suf):
                word, step1_done = base, True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for t in ("os", "ic"):
                        if word.endswith(t) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
                    else:
                        if word.endswith("abil") and len(word) - 4 >= r2:
                            word = word[:-4]
        elif suf in _S1_DELETE_R2:
            if in_r2(word, suf):
                word, step1_done = base, True
                if suf == "mente":
                    pass
        elif suf in _S1_AZIONE:
            if in_r2(word, suf):
                word, step1_done = base, True
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in _S1_LOGIA:
            if in_r2(word, suf):
                word, step1_done = base + "log", True
        elif suf in _S1_UZIONE:
            if in_r2(word, suf):
                word, step1_done = base + "u", True
        elif suf in _S1_ENZA:
            if in_r2(word, suf):
                word, step1_done = base + "ente", True
        elif suf in _S1_AMENTO:
            if in_rv(word, suf):
                word, step1_done = base, True
        elif suf in _S1_ITA:
            if in_r2(word, suf):
                word, step1_done = base, True
                for t in ("abil", "ic", "iv"):
                    if word.endswith(t) and len(word) - len(t) >= r2:
                        word = word[: -len(t)]
                        break
        elif suf in _S1_IVO:
            if in_r2(word, suf):
                word, step1_done = base, True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= r2:
                        word = word[:-2]

    # step 2 (if step 1 removed nothing)
    if not step1_done:
        suf = _longest(word, _STEP2)
        if suf and in_rv(word, suf):
            word = word[: -len(suf)]

    # step 3a: final vowel, then a preceding i (both in RV)
    if word[-1:] in "aeioàèìò" and len(word) - 1 >= rv:
        word = word[:-1]
        if word.endswith("i") and len(word) - 1 >= rv:
            word = word[:-1]
    # step 3b: ch/gh → c/g in RV
    if (
        (word.endswith("ch") or word.endswith("gh"))
        and len(word) - 1 >= rv
    ):
        word = word[:-1]

    return word.lower()
