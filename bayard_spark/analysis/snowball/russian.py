"""Snowball stemmer: Russian.

Port of the published algorithm (snowballstem.org/algorithms/russian/
stemmer.html), validated against PostgreSQL dict_snowball golden pairs.
All suffix matching happens inside RV (the step's cursor is limited to RV),
with Snowball `among` semantics: longest match commits; a failed condition
fails the whole among.
"""

from __future__ import annotations

_RU_VOWELS = "аеиоуыэюя"

_PERF_GERUND_1 = ["в", "вши", "вшись"]          # must follow а/я
_PERF_GERUND_2 = ["ив", "ивши", "ившись", "ыв", "ывши", "ывшись"]
_REFLEXIVE = ["ся", "сь"]
_ADJECTIVE = (
    "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому их ых "
    "ую юю ая яя ою ею"
).split()
_PARTICIPLE_1 = ["ем", "нн", "вш", "ющ", "щ"]   # must follow а/я
_PARTICIPLE_2 = ["ивш", "ывш", "ующ"]
_VERB_1 = (
    "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно"
).split()                                        # must follow а/я
_VERB_2 = (
    "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло ено "
    "ят ует уют ит ыт ены ить ыть ишь ую ю"
).split()
_NOUN = (
    "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием ем ам "
    "ом о у ах иях ях ы ь ию ью ю ия ья я"
).split()


def _regions(word: str) -> tuple[int, int]:
    rv = len(word)
    for i, ch in enumerate(word):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in _RU_VOWELS and word[i - 1] in _RU_VOWELS:
            r1 = i + 1
            break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in _RU_VOWELS and word[i - 1] in _RU_VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _longest(word: str, groups: list[tuple[list[str], bool]], rv: int):
    """Longest among across groups → (suffix, needs_preceding_a_ya) or None.
    The suffix must lie inside RV (the step's cursor limit)."""
    best = None
    for sufs, cond in groups:
        for s in sufs:
            if word.endswith(s) and len(word) - len(s) >= rv:
                if best is None or len(s) > len(best[0]):
                    best = (s, cond)
    return best


def _try_delete(word: str, groups, rv: int) -> tuple[str, bool]:
    m = _longest(word, groups, rv)
    if m is None:
        return word, False
    suf, needs_ay = m
    if needs_ay:
        k = len(word) - len(suf)
        if k == 0 or word[k - 1] not in "ая" or k - 1 < rv:
            return word, False
        return word[: -len(suf)], True
    return word[: -len(suf)], True


def russian(word: str) -> str:
    word = word.replace("ё", "е")
    rv, r2 = _regions(word)
    if rv >= len(word):
        return word

    # step 1
    w, done = _try_delete(
        word, [(_PERF_GERUND_1, True), (_PERF_GERUND_2, False)], rv
    )
    if done:
        word = w
    else:
        w, _ = _try_delete(word, [(_REFLEXIVE, False)], rv)
        word = w
        w, adj = _try_delete(word, [(_ADJECTIVE, False)], rv)
        if adj:
            word = w
            w, _ = _try_delete(
                word, [(_PARTICIPLE_1, True), (_PARTICIPLE_2, False)], rv
            )
            word = w
        else:
            w, verb = _try_delete(
                word, [(_VERB_1, True), (_VERB_2, False)], rv
            )
            if verb:
                word = w
            else:
                w, _ = _try_delete(word, [(_NOUN, False)], rv)
                word = w

    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # step 3: derivational (in R2)
    for s in ("ость", "ост"):
        if word.endswith(s) and len(word) - len(s) >= r2:
            word = word[: -len(s)]
            break

    # step 4
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        m = None
        for s in ("ейше", "ейш"):
            if word.endswith(s) and len(word) - len(s) >= rv:
                m = s
                break
        if m:
            word = word[: -len(m)]
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word
