"""Snowball stemmer: French.

Port of the published algorithm (snowballstem.org/algorithms/french/
stemmer.html), validated against PostgreSQL dict_snowball golden pairs.
"""

from __future__ import annotations

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _prelude(word: str) -> str:
    out = list(word)
    n = len(out)
    i = 0
    while i < n:
        c = out[i]
        # already-marked U/I/Y/H are consonants for subsequent tests
        prev_v = i > 0 and out[i - 1] in _FR_VOWELS
        next_v = i + 1 < n and out[i + 1] in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            out[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            out[i] = "Y"
        elif c == "u" and i > 0 and out[i - 1] == "q":
            out[i] = "U"
        elif c == "ë":
            out[i] = "He"
        elif c == "ï":
            out[i] = "Hi"
        i += 1
    return "".join(out)


def _is_v(ch: str) -> bool:
    return ch.lower() in _FR_VOWELS and ch not in "UIY"


def _rv_of(word: str) -> int:
    n = len(word)
    if n >= 3 and _is_v(word[0]) and _is_v(word[1]):
        return 3
    if word[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if _is_v(word[i]):
            return i + 1
    return n


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


_STEP1 = (
    "ance iqUe isme able iste eux ances iqUes ismes ables istes "
    "atrice ateur ation atrices ateurs ations logie logies usion ution "
    "usions utions ence ences ement ements ité ités if ive ifs ives eaux "
    "aux euse euses issement issements amment emment ment ments"
).split()

_STEP2A = (
    "îmes ît îtes i ie ies ir ira irai iraIent irais irait iras irent "
    "irez iriez irions irons iront is issaIent issais issait issant "
    "issante issantes issants isse issent isses issez issiez issions "
    "issons it"
).split()

_STEP2B_IONS = ["ions"]
_STEP2B_E = (
    "é ée ées és èrent er era erai eraIent erais erait eras erez eriez "
    "erions erons eront ez iez"
).split()
_STEP2B_A = (
    "a as ante antes ants ât âmes âtes ai aIent ais ait ant"
).split()


def _longest(word: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def french(word: str) -> str:
    word = _prelude(word)
    rv = _rv_of(word)
    r1, r2 = _r1r2(word)

    orig = word
    step1_done = False
    ment_removed = False

    def in_r2(w, s):
        return len(w) - len(s) >= r2

    def in_r1(w, s):
        return len(w) - len(s) >= r1

    def in_rv(w, s):
        return len(w) - len(s) >= rv

    suf = _longest(word, _STEP1)
    if suf:
        base = word[: -len(suf)]
        if suf in (
            "ance", "iqUe", "isme", "able", "iste", "eux",
            "ances", "iqUes", "ismes", "ables", "istes",
        ):
            if in_r2(word, suf):
                word, step1_done = base, True
        elif suf in (
            "atrice", "ateur", "ation", "atrices", "ateurs", "ations"
        ):
            if in_r2(word, suf):
                word, step1_done = base, True
                if word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if in_r2(word, suf):
                word, step1_done = base + "log", True
        elif suf in ("usion", "ution", "usions", "utions"):
            if in_r2(word, suf):
                word, step1_done = base + "u", True
        elif suf in ("ence", "ences"):
            if in_r2(word, suf):
                word, step1_done = base + "ent", True
        elif suf in ("ement", "ements"):
            if in_rv(word, suf):
                word, step1_done = base, True
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                elif word.endswith("eus"):
                    if len(word) - 3 >= r2:
                        word = word[:-3]
                    elif len(word) - 3 >= r1:
                        word = word[:-3] + "eux"
                elif word.endswith("abl") and len(word) - 3 >= r2:
                    word = word[:-3]
                elif word.endswith("iqU") and len(word) - 3 >= r2:
                    word = word[:-3]
                elif word.endswith("ièr") and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
                elif word.endswith("Ièr") and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
        elif suf in ("ité", "ités"):
            if in_r2(word, suf):
                word, step1_done = base, True
                if word.endswith("abil"):
                    if len(word) - 4 >= r2:
                        word = word[:-4]
                    else:
                        word = word[:-4] + "abl"
                elif word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif suf in ("if", "ive", "ifs", "ives"):
            if in_r2(word, suf):
                word, step1_done = base, True
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic"):
                        if len(word) - 2 >= r2:
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
        elif suf == "eaux":
            word, step1_done = base + "eau", True
        elif suf == "aux":
            if in_r1(word, suf):
                word, step1_done = base + "al", True
        elif suf in ("euse", "euses"):
            if in_r2(word, suf):
                word, step1_done = base, True
            elif in_r1(word, suf):
                word, step1_done = base + "eux", True
        elif suf in ("issement", "issements"):
            if in_r1(word, suf) and base and not _is_v(base[-1]):
                word, step1_done = base, True
        elif suf == "amment":
            if in_rv(word, suf):
                word, ment_removed = base + "ant", True
        elif suf == "emment":
            if in_rv(word, suf):
                word, ment_removed = base + "ent", True
        elif suf in ("ment", "ments"):
            k = len(word) - len(suf)
            if k >= 1 and _is_v(word[k - 1]) and k - 1 >= rv:
                word, ment_removed = base, True

    do_step2 = (not step1_done) or ment_removed
    step2_done = False
    if do_step2:
        # step 2a: suffixes beginning i, preceded by a non-vowel, in RV
        suf = _longest(word, _STEP2A)
        if suf and in_rv(word, suf):
            k = len(word) - len(suf)
            if k >= 1 and not _is_v(word[k - 1]) and k - 1 >= rv:
                word = word[: -len(suf)]
                step2_done = True
        if not step2_done:
            # step 2b
            suf = _longest(word, _STEP2B_IONS + _STEP2B_E + _STEP2B_A)
            if suf and in_rv(word, suf):
                base = word[: -len(suf)]
                if suf == "ions":
                    if in_r2(word, suf):
                        word, step2_done = base, True
                elif suf in _STEP2B_E:
                    word, step2_done = base, True
                else:
                    word, step2_done = base, True
                    if word.endswith("e") and len(word) - 1 >= rv:
                        word = word[:-1]

    if step1_done or step2_done or ment_removed:
        # step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # step 4
        if (
            word.endswith("s")
            and len(word) >= 2
            and word[-2] not in "aiouès"
            and not (word[-2] == "i" and False)
        ):
            # 2019 revision: s is kept after Hi (ï)
            if not word[:-1].endswith("Hi"):
                word = word[:-1]
        suf = _longest(word, ["ion", "ier", "ière", "Ier", "Ière", "e"])
        if suf == "ion":
            if (
                len(word) - 3 >= r2
                and len(word) >= 4
                and word[-4] in "st"
                and len(word) - 4 >= rv
            ):
                word = word[:-3]
        elif suf in ("ier", "ière", "Ier", "Ière"):
            if len(word) - len(suf) >= rv:
                word = word[: -len(suf)] + "i"
        elif suf == "e":
            if len(word) - 1 >= rv:
                word = word[:-1]

    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(end):
            word = word[:-1]
            break

    # step 6: un-accent
    # marked U/I/Y are consonants here: scan past them ('bibliothèqUe'
    # minus e ends qU — è is still un-accented)
    i = len(word) - 1
    seen_nonv = False
    while i >= 0:
        if _is_v(word[i]):
            break
        seen_nonv = True
        i -= 1
    if seen_nonv and i >= 0 and word[i] in "éè":
        word = word[:i] + "e" + word[i + 1 :]

    # postlude
    word = word.replace("He", "ë").replace("Hi", "ï")
    return word.lower()
