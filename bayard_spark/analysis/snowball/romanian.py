"""Snowball stemmer: Romanian.

Port of the published algorithm (snowballstem.org/algorithms/romanian/
stemmer.html), validated against PostgreSQL dict_snowball golden pairs.
Uses the cedilla forms ş/ţ the upstream algorithm is written in.
"""

from __future__ import annotations

_RO_VOWELS = "aăâeiîou"


def _prelude(word: str) -> str:
    out = list(word)
    n = len(out)
    for i in range(n):
        c = out[i]
        prev_v = i > 0 and out[i - 1] in _RO_VOWELS
        next_v = i + 1 < n and out[i + 1] in _RO_VOWELS
        if c in "ui" and prev_v and next_v:
            out[i] = c.upper()
    return "".join(out)


def _is_v(ch: str) -> bool:
    return ch in _RO_VOWELS


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


def _longest(word: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


_STEP1_GROUPS = [
    (("abilitate", "abilitati", "abilităi", "abilităţi"), "abil"),
    (("ibilitate",), "ibil"),
    (("ivitate", "ivitati", "ivităi", "ivităţi"), "iv"),
    (
        ("icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
         "iciv", "iciva", "icive", "icivi", "icivă", "ical", "icala",
         "icale", "icali", "icală"),
        "ic",
    ),
    (
        ("ativ", "ativa", "ative", "ativi", "ativă", "aţiune", "atoare",
         "ator", "atori", "ătoare", "ător", "ători"),
        "at",
    ),
    (
        ("itiv", "itiva", "itive", "itivi", "itivă", "iţiune", "itoare",
         "itor", "itori"),
        "it",
    ),
]

_STEP2_DELETE = (
    "at ata ată ati ate ut uta ută uti ute it ita ită iti ite ic ica ice "
    "ici ică abil abila abile abili abilă ibil ibila ibile ibili ibilă "
    "oasa oasă oase os osi oşi ant anta ante anti antă ator atori itate "
    "itati ităi ităţi iv iva ive ivi ivă"
).split()
_STEP2_IUNE = ["iune", "iuni"]
_STEP2_IST = "ism isme ist ista iste isti istă işti".split()

# conditional entries: delete only if preceded by a consonant or 'u'
# (itself within RV). Includes the V+se families for V ∈ {a,i,â,u} —
# verified against dict_snowball ('maroase' keeps its suffix via commit
# semantics; 'esem' is not an entry: 'lucresem' → 'lucres').
_STEP3_A = (
    "are ere ire âre ind ând indu ându eze ească ez ezi ează esc eşti "
    "eşte ăsc ăşti ăşte am ai au eam eai eau iam iai iau ui aşi arăm "
    "arăţi ară uşi urăm urăţi ură işi irăm irăţi iră âi âşi ârăm ârăţi "
    "âră "
    + " ".join(
        v + s
        for v in ("a", "i", "â", "u")
        for s in ("se", "sem", "seşi", "serăm", "serăţi", "seră")
    )
).split()
# unconditional entries
_STEP3_B = (
    "im âm ăm em eţi iţi âţi aţi "
    "seşi serăm serăţi seră sei se sesem seseşi sese seserăm seserăţi "
    "seseră"
).split()


def romanian(word: str) -> str:
    # NOTE: the upstream algorithm (and dict_snowball) is written for the
    # cedilla forms ş/ţ; comma-below ș/ț pass through untouched, matching
    # the oracle build exactly.
    word = _prelude(word)
    rv = _rv_of(word)
    r1, r2 = _r1r2(word)

    # step 0: removal of plurals (in R1)
    suf = _longest(
        word,
        ["ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua", "iei",
         "iile", "iilor", "ilor", "ile", "atei", "aţie", "aţia"],
    )
    if suf and len(word) - len(suf) >= r1:
        base = word[: -len(suf)]
        if suf in ("ul", "ului"):
            word = base
        elif suf == "aua":
            word = base + "a"
        elif suf in ("ea", "ele", "elor"):
            word = base + "e"
        elif suf in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
            word = base + "i"
        elif suf == "ile":
            if not base.endswith("ab"):
                word = base + "i"
        elif suf == "atei":
            word = base + "at"
        elif suf in ("aţie", "aţia"):
            word = base + "aţi"

    # step 1: reduction of combining suffixes (repeat)
    standard_removed = False
    while True:
        r1, r2 = _r1r2(word)
        matched = None
        for sufs, repl in _STEP1_GROUPS:
            s = _longest(word, sufs)
            if s and (matched is None or len(s) > len(matched[0])):
                matched = (s, repl)
        if matched and len(word) - len(matched[0]) >= r1:
            word = word[: -len(matched[0])] + matched[1]
            standard_removed = True
            continue
        break

    # step 2: standard suffixes (in R2)
    r1, r2 = _r1r2(word)
    suf = _longest(word, _STEP2_DELETE + _STEP2_IUNE + _STEP2_IST)
    if suf and len(word) - len(suf) >= r2:
        base = word[: -len(suf)]
        if suf in _STEP2_IUNE:
            if base.endswith("ţ"):
                word = base[:-1] + "t"
                standard_removed = True
        elif suf in _STEP2_IST:
            word = base + "ist"
            standard_removed = True
        else:
            word = base
            standard_removed = True

    # step 3: verb suffixes (in RV) — only if steps 1-2 removed nothing.
    # The among runs under a LIMIT at RV: suffixes extending beyond RV are
    # excluded from matching itself (not commit-failures); the longest
    # in-limit entry then commits, and a failed letter-condition fails the
    # whole step.
    if not standard_removed:
        rv = _rv_of(word)
        in_limit = [
            s for s in _STEP3_A + _STEP3_B if len(word) - len(s) >= rv
        ]
        suf = _longest(word, in_limit)
        if suf:
            base = word[: -len(suf)]
            if suf in _STEP3_B:
                word = base
            else:
                k = len(word) - len(suf)
                # preceded by a consonant or 'u', itself within RV
                if (
                    k - 1 >= rv
                    and (not _is_v(word[k - 1]) or word[k - 1] == "u")
                ):
                    word = base

    # step 4: final vowel
    rv = _rv_of(word)
    suf = _longest(word, ["ie", "ia", "a", "e", "i", "ă"])
    if suf and len(word) - len(suf) >= rv:
        word = word[: -len(suf)]

    return word.lower()
