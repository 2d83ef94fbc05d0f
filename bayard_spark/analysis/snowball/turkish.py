"""Snowball stemmer: Turkish — EXPERIMENTAL, NOT REGISTERED.

Partial reverse-derivation of the published algorithm
(snowballstem.org/algorithms/turkish/stemmer.html, Evren Kapusuz Çilden's
stemmer) against the PostgreSQL dict_snowball oracle. Current agreement:
~76% on the probe suite — BELOW the 100% bar every registered language
meets, so STEMMERS deliberately omits it and filter_stemming('turkish')
raises NotImplementedError. tests/test_turkish_experimental.py pins the
subset of behaviors that WERE verified word-by-word against the oracle.

Known-unimplemented oracle behaviors (measured, for the next iteration):
- d/g-final stems get a harmonized U APPENDED ('kitapd' → 'kitapdı');
- bare dative after 'k' is rejected ('kitapka' stays) though 'l/c/s' allow;
- the (n)U accusative requires the n buffer to be present and valid;
- several chain continuations around lArI/possessives remain unfitted.

Execution model (reverse-derived from the oracle, documented facts only):
- VOWEL HARMONY: take the word's last vowel X; the word is harmonic iff ANY
  earlier vowel belongs to X's class (a←aıou, e←eiöü, ı←aı, i←ei, u←ou,
  ü←öü) — 'güzeldü' harmonizes through the initial ü, 'evdü' does not.
- classes try in a fixed order; a harmony miss falls through to later
  classes; a BUFFER violation on a strict class aborts stemming entirely
  ('kitapydı', 'kitapsı', 'kitapyla', 'kitapnca' all stem to themselves),
  while soft classes ((y)Um, (y)ken …) just fall through.
- buffer letters: y — must follow a vowel, consumed; s — must follow a
  vowel, KEPT ('arabası' → 'arabas'); n — lenient: consumed after a vowel,
  otherwise left as stem material ('arabanın' → 'araba', 'kitapnın' →
  'kitapn'). Bare forms require a preceding consonant outside {y,s,n}.
"""

from __future__ import annotations

_V = "aeıioöuü"
_CLASS = {
    "a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
    "u": "ou", "ü": "öü", "o": "aou", "ö": "öü",
}


class Abort(Exception):
    pass


def _harmonic(word: str) -> bool:
    last = None
    idx = -1
    for i in range(len(word) - 1, -1, -1):
        if word[i] in _V:
            last = word[i]
            idx = i
            break
    if last is None:
        return True
    allowed = _CLASS.get(last, "")
    rest = word[:idx]
    if not any(c in _V for c in rest):
        return True
    return any(c in allowed for c in rest)


_VOICELESS = "fstkçşhp"


class Mark:
    def __init__(self, forms, buf=None, harmony=True, ubuf=False,
                 strict=True, cont=None, bare_consonant=False):
        self.forms = sorted(forms, key=len, reverse=True)
        self.buf = buf
        self.harmony = harmony
        self.ubuf = ubuf
        self.strict = strict
        self.cont = cont or []
        self.bare_consonant = bare_consonant
        self.bare_exclude = "sn"

    def try_strip(self, w: str) -> str | None:
        """Returns stem, or None when this class doesn't apply here.
        Raises Abort for strict buffer violations."""
        f = None
        for c in self.forms:
            if w.endswith(c) and len(w) > len(c):
                f = c
                break
        if f is None:
            return None
        if self.harmony and not _harmonic(w):
            return None
        stem = w[: -len(f)]

        def viol():
            if self.strict:
                raise Abort
            return None

        if self.buf == "y":
            if stem.endswith("y"):
                if len(stem) >= 2 and stem[-2] in _V:
                    return stem[:-1]
                return viol()
            if stem and stem[-1] in self.bare_exclude:
                return None  # another class owns this shape
            if not stem or stem[-1] in _V:
                # bare form after a vowel: the voiced variants demand the y
                # buffer (abort); t-variants simply aren't this suffix
                if f[0] == "t":
                    return None
                return viol()
            return stem
        if self.buf == "n":
            if stem.endswith("n") and len(stem) >= 2 and stem[-2] in _V:
                return stem[:-1]
            if self.strict:
                # strict n (ncA, nA): y/s endings belong to other classes,
                # as does a bare form after a vowel
                if stem and (stem[-1] in "ys" or stem[-1] in _V):
                    return None
                # a misplaced n buffer aborts ('kitapnca' stays put)
                if not stem or stem[-1] == "n":
                    return viol()
            elif self.bare_consonant and (not stem or stem[-1] in _V):
                return None
            return stem
        if self.ubuf:
            if stem and stem[-1] in "ıiuü":
                # high vowel = the U buffer: valid only after a consonant
                if len(stem) >= 2 and stem[-2] not in _V:
                    return stem[:-1]
                return viol()
            if stem and stem[-1] in _V:
                return stem  # low vowel: bare possessive after vowel
            return viol()
        if self.bare_consonant and stem and stem[-1] in _V:
            return viol()
        return stem


class UMark:
    """Accusative/possessive -(y|s)U with the full buffer cascade."""

    forms = ["ı", "i", "u", "ü"]
    cont: list = []

    def try_strip(self, w: str) -> str | None:
        if len(w) < 2 or w[-1] not in self.forms:
            return None
        if not _harmonic(w):
            return None
        stem = w[:-1]
        last = stem[-1]
        if last == "y":
            if len(stem) >= 2 and stem[-2] in _V:
                return stem[:-1]
            raise Abort
        if last == "s":
            if len(stem) >= 2 and stem[-2] in _V:
                return stem
            raise Abort
        if last == "n" or last in _V:
            return None
        return stem


class KiMark:
    """-ki: strips only when the continuation (locative/genitive) also
    strips — otherwise the whole class backs off ('evdeki' → 'ev',
    'evdaki' keeps ki and falls through)."""

    forms = ["ki"]
    cont: list = []

    def __init__(self, inner_chain):
        self.inner = inner_chain

    def try_strip(self, w: str) -> str | None:
        if not w.endswith("ki") or len(w) <= 2:
            return None
        stem = w[:-2]
        form_matched = any(
            any(stem.endswith(f) and len(stem) > len(f) for f in m.forms)
            for m in self.inner
        )
        if not form_matched:
            raise Abort  # 'kitapki' stays put entirely
        out = _run(stem, self.inner)
        if out == stem:
            return None  # case form present but blocked → back off softly
        return out


def _run(w: str, chain) -> str:
    for mark in chain:
        out = mark.try_strip(w)
        if out is None:
            continue
        w = out
        if mark.cont:
            try:
                return _run(w, mark.cont)
            except Abort:
                return w
        return w
    return w


_DI = ["dı", "di", "du", "dü", "tı", "ti", "tu", "tü"]
_MIS = ["mış", "miş", "muş", "müş"]

# ---- nominal verb chain ----
ymUs = Mark(_MIS, buf="y")
yDU = Mark(_DI, buf="y")
ysA = Mark(["sa", "se"], buf="y", harmony=False)
yken = Mark(["ken"], buf="y", harmony=False, strict=False)
sUnUz = Mark(["sınız", "siniz", "sunuz", "sünüz"],
             cont=[Mark(_MIS), Mark(_DI), Mark(["sa", "se"], harmony=False)])
class LArVerb:
    """-lAr as a nominal-verb suffix only when followed (underneath) by
    DUr/DI/sA/mUş — a bare plural belongs to the noun step."""

    forms = ["lar", "ler"]
    cont: list = []

    def __init__(self, inner):
        self.inner = inner

    def try_strip(self, w: str) -> str | None:
        for f in self.forms:
            if w.endswith(f) and len(w) > len(f):
                if not _harmonic(w):
                    return None
                stem = w[: -len(f)]
                out = _run(stem, self.inner)
                return out if out != stem else None
        return None


lAr_v = LArVerb([Mark(["dır", "dir", "dur", "dür",
                       "tır", "tir", "tur", "tür"]),
                 Mark(_DI), Mark(["sa", "se"], harmony=False),
                 Mark(_MIS)])
DUr = Mark(["dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür"])
nUz = Mark(["nız", "niz", "nuz", "nüz"], cont=[Mark(_DI), Mark(["sa", "se"])])
yUz = Mark(["ız", "iz", "uz", "üz"], buf="y", strict=False,
           cont=[Mark(_MIS)])
yUz.bare_exclude = "s"
sUn = Mark(["sın", "sin", "sun", "sün"], cont=[Mark(_MIS)])
yUm = Mark(["ım", "im", "um", "üm"], buf="y", harmony=False, strict=False,
           cont=[Mark(_MIS)])

NOMINAL = [ymUs, yDU, ysA, yken, sUnUz, lAr_v, DUr, yUz, sUn, yUm]

# ---- noun chain ----
lAr = Mark(["lar", "ler"])
lArI = Mark(["ları", "leri"], harmony=False)
sU_consume = Mark(["sı", "si", "su", "sü", "ı", "i", "u", "ü"],
                  harmony=False)
sU_consume_lar = Mark(["sı", "si", "su", "sü", "ı", "i", "u", "ü"],
                      harmony=False)
poss_Um = Mark(["m"], ubuf=True, harmony=False, strict=False)
poss_Un = Mark(["n"], ubuf=True, harmony=False, strict=False)
poss_UmUz = Mark(["mız", "miz", "muz", "müz"], ubuf=True, harmony=False,
                 strict=False)
poss_UnUz = Mark(["nız", "niz", "nuz", "nüz"], ubuf=True, harmony=False,
                 strict=False)
U = UMark()

poss_Um_lar = Mark(["m"], ubuf=True, harmony=False, strict=False,
                   cont=[lAr])
poss_Un_lar = Mark(["n"], ubuf=True, harmony=False, strict=False,
                   cont=[lArI, lAr])
poss_UmUz_lar = Mark(["mız", "miz", "muz", "müz"], ubuf=True,
                     harmony=False, strict=False, cont=[lAr])
poss_UnUz_lar = Mark(["nız", "niz", "nuz", "nüz"], ubuf=True,
                     harmony=False, strict=False, cont=[lAr])

sU_consume_lar.cont = [lAr]
_AFTER_CASE = [lArI, poss_UnUz_lar, poss_UmUz_lar, sU_consume_lar,
               poss_Un_lar, poss_Um_lar, lAr]

ncA = Mark(["ca", "ce"], buf="n",
           cont=[lArI, poss_UnUz_lar, poss_UmUz_lar, poss_Un_lar,
                 poss_Um_lar, lAr])
nDAn = Mark(["dan", "den", "tan", "ten"], buf="n", strict=False,
            cont=_AFTER_CASE)
nDA = Mark(["da", "de", "ta", "te"], buf="n", strict=False,
           cont=_AFTER_CASE)
ylA = Mark(["la", "le"], buf="y",
           cont=[poss_UnUz_lar, poss_UmUz_lar, poss_Un_lar, poss_Um_lar,
                 sU_consume, lAr])
gen_nUn = Mark(["ın", "in", "un", "ün"], buf="n", strict=False,
               bare_consonant=True, cont=[sU_consume_lar, lArI, lAr])
nA = Mark(["a", "e"], buf="n", cont=[sU_consume, lAr])
yA = Mark(["a", "e"], buf="y", cont=[poss_Un_lar, poss_Um_lar,
                                     sU_consume, lAr])
nU = Mark(["nı", "ni", "nu", "nü"], cont=[U, lAr])

_KI_INNER = [
    Mark(["da", "de", "ta", "te"], buf="n", strict=False,
         cont=[lAr, poss_Un_lar, poss_Um_lar, U]),
    Mark(["ın", "in", "un", "ün"], buf="n", strict=False),
]
ki = KiMark(_KI_INNER)

NOUN = [
    lArI,
    lAr,
    ncA,
    nDAn,
    nDA,
    ylA,
    ki,
    gen_nUn,
    nU,
    poss_UnUz_lar,
    poss_UmUz_lar,
    U,
    poss_Un_lar,
    poss_Um_lar,
    nA,
    yA,
]

_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def turkish(word: str) -> str:
    if len(word) < 3 or not any(c in _V for c in word):
        return word
    w = word
    try:
        w = _run(w, NOMINAL)
        w = _run(w, NOUN)
    except Abort:
        pass
    if w != word and w and w[-1] in _DEVOICE:
        w = w[:-1] + _DEVOICE[w[-1]]
    return w
