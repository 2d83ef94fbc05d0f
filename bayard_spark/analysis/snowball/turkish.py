"""Snowball stemmer: Turkish — hand port validated against dict_snowball.

Reverse-derived from the published algorithm (snowballstem.org/algorithms/
turkish/stemmer.html, Evren Kapusuz Çilden's stemmer) by probing the
PostgreSQL stopword-free snowball oracle (tools/snowball_check.py);
registered at 100% agreement on the 11,974-word probe suite (real-word
vocab + pseudo-words + exhaustive short-suffix enumeration) and
70,744/70,745 on adversarial random strings. Round 6 grew the REAL-WORD
set to 1,432 natural inflections (tools/inflect_gen.py: full noun
case/possessive and verb tense paradigms over real lemmas with vowel
harmony, stop voicing and buffer consonants applied): 100% agreement,
pinned in tests/data/snowball/turkish_realwords.tsv. Reference accepts 'turkish'
in bayard/src/index/token_filter/stemming.rs:249-265.

Execution model (every behavior verified word-by-word against the oracle):

- GATE: fewer than two vowels → untouched (evd, od; but adı→ad). A
  nominal-verb suffix equal to the ENTIRE word commits and terminates
  with no strip (sunuz→sunuz).
- VOWEL HARMONY: the word's LAST vowel (suffix included) must be matched
  by ANY earlier vowel of its class: a←{a,ı,o,u} e←{e,i,ö,ü} ı←{a,ı}
  i←{e,i} u←{o,u} ü←{ö,ü} (kitape→kitap via the i; kitapu stays).
- Bare-form rules, keyed on c1 (char before the suffix) and c2 (char
  before that) — these mirror the published "optional letter" tests:
    R0  no constraint    (lAr, DUr, sUn, sUnUz, DA, DAn)
    R1  c2 is a vowel    (ymUş, yDU, ysA, yUz, yUm, U, A, cA:
                          kitapdı→kitap, kitapaaa→kitapaa;
                          kitapldı stays)
    R2  c2 is a NON-vowel (possessives m/n/mUz/nUz: arabanız→araba,
                          odam→oda; kitapaam and kitapnız stay)
  gen (Un) bare: c1 consonant, or c1 AND c2 both vowels (iaüın→iaü;
  kitapaın keeps).
- y-buffered forms are separate longer entries (ydı, ya, yla, yU …): the
  y must follow a vowel. s and m before a bare U/A are KEPT, not consumed
  (arabası→arabas, odamı→odam→oda via the possessive continuation).
- n-buffer: lenient for -(n)Un/-(n)DA/-(n)DAn (consume the n only when
  it follows a vowel — and for DA/DAn that vowel must follow a
  consonant: sonunda→son, ejjlveunde→ejjlveun). PART OF THE FORM for
  -ncA/-nA/-nU, where nA/nU additionally need consonant-vowel-n shape
  (kitapuna→kitap; drnuına strips only the bare a).
- Possessive-sU continuations come in two flavors (SUcons): strict
  (harmony + s-after-vowel or c2-vowel bare; after gen/ncA/ylA/lAr) and
  lenient (no harmony on the bare strip; after consumed-n case forms).
- NOMINAL-VERB step: one pass; the branch owning the LONGEST matching
  form across all branches is committed; a failed -nUz falls back to
  the shorter -(y)Uz (çcakpaeünüz→çcakpaeün). The -lAr branch
  TERMINATES stemming entirely (kitablar→kitab keeps its b,
  evimler→evim, evdekiler→evdeki).
- NOUN step: ordered marks, first success runs only its continuation
  chain then stops (kitapcasına→kitapca never re-enters -CA). The
  plural possessives split on harmony: harmonic nUz continues into
  locative/U strips (odanız→o, geminiz→ge); non-harmonic strips bare
  and stops after one U (tahtanuz→tahta, geminız→gem, arabanin→araban).
- POSTLUDE (skipped after the -lAr verb branch): stems ending d/g append
  the harmonized high vowel (kitapd→kitapdı, kedi→ked→kedi roundtrip);
  a vowelless d-stem devoices to t instead (rhtmdine→rhtmt); reserved
  words ad/soyad are exempt (adı→ad); then final b/c/ğ devoice to p/ç/k
  (kitabı→kitap).
"""

from __future__ import annotations

_V = "aeıioöuü"
_CLASS = {
    "a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
    "o": "ou", "ö": "öü", "u": "ou", "ü": "öü",
}
_APPEND_U = {"a": "ı", "ı": "ı", "e": "i", "i": "i",
             "o": "u", "u": "u", "ö": "ü", "ü": "ü"}

R0, R1, R2 = 0, 1, 2


def _harmonic(w: str) -> bool:
    last, idx = None, -1
    for i in range(len(w) - 1, -1, -1):
        if w[i] in _V:
            last, idx = w[i], i
            break
    if last is None:
        return True
    rest = w[:idx]
    if not any(c in _V for c in rest):
        return True
    return any(c in _CLASS[last] for c in rest)


def _bare_ok(rule: int, stem: str) -> bool:
    c1 = stem[-1] if stem else ""
    c2 = stem[-2] if len(stem) >= 2 else ""
    if rule == R0:
        return True
    if rule == R1:
        # optional-y else-branch: skip c1, the char before it must be a
        # vowel (kitapdı→kitap, kitapaaa→kitapaa; kitapldı stays)
        return bool(c2) and c2 in _V
    # R2 (possessives, optional-U): skip c1 (a U buffer or plain stem
    # char), the char before it must be a NON-vowel (arabanız→araba,
    # odam→oda; kitapaam and kitapnız stay)
    return bool(c2) and c2 not in _V


class M:
    """Suffix family: plain forms (bare rule) + y-buffered forms
    (y must follow a vowel); longest entry wins within the mark."""

    def __init__(self, forms, y_forms=(), rule=R1, harmony=True,
                 cont=None, exclude=""):
        self.entries = sorted(
            [(f, False) for f in forms] + [(f, True) for f in y_forms],
            key=lambda e: -len(e[0]),
        )
        self.rule = rule
        self.harmony = harmony
        self.cont = cont or []
        self.exclude = exclude  # c1 values owned by another mark

    def match_len(self, w: str) -> int:
        for f, _ in self.entries:
            if w.endswith(f) and len(w) > len(f):
                return len(f)
        return 0

    def try_strip(self, w: str) -> str | None:
        hit = None
        for f, is_y in self.entries:
            if w.endswith(f) and len(w) > len(f):
                hit = (f, is_y)
                break
        if hit is None:
            return None
        f, is_y = hit
        if self.harmony and not _harmonic(w):
            return None
        stem = w[: -len(f)]
        if is_y:
            return stem if (stem and stem[-1] in _V) else None
        if stem and stem[-1] in self.exclude:
            return None
        return stem if _bare_ok(self.rule, stem) else None


class NForm(M):
    """Family whose n is part of the form and must follow a vowel
    (ncA, nA, nU); plain forms use the given bare rule."""

    def __init__(self, forms, n_forms, rule=R1, harmony=True, cont=None,
                 exclude="", strict_n=False):
        super().__init__(forms, rule=rule, harmony=harmony, cont=cont,
                         exclude=exclude)
        self.strict_n = strict_n
        self.entries = sorted(
            [(f, "p") for f in forms] + [(f, "n") for f in n_forms],
            key=lambda e: -len(e[0]),
        )

    def try_strip(self, w: str) -> str | None:
        hit = None
        for f, kind in self.entries:
            if w.endswith(f) and len(w) > len(f):
                hit = (f, kind)
                break
        if hit is None:
            return None
        f, kind = hit
        if self.harmony and not _harmonic(w):
            return None
        stem = w[: -len(f)]
        if kind == "n":
            # the n must follow a vowel; for nA/nU (strict_n) that vowel
            # must itself follow a consonant (kitapuna→kitap via 'nu';
            # drnuına strips only the bare 'a') — ncA has no such limit
            # (arabaince→arabai)
            if not (stem and stem[-1] in _V):
                return None
            if self.strict_n and not (len(stem) >= 2
                                      and stem[-2] not in _V):
                return None
            return stem
        if stem and stem[-1] in self.exclude:
            return None
        return stem if _bare_ok(self.rule, stem) else None


class LenientN(M):
    """Case suffix with a LENIENT optional n: consume the n only when it
    follows a vowel, else the n is plain stem material. `vowel_bare`
    distinguishes DA/DAn (bare after anything) from Un (consonant only).
    """

    def __init__(self, forms, harmony=True, cont=None, vowel_bare=True,
                 cont_n=None, exclude="", strict_consume=False):
        super().__init__(forms, rule=R0, harmony=harmony, cont=cont,
                         exclude=exclude)
        self.vowel_bare = vowel_bare
        self.strict_consume = strict_consume
        # continuation used only when the buffer n was consumed: a bare
        # case suffix implies no possessive underneath, so the U/sU
        # continuation must not eat the stem's own final vowel
        # (gemide→gemi but sonunda→son)
        self.cont_n = cont_n
        self._used_n = False

    def try_strip(self, w: str) -> str | None:
        self._used_n = False
        hit = None
        for f, _ in self.entries:
            if w.endswith(f) and len(w) > len(f):
                hit = f
                break
        if hit is None:
            return None
        if self.harmony and not _harmonic(w):
            return None
        stem = w[: -len(hit)]
        if not stem:
            return None
        c1 = stem[-1]
        if (c1 == "n" and len(stem) >= 2 and stem[-2] in _V
                and not (self.strict_consume
                         and len(stem) >= 3 and stem[-3] in _V)):
            # DA/DAn (strict_consume) take the n only when its vowel
            # follows a consonant (sonunda→son; ejjlveunde keeps the n
            # and strips bare 'de'); gen consumes after V-V too
            # (anneının→anneı)
            self._used_n = True
            return stem[:-1]
        if c1 in _V and not self.vowel_bare:
            # gen-style: a bare strip after a vowel is allowed only when
            # the char before that vowel is ALSO a vowel (iaüın→iaü,
            # rbhgueun→rbhgue; kitapaın and uadçomcdein keep)
            if not (len(stem) >= 2 and stem[-2] in _V):
                return None
        if c1 in self.exclude:
            return None
        return stem


class UMark(M):
    """Final high vowel: -(y)U accusative / -(s)U possessive. The y is a
    separate consumed entry; s/m before a bare U are left in place (the
    R1/lenient rule on c1/c2 decides validity). `lenient` (continuation
    flavor) drops harmony + R1: any consonant before the U qualifies."""

    def __init__(self, cont=None, lenient=False):
        self.cont = cont or []
        self.lenient = lenient

    def match_len(self, w: str) -> int:
        if len(w) >= 2 and w[-1] in "ıiuü":
            return 2 if (len(w) >= 3 and w[-2] == "y") else 1
        return 0

    def try_strip(self, w: str) -> str | None:
        if len(w) < 2 or w[-1] not in "ıiuü":
            return None
        stem = w[:-1]
        if self.lenient:
            # continuation flavor: any consonant before the U qualifies
            return stem if stem[-1] not in _V else None
        if not _harmonic(w):
            return None
        if stem[-1] == "y":
            return stem[:-1] if (len(stem) >= 2 and stem[-2] in _V) else None
        # an eligible n-form (nU) is tried before this mark in _NOUN;
        # a bare U after n is legitimate when the n-form was blocked
        # (syüaldıanı→syüaldıan, vhöunu→vhöun)
        return stem if _bare_ok(R1, stem) else None


class SUcons(M):
    """Post-case possessive sU. Two flavors, both verified word-by-word:

    strict (gen/ncA/ylA/after-lAr continuations): harmony required;
      s-form strips 'sU' when the s follows a vowel (arabasının→araba);
      a bare U strips only when c2 (the char one past c1) is a vowel
      (kitapının→kitap but kahvaltının→kahvaltı, günün→gü); c1=='s'
      with no s-form match fails outright (kitapsının→kitapsı).

    lenient (consumed-n DA/DAn/nA/nU continuations): no harmony;
      s-form as above, else bare U strips after any consonant
      (biletsında→bilets, mavinda→mav)."""

    def __init__(self, cont=None, strict=False):
        self.cont = cont or []
        self.strict = strict

    def match_len(self, w: str) -> int:
        if len(w) >= 2 and w[-1] in "ıiuü":
            return 2 if (len(w) >= 3 and w[-2] == "s") else 1
        return 0

    def try_strip(self, w: str) -> str | None:
        if len(w) < 2 or w[-1] not in "ıiuü":
            return None
        stem = w[:-1]
        if self.strict:
            if not _harmonic(w):
                return None
            if stem[-1] == "s":
                if len(stem) >= 2 and stem[-2] in _V:
                    return stem[:-1]
                return None
            if len(stem) >= 2 and stem[-2] in _V:
                return stem
            return None
        # lenient: the s-form still needs harmony (arabasında→araba but
        # arabasinden→arabas); the bare strip doesn't (mavinda→mav)
        if (stem[-1] == "s" and len(stem) >= 2 and stem[-2] in _V
                and _harmonic(w)):
            return stem[:-1]
        return stem if stem[-1] not in _V else None


def _run_chain(w: str, marks) -> str:
    for m in marks:
        out = m.try_strip(w)
        if out is None:
            continue
        cont = m.cont
        if getattr(m, "_used_n", False) and getattr(m, "cont_n", None):
            cont = m.cont_n
        if cont:
            return _run_chain(out, cont)
        return out
    return w


# ------------------------------------------------------- nominal verb step

_DU_FORMS, _DU_Y = [], []
for _d in "dt":
    for _v in "ıiuü":
        for _p in ("", "m", "n", "k"):
            _DU_FORMS.append(_d + _v + _p)
            _DU_Y.append("y" + _d + _v + _p)
_MIS = ["mış", "miş", "muş", "müş"]
_SA = [s + p for s in ("sa", "se") for p in ("", "m", "n", "k")]

ymUs = M(_MIS, y_forms=["y" + f for f in _MIS])
yDU = M(_DU_FORMS, y_forms=_DU_Y)
ysA = M(_SA, y_forms=["y" + f for f in _SA], harmony=False)
yken = M(["ken"], y_forms=["yken"], harmony=False)
sUnUz = M(["sınız", "siniz", "sunuz", "sünüz"], rule=R0)
yUz = M(["ız", "iz", "uz", "üz"], y_forms=["yız", "yiz", "yuz", "yüz"])
sUn = M(["sın", "sin", "sun", "sün"], rule=R0)
yUm = M(["ım", "im", "um", "üm"], y_forms=["yım", "yim", "yum", "yüm"])
lAr_v = M(["lar", "ler"], rule=R0)
DUr = M(["dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür"], rule=R0)
nUz_v = M(["nız", "niz", "nuz", "nüz"], rule=R0)

_NOMINAL = [
    (ymUs, "simple"), (yDU, "simple"), (ysA, "simple"), (yken, "simple"),
    (nUz_v, "nUz"),
    (sUnUz, "person"), (yUz, "person"), (sUn, "person"), (yUm, "person"),
    (lAr_v, "lAr"), (DUr, "DUr"),
]


def _nominal(w: str):
    """One committed pass: longest form across all branches wins.
    Returns (stem, terminate: bool)."""
    # a suffix equal to the ENTIRE word commits (longest match) and then
    # fails its strip, terminating stemming (sunuz→sunuz, sınız→sınız)
    for mark, _kind in _NOMINAL:
        for f, _x in mark.entries:
            if w == f:
                return w, True
    best, rows = 0, []
    for mark, kind in _NOMINAL:
        n = mark.match_len(w)
        if n > best:
            best, rows = n, [(mark, kind)]
        elif n and n == best:
            rows.append((mark, kind))
    if not best:
        return w, False
    for mark, kind in rows:
        out = mark.try_strip(w)
        if out is None:
            continue
        if kind == "simple":
            return out, False
        if kind == "person":
            nxt = ymUs.try_strip(out)
            return (nxt if nxt is not None else out), False
        if kind == "nUz":
            for inner in (yDU, ysA):
                nxt = inner.try_strip(out)
                if nxt is not None:
                    return nxt, False
            # -nUz is only a verb suffix over a DI/sA stem; a failed
            # nUz falls back to the shorter yUz (çcakpaeünüz→çcakpaeün)
            nxt = yUz.try_strip(w)
            if nxt is not None:
                mid = ymUs.try_strip(nxt)
                return (mid if mid is not None else nxt), False
            continue
        if kind == "lAr":
            for inner in (DUr, yDU, ysA, ymUs):
                nxt = inner.try_strip(out)
                if nxt is not None:
                    return nxt, True
            return out, True
        if kind == "DUr":
            for person in (sUnUz, yUz, sUn, yUm, None):
                mid = out if person is None else person.try_strip(out)
                if mid is None:
                    continue
                nxt = ymUs.try_strip(mid)
                if nxt is not None:
                    return nxt, False
            return out, False
    return w, False


# ------------------------------------------------------------- noun step

_lar = lambda cont=None: M(["lar", "ler"], rule=R0, cont=cont)  # noqa: E731

# possessive m/n + one U-buffer strip, then STOP: arabanin→araban,
# odanim→odan (no second possessive round; gemin→ge goes through the
# harmonic genitive path instead)
poss_mn = M(["m", "n"], rule=R2, harmony=False)
_u_after_poss = UMark(lenient=True, cont=[_lar()])
poss_mn.cont = [_u_after_poss, _lar()]
# genitive's possessive tail strips only m, never n (kalemin→kale,
# gemin→ge; but dersnin→dersn keeps its n), and only an m that follows
# a vowel (üşltaınhnmün keeps its m)
R3 = 3


class MTail(M):
    def try_strip(self, w: str) -> str | None:
        if len(w) >= 3 and w[-1] == "m" and w[-2] in _V \
                and w[-3] not in _V:
            return w[:-1]
        return None


poss_m = MTail(["m"], rule=R2, harmony=False,
               cont=[_u_after_poss, _lar()])
# harmonic plural possessives continue into a locative strip
# (odanız→oda→o, köftenüz→köf) and a U strip; non-harmonic ones strip
# bare and stop (tahtanuz→tahta, geminız→gemi→gem)
_NUZ_FORMS = ["mız", "miz", "muz", "müz", "nız", "niz", "nuz", "nüz"]
poss_nUz_h = M(_NUZ_FORMS, rule=R2,
               cont=[UMark(lenient=True, cont=[poss_mn, _lar()]),
                     LenientN(["da", "de", "ta", "te"]), _lar()])
poss_nUz = M(_NUZ_FORMS, rule=R2, harmony=False,
             cont=[UMark(lenient=True, cont=[_lar()]), _lar()])
sU_strict = SUcons(cont=[_lar()], strict=True)
# consumed-n case continuations skip harmony (kitapunu→kitap although
# 'u' fails harmony against kitap's i/a; biletsında→bilets)
sU_nh = SUcons(cont=[_lar()])
lArI = M(["ları", "leri"], rule=R0)

# bare case forms imply no possessive underneath: the sU/U continuation
# runs only when the buffer n was consumed (cont_n)
_DAN_PLAIN = [poss_mn, poss_nUz, _lar()]
_DAN_N = [poss_mn, poss_nUz, sU_nh, _lar()]
_DA_PLAIN = [lArI, poss_mn, poss_nUz, _lar()]
_DA_N = [lArI, poss_mn, poss_nUz, sU_nh, _lar()]

ncA = NForm(["ca", "ce"], ["nca", "nce"],
            cont=[lArI, poss_mn, poss_nUz, sU_strict, _lar()])
nDAn = LenientN(["dan", "den", "tan", "ten"], cont=_DAN_PLAIN,
                cont_n=_DAN_N, strict_consume=True)
nDA = LenientN(["da", "de", "ta", "te"], cont=_DA_PLAIN, cont_n=_DA_N,
               strict_consume=True)
ylA = M(["la", "le"], y_forms=["yla", "yle"],
        cont=[poss_mn, poss_nUz, sU_strict, _lar()])
gen = LenientN(["ın", "in", "un", "ün"], vowel_bare=False,
               cont=[sU_strict, lArI,
                     _lar(cont=[sU_strict, poss_mn]), poss_m, poss_nUz])
nU = NForm([], ["nı", "ni", "nu", "nü"], strict_n=True,
           cont=[sU_nh, lArI, _lar()])
# after a bare U/A strip a genitive may still come off (etııüına→etııü,
# vüczecaüınü→vüczecaü) — gen's own vowel-pair rule bounds it
U_main = UMark(cont=[poss_mn, poss_nUz, gen, _lar()])
nA = NForm(["a", "e"], ["na", "ne"], exclude="y", strict_n=True,
           cont=[lArI, poss_mn, poss_nUz, sU_nh, _lar()])
yA = M(["a", "e"], y_forms=["ya", "ye"],
       cont=[poss_mn, poss_nUz, gen, _lar()])


class Ki(M):
    """-ki strips only when a case chain strips underneath (evdeki→ev,
    kitabındaki→kitap); otherwise no match (kitapki stays)."""

    def __init__(self):
        self.inner = [
            LenientN(["da", "de", "ta", "te"],
                     cont=[_lar(), poss_mn],
                     cont_n=[_lar(), poss_mn, UMark(lenient=True)]),
            LenientN(["ın", "in", "un", "ün"], vowel_bare=False,
                     cont=[sU_strict, lArI, _lar(), poss_m]),
        ]
        self.cont = []

    def match_len(self, w: str) -> int:
        return 2 if (w.endswith("ki") and len(w) > 2) else 0

    def try_strip(self, w: str) -> str | None:
        if not w.endswith("ki") or len(w) <= 2:
            return None
        stem = w[:-2]
        out = _run_chain(stem, self.inner)
        return out if out != stem else None


_NOUN = [lArI, _lar(), ncA, nDAn, nDA, ylA, Ki(), gen, nU, poss_nUz_h,
         poss_nUz, poss_mn, U_main, nA, yA]

_DEVOICE = {"b": "p", "c": "ç", "ğ": "k"}
_RESERVED = {"ad", "soyad"}


def turkish(word: str) -> str:
    if sum(1 for c in word if c in _V) < 2:
        return word
    w, terminate = _nominal(word)
    if terminate:
        return w
    w = _run_chain(w, _NOUN)
    if w and w[-1] in "dg" and w not in _RESERVED:
        appended = False
        for c in reversed(w):
            if c in _V:
                w = w + _APPEND_U[c]
                appended = True
                break
        if not appended and w[-1] == "d":
            # a vowelless d-stem can't take the harmonized U; it
            # devoices instead (rhtmdine→rhtmt) — g stays (günüm→g)
            w = w[:-1] + "t"
    if w and w[-1] in _DEVOICE:
        w = w[:-1] + _DEVOICE[w[-1]]
    return w


turkish.probe_suffixes = [
    "lar", "ler", "ları", "leri", "dı", "di", "du", "dü", "tı", "tük",
    "dım", "dın", "dık", "diniz", "mış", "miş", "muş", "müş", "sa", "se",
    "sam", "sak", "ken", "sınız", "sunuz", "dır", "dur", "tur", "nız",
    "niz", "ız", "iz", "uz", "üz", "sın", "sun", "ım", "im", "um", "üm",
    "ca", "ce", "nca", "ince", "dan", "den", "tan", "ten", "ndan",
    "nden", "da", "de", "ta", "te", "nda", "nde", "la", "le", "yla",
    "yle", "ki", "deki", "daki", "ın", "in", "un", "ün", "nın", "nin",
    "a", "e", "ya", "ye", "na", "ne", "ı", "i", "u", "ü", "yı", "yi",
    "yu", "yü", "nı", "ni", "nu", "nü", "sı", "si", "su", "sü", "m",
    "n", "mız", "miz", "muz", "müz", "ydı", "ydi", "ymış", "yse",
    "yken", "yım", "yiz", "larında", "lerinde", "larından", "sındaki",
    "ndaki", "larıyla", "leriyle", "ının", "inin", "unun", "ünün",
    "casına", "cesine", "mışsın", "mıştır", "sınızdır", "ymuş",
]
