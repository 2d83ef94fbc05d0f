"""Snowball stemmer: Arabic — hand port validated against dict_snowball.

Reverse-derived from the published algorithm (snowballstem.org/algorithms/
arabic/stemmer.html, by Assem Chelli, Abdelkrim Aries, Lakhdar Benzahia)
by probing the PostgreSQL stopword-free snowball oracle
(tools/snowball_check.py). Reference accepts 'arabic' in
bayard/src/index/token_filter/stemming.rs:249-265.

Model (verified word-by-word against the oracle):

Validated to 0 mismatches on 92,788 oracle probes (4,830 structured
prefix×stem×suffix combinations + 87,958 held-out random/morphological
words across 9 seeds). Round 6 grew the REAL-WORD set to
1,452 natural forms (tools/inflect_gen.py: clitic prefixes, pronominal
suffixes with the ة→ت shift, productive duals, sound-verb paradigms
over real lemmas): 100% agreement, pinned in
tests/data/snowball/arabic_realwords.tsv.

- Checks1: a definite-article prefix (بال/كال at len>4, ال/لل at len>3)
  marks the word NOUN+DEFINED and clears the verb flag; everything else
  keeps both noun and verb possibilities open.
- Normalize_pre strips vocalization (tashkeel) and tatweel and expands
  lam-alef presentation ligatures.
- Suffix phase: verb branch first (object pronouns stack and strip
  repeatedly), noun branch only if the verb branch strips nothing;
  DEFINED words skip the verb branch and their possessive step 1a.
  Steps use among-commit semantics: the longest matching suffix wins,
  and a failed length test fails the whole step (كتبان keeps).
- Alef maqsura ى→ي rewrites on the noun/no-strip path only — never
  after a verb strip or a nisba-ي strip.
- Prefix phase afterwards: a leading أ over another carrier collapses
  (and the rest of the phase then looks past it), يست/نست/تست→است,
  conjunction ف/و (not before ا), articles, preposition ب (not before
  ا), doubled كك/بب, and the future-tense س over ي/ت/ن/أ.
- Final hamza normalization is position-sensitive: a final carrier
  becomes ء, elsewhere أ/إ/آ→ا, ؤ→و, ئ→ي.
"""

from __future__ import annotations

import re

# U+064B..U+0652 tashkeel (incl. shadda/sukun), U+0640 tatweel
_STRIP_RE = re.compile("[ً-ْـ]")
_LIGATURES = {
    "ﻻ": "لا",  # ﻻ → لا
    "ﻼ": "لا",
    "ﻷ": "لأ",  # ﻷ → لأ
    "ﻸ": "لأ",
    "ﻵ": "لآ",  # ﻵ → لآ
    "ﻶ": "لآ",
    "ﻹ": "لإ",  # ﻹ → لإ
    "ﻺ": "لإ",
}

ALEF = "ا"          # ا
ALEF_HAMZA_ABOVE = "أ"  # أ
ALEF_HAMZA_BELOW = "إ"  # إ
ALEF_MADDA = "آ"    # آ
YEH = "ي"           # ي
ALEF_MAQSURA = "ى"  # ى


def _normalize_pre(w: str) -> str:
    w = _STRIP_RE.sub("", w)
    for lig, exp in _LIGATURES.items():
        w = w.replace(lig, exp)
    return w


_HAMZA_CARRIERS = "آأإؤئ"  # آ أ إ ؤ ئ


def _normalize_hamza(w: str) -> str:
    """Position-sensitive hamza normalization (oracle-verified): a FINAL
    carrier becomes bare hamza ء (قارئ→قارء, لؤلؤ→لولء); elsewhere the
    carrier reduces to its seat: أ إ آ → ا, ؤ → و, ئ → ي."""
    if w and w[-1] in _HAMZA_CARRIERS:
        w = w[:-1] + "ء"  # ء
    return (w.replace(ALEF_MADDA, ALEF)
             .replace(ALEF_HAMZA_ABOVE, ALEF)
             .replace(ALEF_HAMZA_BELOW, ALEF)
             .replace("ؤ", "و")        # ؤ → و
             .replace("ئ", "ي"))       # ئ → ي


class _State:
    __slots__ = ("w", "is_noun", "is_verb", "is_defined")

    def __init__(self, w: str):
        self.w = w
        self.is_noun = True
        self.is_verb = True
        self.is_defined = False


def _checks1(st: _State) -> None:
    w = st.w
    if (w.startswith("بال")      # بال
            or w.startswith("كال")):  # كال
        if len(w) > 4:
            st.is_noun, st.is_verb, st.is_defined = True, False, True
    elif (w.startswith("ال")          # ال
            or w.startswith("لل")):   # لل
        if len(w) > 3:
            st.is_noun, st.is_verb, st.is_defined = True, False, True


def _suffix(st: _State, sufs) -> bool:
    """Among-commit semantics: the LONGEST matching suffix string wins;
    if its length condition then fails, the whole step fails with no
    fallback to shorter entries (كتبان keeps — 'ان' commits at len 5
    and its len>5 test fails, so the bare 'ن' is never tried)."""
    w = st.w
    best = None
    for suf, minlen in sufs:
        if w.endswith(suf):
            if best is None or len(suf) > len(best[0]):
                best = (suf, minlen)
    if best is None or len(w) < best[1]:
        return False
    st.w = w[: -len(best[0])]
    return True


# ---- verb suffixes ------------------------------------------------------

_VERB_STEP1 = [
    ("ه", 4), ("ك", 4),                       # ه ك
    ("ني", 5), ("نا", 5),           # ني نا
    ("ها", 5), ("هم", 5),           # ها هم
    ("هن", 5), ("كم", 5),           # هن كم
    ("كن", 5),                                # كن
    ("هما", 6), ("كما", 6),  # هما كما
    ("كمو", 6),                          # كمو
]
_VERB_STEP2A = [
    ("ت", 4), ("ا", 4), ("ن", 4), ("ي", 4),  # ت ا ن ي
    ("نا", 6),                                # نا
    ("تا", 5), ("تن", 5),           # تا تن (len > 4: جملتا→جمل)
    ("ان", 6), ("ون", 6), ("ين", 6),  # ان ون ين
    ("تما", 6),                                   # تما
]
_VERB_STEP2B = [
    ("وا", 5), ("تم", 5),           # وا تم
    ("تن", 5),                                # تن
]
_VERB_STEP2C = [
    ("و", 4),                                      # و
    ("تمو", 6),                          # تمو
]

# ---- noun suffixes ------------------------------------------------------

_NOUN_STEP1A = [
    ("ي", 4), ("ك", 4), ("ه", 4),        # ي ك ه
    ("نا", 5), ("كم", 5),           # نا كم
    ("ها", 5), ("هن", 5),           # ها هن
    ("هم", 5),                                # هم
    ("كما", 6), ("هما", 6),  # كما هما
]
_NOUN_STEP1B = [("ن", 6)]                          # ن, len > 5
_NOUN_STEP2A = [
    ("ا", 5), ("ي", 5), ("و", 5),        # ا ي و, len > 4
]
_NOUN_STEP2B = [("ات", 5)]                    # ات, len > 4
_NOUN_STEP2C1 = [("ت", 4)]                         # ت
_NOUN_STEP2C2 = [("ة", 4)]                         # ة
_NOUN_STEP3 = [("ي", 3)]                           # ي


def _suffix_phase(st: _State) -> str | None:
    if st.is_verb:
        if _suffix(st, _VERB_STEP1):
            # object pronouns stack and strip repeatedly
            # (والحملهماناها → ها, نا, هما → والحمل)
            while _suffix(st, _VERB_STEP1):
                pass
            _suffix(st, _VERB_STEP2A) or _suffix(st, _VERB_STEP2C)
            return "verb"
        if _suffix(st, _VERB_STEP2B):
            return "verb"
        if _suffix(st, _VERB_STEP2A):
            return "verb"
    if st.is_noun:
        hit = False
        if _suffix(st, _NOUN_STEP2C2):
            hit = True
        elif not st.is_defined and _suffix(st, _NOUN_STEP1A):
            (_suffix(st, _NOUN_STEP2A)
             or _suffix(st, _NOUN_STEP2B)
             or _suffix(st, _NOUN_STEP2C1))
            hit = True
        elif _suffix(st, _NOUN_STEP1B):
            (_suffix(st, _NOUN_STEP2A)
             or _suffix(st, _NOUN_STEP2B)
             or _suffix(st, _NOUN_STEP2C1))
            hit = True
        elif not st.is_defined and _suffix(st, _NOUN_STEP2A):
            hit = True
        elif _suffix(st, _NOUN_STEP2B):
            hit = True
        # Step3 runs after EVERY noun alternative, and even on DEFINED
        # nouns (الكتبي→كتب, الإبلهيات→…ات→ي→ابله)
        if _suffix(st, _NOUN_STEP3):
            return "step3"
        if hit:
            return "noun"
    return None


# ---- prefixes -----------------------------------------------------------


def _prefix_phase(st: _State) -> None:
    w = st.w
    # Step1: a leading أ over another alef/carrier (not ئ) collapses to
    # أ (أأىحذج→أىحذج, أؤتء→أتء, أاثمغذس→أثمغذس); آ/إ starts never do
    # (آآ… keeps both as اا). After a collapse, the remaining prefix
    # steps look past the fixed leading أ (أؤبكتب→أبكتب→أكتب), with
    # length conditions still on the full word (أؤفقل→اقل although
    # فقل alone keeps its ف).
    base = 0
    if len(w) > 3 and w[0] == "أ" and w[1] in "اأآإؤ":
        st.w = w = "أ" + w[2:]
        base = 1
    st.w = w[:base] + _prefix_rest(w[base:], len(w))


def _prefix_rest(w: str, full_len: int) -> str:
    # form-X verbs: a person prefix over است (يست/نست/تست → است)
    if full_len > 4 and w[:1] in ("ي", "ن", "ت") and w[1:3] == "ست":
        return "ا" + w[1:]
    # Step2: conjunction ف / و, not before ا
    if full_len > 3 and w[:1] in ("ف", "و") and w[1:2] != ALEF:
        full_len -= 1
        w = w[1:]
    # Step3a: articles
    for art, minlen in (("بال", 6), ("كال", 6),
                        ("ال", 5), ("لل", 5)):
        if w.startswith(art) and full_len >= minlen:
            return w[len(art):]
    # Step3b: preposition ب (not before ا — بالقل keeps its بال);
    # doubled كك / بب
    if full_len > 3:
        if w.startswith("ب") and not w.startswith("با"):
            return w[1:]
        if w.startswith("كك") or w.startswith("بب"):
            return w[1:]
    # Step4: future س over person prefixes (سأ is still un-normalized
    # here — alef normalization runs after the prefix phase, so a plain
    # سا noun like ساحل is never mistaken for the future tense)
    if full_len > 4 and w[:1] == "س" and w[1:2] in ("ي", "ت", "ن",
                                                    ALEF_HAMZA_ABOVE):
        return w[1:]
    return w


def arabic(word: str) -> str:
    st = _State(_normalize_pre(word))
    _checks1(st)
    branch = _suffix_phase(st)
    if branch not in ("verb", "step3") and st.w.endswith(ALEF_MAQSURA):
        # alef maqsura rewrites on the noun path or when nothing came
        # off (كتبى→كتبي, النظرىتن→…→نظري) — but a VERB strip or a
        # nisba-ي strip leaves it (فبإبلىتما→…→ابلى, كالسماءىي→سماءى)
        st.w = st.w[:-1] + YEH
    _prefix_phase(st)
    st.w = _normalize_hamza(st.w)
    return st.w


arabic.probe_suffixes = [
    "ة", "ه", "ها", "هم", "هن",
    "كم", "كن", "كما",
    "هما", "نا", "ي", "ك", "ا",
    "و", "ات", "ان", "ين",
    "ون", "ت", "ن", "تما",
    "تم", "تن", "وا", "ى",
    "ته", "تها", "ني",
]
