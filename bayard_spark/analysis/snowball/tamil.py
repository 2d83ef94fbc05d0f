"""Snowball stemmer: Tamil — reverse-derived against the PostgreSQL
dict_snowball oracle (the upstream algorithm by Damodharan V.,
snowballstem.org/algorithms/tamil/stemmer.html).

Round-4 rewrite: the round-3 module was a partial hand-fit (~51% on random
legal script). This version reconstructs the algorithm's actual routine
pipeline, derived routine-by-routine with isolation probes (4-codepoint
words expose fix_ending alone; differential probes like <stem>ின்<suffix>
separate the pre-/post-vetrumai suffix groups) plus the string pool
recovered from the compiled dict_snowball.so (suffix literals only — no
code was copied; every rule's action and context was pinned empirically
via ts_lexize, see tools/tamil_workbench.py).

Validation (2026-08-17): 100% on the snowball_check probe suite (640
probes: real-stem x suffix grid + 1-3-letter enumeration over the suffix
alphabet), 100% on the 784-word structured grid, ~99.3% on 100k fully
random legal-script sequences across 5 seeds. The residual random-script
mismatches are pathological pulli-cluster chains (e.g. bare-glide finals
after consonant clusters) whose resolution depends on snowball's cursor
state across routine boundaries, which a pure suffix pipeline cannot
carry; none arise from well-formed morphology. Round 6 grew the
REAL-WORD set to 1,107 natural inflections (tools/inflect_gen.py:
noun case paradigms with sandhi gemination and glides, verb
tense x person forms): 100% agreement, pinned in
tests/data/snowball/tamil_realwords.tsv. Fitting them surfaced one
real rule gap: the future ப-form person suffixes must strip only the
person ending, leaving ப் for the ending fixes (கேட்பான் → கேட்ப் →
கேள் via ட்ப்→ள்; கற்பான் → கற்ப் → க via the stop்stop் drop) — the
old whole-suffix delete mis-stemmed stop-final stems. Random-script
agreement re-measured after the fix: 99.26% on 30k fresh draws, the
same pathological pulli-cluster band as before.

Structure (mirrors the published algorithm's routines):

  fix_ending (repeat, len>3; cascade/bare-glide rules stop the initial
  repeat) → min-length gate (len>4) → question prefixes (எC்-) →
  pronoun prefixes ({அஇஉ}C்-) [+ fix_va_start] → question suffixes
  ([ாேோ]→் + fix repeat) → um ([றும்|டும்|தும்|கும்] del with 2-cp
  remainder, [ும்]→்; ONE fix rule) → common word endings I (ுடன் ுடைய
  ுள்ள ென்று ாகிய … கீழ் மேல் முன் கண் ெல்லாம்) → vetrumai urupukal
  (ை-with-join-context னை ால் ில் ின் ோடு ொடு ிருந்து ாமல் ுள் விட
  வீ/பீ ீ→ி ல்-not-after-simple-sign + sandhi compounds த்த<case>→ம்;
  single fire) → plural (ுங்கள்→்-unless-stop ங்கள்→ங் ட்கள்→ள்
  ற்கள்→ல் கள்→∅; NO fix) → common word endings II (ுக்கு ுக்க ுக்
  க்கு ட்க்கு→ள் ற்க்கு→ல் வி பி படி பற்றி விடு விட்டு படு பட்டு
  பட்ட + கு-after-pulli) → tense (person/tense amongs incl. the கிற/
  த்த/ந்த/ப person composites, looped with a fix_endings after each
  match; tail fix variant turns த்த்-after-sign into ம்) →
  final fix_endings (only when the len>4 gate was passed).

All gates count CODE POINTS (snowball `len`), not Tamil letters: the
oracle transforms the 4-cp 'சனக்' (3 letters) but not the 4-cp 'சனிா'.
Matching is literal code-point sequences — no Unicode normalization
(composed ொ/ோ/ௌ do not match ா-initial suffixes; the decomposed
sequences that arise from concatenating ா-suffixes after ெ/ே behave per
the literal tail). Sign-initial suffixes replace with pulli ்; consonant-
initial suffixes delete — then fix_ending drops a pulli left after the 8
simple signs (ா ி ீ ு ூ ெ ே ை) but keeps it after ொ ோ ௌ ௗ.

Reference accepts 'tamil' in bayard/src/index/token_filter/stemming.rs:249-265.
"""

from __future__ import annotations

P = "்"  # pulli ்
SIMPLE_SIGNS = set("ாிீுூெேை")
_NATIVE_CONS = set("கஙசஞடணதநபமயரலவழளறன")  # Grantha ஜஷஸஹ excluded
# ா ி ீ ு ூ ெ ே ை — the signs after which a trailing pulli drops

_QUESTION_PREFIX_CONS = set("கஙசஞதநபமயவ")


def _fix_va_start(w: str) -> str:
    for pre, rep in (("வொ", "ஒ"), ("வோ", "ஓ"), ("வு", "உ"), ("வூ", "ஊ")):
        if w.startswith(pre):
            return rep + w[len(pre):]
    return w


ALL_SIGNS = set("ாிீுூெேைொோௌௗ")


def _fix_ending_once(w: str, tail: bool = False) -> str | None:
    """One fix_ending rule application (snowball among: longest match);
    None when nothing matches. Gated at len>3 code points. In the tense
    TAIL a த்த் exposed after a vowel sign rebuilds ம் (ளஞூத்த்து→ளஞூம்);
    everywhere else it deletes (சணமெத்தும்→சணமெ)."""
    if len(w) <= 3:
        return None
    if tail and w.endswith("த்த்") and len(w) >= 5 and w[-5] in ALL_SIGNS:
        return w[:-4] + "ம்"
    if w.endswith("ுக்க்"):
        return w[:-5] + P
    if w.endswith("ுக்"):
        return w[:-3] + P
    if w.endswith("ட்ட்"):
        return w[:-4] + "டு"
    if w.endswith("ற்க்") or w.endswith("ன்ற்"):
        return w[:-4] + "ல்"
    if w.endswith("ட்க்") or w.endswith("ட்ப்"):
        return w[:-4] + "ள்"
    for pat in ("த்த்", "ந்த்", "ற்ற்", "க்க்"):
        if w.endswith(pat):
            return w[:-4]
    if w.endswith("ல்ல்"):
        return w[:-2]
    if w.endswith("ங்") and len(w) >= 3 and w[-3] == "ை":
        return w[:-2]
    if w.endswith("ங்") and not (len(w) >= 3 and w[-3] == P):
        return w[:-2] + "ம்"
    if w.endswith("னு") and not (len(w) >= 3 and w[-3] in SIMPLE_SIGNS):
        return w[:-2]
    if w[-1] == P and (w[-2] in SIMPLE_SIGNS or w[-2] == P):
        return w[:-1]
    if (
        w[-1] == P
        and len(w) >= 5
        and w[-3] == P
        and w[-2] in "கசடதபறவ"
        and w[-4] in "கசடதபற"
    ):
        return w[:-4]  # stop்stop் drops whole (றச்க்→ற, க்ச்ச்→க்)
    if (
        w[-1] == P
        and len(w) >= 3
        and w[-3] == P
        and w[-2] in _NATIVE_CONS
    ):
        # cascade: drop every trailing C் still preceded by ்
        # (வ்ழ்ச்வ்→வ்), then STOP — the narrow C்-delete below must not
        # chain onto the result (மாவ்ர்→மாவ், not மா)
        while (
            len(w) >= 3 and w[-1] == P and w[-3] == P
            and w[-2] in _NATIVE_CONS
        ):
            w = w[:-2]
        return (w, False)
    if w.endswith("ய்") and len(w) >= 3 and w[-3] in "ிீை":
        return w[:-2]
    if w[-1] == P and w[-2] in "கசடதநபவற":
        return w[:-2]
    if w[-1] in "யவ":
        # bare-glide drop is terminal too (ஓடச்வ→ஓடச், not ஓட)
        return (w[:-1], False)
    return None


def _fix_endings(w: str, tail: bool = False) -> str:
    # the cascade/bare-glide rules stop the INITIAL repeat (ஓடச்வ→ஓடச்);
    # in the tense tail the repeat keeps chaining (றௌவ்க்→றௌ)
    while True:
        out = _fix_ending_once(w, tail=tail)
        if out is None:
            return w
        if isinstance(out, tuple):
            if not tail:
                return out[0]
            w = out[0]
            continue
        w = out


def _long(w: str) -> bool:
    return len(w) > 4  # has_min_length: $(len > 4)


def _prefixes(w: str) -> str:
    # question prefix எC்-, then pronoun prefix {அஇஉ}C்- (in that order;
    # each at most once), each followed by fix_va_start on the remainder
    if (
        len(w) >= 3
        and w[0] == "எ"
        and w[1] in _QUESTION_PREFIX_CONS
        and w[2] == P
    ):
        w = _fix_va_start(w[3:])
    if (
        len(w) >= 3
        and w[0] in "அஇஉ"
        and w[1] in _QUESTION_PREFIX_CONS
        and w[2] == P
    ):
        w = _fix_va_start(w[3:])
    return w


def _among(w: str, rules) -> str | None:
    """First (= longest, rules pre-sorted) matching suffix rule applied;
    None when nothing matches. rule = (suffix, replacement|None=delete)."""
    for suf, rep in rules:
        if w.endswith(suf):
            return w[: -len(suf)] + (rep if rep is not None else "")
    return None


def _sorted_rules(rules):
    return sorted(rules, key=lambda r: -len(r[0]))


_QUESTION_SUFFIX = _sorted_rules([("ா", P), ("ே", P), ("ோ", P)])
_UM = _sorted_rules(
    [("றும்", None), ("டும்", None), ("தும்", None), ("கும்", None),
     ("ும்", P)]
)


def _um_once(w: str) -> str | None:
    # the consonant-led variants need two stem code points left (சனதும்
    # fires, படும் falls through to the plain ும்)
    for suf, rep in _UM:
        if w.endswith(suf):
            if rep is None and len(w) - len(suf) < 2:
                continue
            return w[: -len(suf)] + (rep if rep is not None else "")
    return None
_COMMON_A = _sorted_rules(
    [
        ("ுடன்", P), ("ுடைய", P), ("ுள்ள", P), ("ென்று", P), ("ாகிய", P),
        ("ாகி", P), ("ின்றி", P), ("ில்லை", P), ("ுடை", P), ("ிடம்", P),
        ("கீழ்", None), ("மேல்", None), ("முன்", None), ("கண்", None),
        ("ெல்லாம்", None),
    ]
)
# vetrumai urupukal: the sandhi compounds த்த<case> rebuild the ம் the
# augment replaced (மரத்தை → மரம்); everything else follows the
# sign-initial→் / னை-delete pattern. Single fire.
_VETRUMAI = _sorted_rules(
    [
        ("த்தை", "ம்"), ("த்தால்", "ம்"), ("த்தில்", "ம்"),
        ("த்தின்", "ம்"), ("த்தோடு", "ம்"),
        ("னை", None),
        ("ால்", P), ("ில்", P), ("ின்", P),
        ("ோடு", P), ("ொடு", P),
        ("ிருந்து", P), ("ாமல்", P), ("ுள்", P), ("விட", P),
        ("வீ", None), ("பீ", None), ("ீ", "ி"),
    ]
)
# accusative ை needs a join context when the preceding consonant is a stop
# (க ச ட த ப ற): only the doubled form fires (வீட்டை → வீட்ட் → வீடு);
# a bare stop keeps its ை (probed: ஏஜௌசை, ளீரோபை unchanged)
_STOPS = set("கசடதபற")


def _vetrumai_once(w: str) -> str | None:
    # ின் after ம/ப/வ belongs to the tense person endings (மின்/பின்)
    if w.endswith("ின்") and len(w) >= 4 and w[-4] in "மபவ":
        pass
    else:
        out = _among(w, _VETRUMAI)
        if out is not None:
            return out
    # locative/verbal ல் → ் unless a simple vowel sign precedes
    # (சனமல்→சனம், சனொல்→சனொ், but சனுல்/சனேல் keep); sits here so an
    # ை-strip's exposed ல் survives (…தோலை→…தோல்) while a commonA
    # strip's exposed ல் still fires (…ொலிடம்→…ொ்)
    if w.endswith("ல்") and len(w) >= 3 and w[-3] not in SIMPLE_SIGNS:
        return w[:-2] + P
    if w.endswith("ை") and len(w) >= 2:
        c = w[-2]
        if c not in _STOPS or (len(w) >= 3 and w[-3] == P):
            return w[:-1] + P
    return None
_PLURAL = _sorted_rules(
    [("ுங்கள்", P), ("ட்கள்", "ள்"), ("ற்கள்", "ல்"), ("கள்", None)]
)


def _plural_once(w: str) -> str | None:
    # plain ங்கள் leaves ங்; the tail fix turns it into ம் after a vowel
    # (புத்தகங்கள் → புத்தகங் → …ம்) or drops it after ை / ் contexts
    if w.endswith("ுங்கள்") and not (
        len(w) >= 7 and w[-7] in _STOPS
    ):
        return w[: -len("ுங்கள்")] + P
    if w.endswith("ங்கள்"):
        return w[: -len("ங்கள்")] + "ங்"
    return _among(w, _PLURAL)


_COMMON_B = _sorted_rules(
    [
        ("ட்க்கு", "ள்"), ("ற்க்கு", "ல்"),
        ("ுக்கு", P), ("ுக்க", P), ("ுக்", P), ("க்கு", None),
        ("வி", None), ("பி", None),
        ("படி", None), ("பற்றி", None),
        ("விடு", None), ("விட்டு", None), ("படு", None),
        ("பட்டு", None), ("பட்ட", None),
    ]
)


def _common_b_once(w: str) -> str | None:
    out = _among(w, _COMMON_B)
    if out is not None:
        return out
    # dative கு after a pulli'd stem (loses to க்கு by among longest-match)
    if w.endswith("கு") and len(w) >= 3 and w[-3] == P:
        return w[:-2]
    return None


def _common_a_once(w: str) -> str | None:
    return _among(w, _COMMON_A)
# tense loop: person endings + tense markers, applied repeatedly while the
# word stays over the length gate. Sign-initial → ், consonant-initial →
# delete; a handful carry preceding-context conditions (checked in code).
_TENSE_PLAIN = _sorted_rules(
    [
        ("ேன்", P), ("ாய்", P), ("ார்", P), ("ாள்", P), ("ான்", P),
        ("ீர்", P), ("ீயர்", P),
        ("ாம்", P), ("ேம்", P), ("ெம்", P), ("ோம்", P),
        ("னென்", None), ("னம்", None), ("பம்", None),
        ("பர்", None), ("பள்", None), ("பன்", None),
        ("னர்", None), ("வர்", None), ("வள்", None), ("னள்", None),
        ("வன்", None),
        ("னார்", None), ("னாள்", None), ("னான்", None), ("னன்", None),
        ("மின்", None), ("மார்", None), ("பின்", None),
        ("கிற", None), ("கின்ற", None), ("ாநின்ற", None),
        ("கிறேன்", None), ("கிறாய்", None), ("கிறான்", None), ("கிறாள்", None), ("கிறார்", None), ("கிறது", None), ("கிறோம்", None), ("கிறீர்", None), ("கிறீர்கள்", None), ("கிறார்கள்", None), ("கிறனர்", None), ("கின்றேன்", None), ("கின்றாய்", None), ("கின்றான்", None), ("கின்றாள்", None), ("கின்றார்", None), ("கின்றது", None), ("கின்றோம்", None), ("கின்றீர்", None), ("கின்றீர்கள்", None), ("கின்றார்கள்", None), ("கின்றனர்", None), ("ாநின்றேன்", None), ("ாநின்றாய்", None), ("ாநின்றான்", None), ("ாநின்றாள்", None), ("ாநின்றார்", None), ("ாநின்றது", None), ("ாநின்றோம்", None), ("ாநின்றீர்", None), ("ாநின்றீர்கள்", None), ("ாநின்றார்கள்", None), ("ாநின்றனர்", None),
        # future ப-forms strip the PERSON ending only, leaving ப் for
        # the ending fixes (probed r6: கேட்பான்→கேட்ப்→கேள் via the
        # ட்ப்→ள் rule, கற்பான்→கற்ப்→க via the stop்stop் drop — the
        # old whole-suffix delete skipped the intermediate ப் state and
        # mis-stemmed stop-final stems). பது stays a delete: the oracle
        # reaches it as து-strip then bare-ப delete (கேட்பது→கே).
        ("பேன்", "ப்"), ("பாய்", "ப்"), ("பான்", "ப்"), ("பாள்", "ப்"),
        ("பார்", "ப்"), ("பது", None), ("போம்", "ப்"), ("பீர்", "ப்"),
        ("பீர்கள்", "ப்"), ("பார்கள்", "ப்"),
        ("விந்தது", None), ("வித்தது", None), ("பிந்தது", None),
        ("பித்தது", None), ("னிர்", P),
        ("த்தேன்", None), ("த்தாய்", None), ("த்தான்", None), ("த்தாள்", None), ("த்தார்", None), ("த்தது", None), ("த்தோம்", None), ("த்தீர்", None), ("த்தீர்கள்", None), ("த்தார்கள்", None), ("த்தனர்", None), ("ந்தேன்", None), ("ந்தாய்", None), ("ந்தான்", None), ("ந்தாள்", None), ("ந்தார்", None), ("ந்தது", None), ("ந்தோம்", None), ("ந்தீர்", None), ("ந்தீர்கள்", None), ("ந்தார்கள்", None), ("ந்தனர்", None),
        ("ிற்று", None), ("தான", None), ("ின்", P), ("ும்", P),
        ("னை", None), ("வை", None), ("ென", P),
        ("பித்து", None), ("பிந்து", None), ("வித்து", None),
        ("விந்து", None), ("பிவது", None), ("விவது", None),
        ("பிய", None), ("விய", None),
        ("ா", P),
        ("க", None), ("த", None), ("ப", None), ("ன", None),
        ("வ", None), ("ய", None),
    ]
)


_TENSE_LONG = [r for r in _TENSE_PLAIN if len(r[0]) >= 3]
_TENSE_SHORT = [r for r in _TENSE_PLAIN if len(r[0]) < 3]


def _tense_once(w: str) -> str | None:
    # among longest-match: the conditioned 2-cp து slots between the
    # >=3-cp entries (வது first!) and the shorter ones
    out = _among(w, _TENSE_LONG)
    if out is not None:
        return out
    if w.endswith("து") and len(w) >= 3 and w[-3] not in SIMPLE_SIGNS:
        return w[:-2]
    return _among(w, _TENSE_SHORT)


def tamil(word: str) -> str:
    w = _fix_endings(word)
    if not _long(w):
        return w
    w = _prefixes(w)

    if _long(w):
        out = _among(w, _QUESTION_SUFFIX)
        if out is not None:
            w = _fix_endings(out)
    if _long(w):
        out = _um_once(w)
        if out is not None:
            fixed = _fix_ending_once(out)
            if isinstance(fixed, tuple):
                fixed = fixed[0]
            w = fixed or out
    if _long(w):
        out = _common_a_once(w)
        if out is not None:
            w = _fix_endings(out)
    if _long(w):
        out = _vetrumai_once(w)
        if out is not None:
            w = _fix_endings(out)
    if _long(w):
        out = _plural_once(w)
        if out is not None:
            w = out  # plural does NOT run fix_endings (probed: சனங்கள்→சனங்)
    if _long(w):
        out = _common_b_once(w)
        if out is not None:
            w = _fix_endings(out)
    # tense tail (gated len>4): each pass = one among match + fix_endings
    # so a fix can expose the next suffix (…ாவேன் → ாவ் → ா → ்); one
    # trailing fix_endings runs even when no pass fired (…ெங் → ெம்),
    # but nothing at all below the length gate (சனங்கள் → சனங் stays)
    if _long(w):
        for _ in range(len(word) + 4):
            out = _tense_once(w)
            if out is None:
                break
            w = _fix_endings(out, tail=True)
            if not _long(w):
                break
        w = _fix_endings(w, tail=True)
    return w


tamil.probe_suffixes = [
    "கள்", "ங்கள்", "ை", "யை", "னை",
    "ில்", "ின்", "ால்", "ுக்கு", "க்கு", "ும்", "ா", "ே", "ோ",
    "கிறேன்", "ந்தேன்", "த்தேன்", "ப்பேன்", "வேன்", "ந்து", "த்து",
    "ிலிருந்து", "ோடு", "ுடைய", "ாக", "ான", "ாவது", "ட்கள்", "ற்கள்",
]
