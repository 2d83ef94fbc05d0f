"""Snowball stemmer: Tamil — EXPERIMENTAL, NOT REGISTERED.

Partial reverse-derivation of the published algorithm
(snowballstem.org/algorithms/tamil/stemmer.html, by Damodharan V.)
against the stopword-free PostgreSQL snowball oracle. Current agreement:
100% on 333 well-formed inflections (tests/test_tamil_experimental.py
pins them) and on the curated real-word corpus, but only ~51% on random
legal-script letter sequences — the oracle's per-rule letter-count gates
and fix_endings repeat semantics are not yet pinned, so this stays BELOW
the 100%-on-probe-suite bar every registered language meets, and
STEMMERS deliberately omits it (filter_stemming('tamil') raises).
Reference accepts 'tamil' in bayard/src/index/token_filter/stemming.rs:249-265.

Known-unfitted oracle behaviors (measured, for the next iteration):
- ablative strips 'ிருந்து' leaving ில் when vetrumai already passed
  (அயிலிருந்து→அயில்), vs my whole-'ிலிருந்து' treatment;
- bare-consonant finals keep (no pulli fix) after some strips at short
  lengths (அசரநகள்→அசரந) — the pulli fix has its own length gate;
- several suffixes (ான, வது, ாக…) have higher min-length gates than
  fitted here (ஆவான keeps whole at 5 cp);
- ும்/ோம் handling at 4 cp differs (ஆமோம்→ஆம்).

Pipeline (each step verified word-by-word against the oracle; the order
matters — e.g. case endings strip BEFORE the plural so
புத்தகங்களில் → புத்தகங்கள் → புத்தகம், while the dative strips AFTER it
so புத்தகங்களுக்கு keeps its கள்):

  question/emphatic clitics → case endings (vetrumai urupukal) →
  plural → common word endings (dative, adverbial) → tense
  (person endings then tense markers), with sandhi-undoing ending fixes
  after each strip (ட்ட்→டு, ற்ற்→று, த்த்→ம், glide ய்/வ் removal,
  final bare consonant gets its pulli).
"""

from __future__ import annotations

PULLI = "்"
SIGNS = "ாிீுூெேைொோௌ"
_U = "ு"


def _letters(w: str) -> int:
    """Count Tamil letters: a base char plus its combining signs/pulli."""
    n = 0
    for ch in w:
        if ch not in SIGNS and ch != PULLI:
            n += 1
    return n


def _fix_endings(w: str) -> str:
    """Undo the join sandhi after a suffix strip (oracle-verified):
    doubled stops re-simplify (வீட்ட்→வீடு, ஆற்ற்→ஆறு, மரத்த்→மரம்),
    a dangling glide ய் after a vowel sign drops (கதைய்→கதை), and a
    final bare consonant regains its pulli (கடல→கடல்)."""
    for dbl, rep in (("ட்ட", "டு"), ("ற்ற", "று"), ("த்த", "ம்")):
        if w.endswith(dbl + PULLI):
            return w[: -len(dbl) - 1] + rep
        if w.endswith(dbl):
            return w[: -len(dbl)] + rep
    if (w.endswith("ய்") and len(w) >= 3 and w[-3] in SIGNS
            and w[-3] not in "ுூ"):
        return w[:-2]
    if (w.endswith("ய") and len(w) >= 2 and w[-2] in SIGNS
            and w[-2] not in "ுூ"):
        return w[:-1]
    if w and w[-1] not in SIGNS and w[-1] != PULLI and _is_cons(w[-1]):
        return w + PULLI
    return w


_CONS = set("கஙசஞடணதநபமயரலவழளறனஜஷஸஹ")
_INDEP_V = set("அஆஇஈஉஊஎஏஐஒஓஔ")


def _is_cons(ch: str) -> bool:
    return ch in _CONS


def _strip(w: str, suf: str, min_letters: int = 0) -> str | None:
    if w.endswith(suf) and (min_letters == 0
                            or _letters(w) >= min_letters):
        return w[: -len(suf)]
    return None


def _question(w: str) -> str:
    # final ா / ே / ோ clitics on long-enough words (புத்தகமா→புத்தகம்,
    # கதையா→கதை; வீடா stays)
    if len(w) >= 5:
        for sign in ("ா", "ே", "ோ"):
            if w.endswith(sign):
                return _fix_endings(w[:-1])
    return w


def _um(w: str) -> str:
    out = _strip(w, "ும்", 0)
    if out is not None:
        return _fix_endings(out)
    return w


_VETRUMAI_LONG = ["ிலிருந்து", "ுடைய", "ிடம்", "ோடு"]
# the short case endings need a longer word so a stem's own ending
# survives (கடலால்→கடல் but பால் stays after பாலும்→பால்)
_VETRUMAI_SHORT = ["ால்", "ில்", "ின்"]


def _vetrumai(w: str) -> str:
    # accusative ை needs a join context: a glide (யை), an n (னை), or a
    # doubled stop before it (வீட்டை→வீடு); plain லை/etc keep (கடலை).
    # For யை only the ை drops — the glide fix decides the ய itself
    # (கதையை→கதை but தெருயை→தெருய்)
    if w.endswith("யை"):
        return _fix_endings(w[:-1])
    out = _strip(w, "னை")
    if out is not None:
        return _fix_endings(out)
    if w.endswith("ழை"):
        return w[:-1] + PULLI
    if w.endswith("ளை"):
        # plural-accusative: drop the ை, the plural step takes the கள்
        # (புத்தகங்களை → புத்தகங்கள் → புத்தகம்)
        return w[:-1] + PULLI
    if w.endswith("ை") and len(w) >= 4 and w[-2] in _CONS \
            and w[-3] == PULLI:
        return _fix_endings(w[:-1])
    for suf in _VETRUMAI_LONG:
        out = _strip(w, suf)
        if out is not None:
            return _fix_endings(out)
    for suf in _VETRUMAI_SHORT:
        if w.endswith(suf) and len(w) >= 5:
            return _fix_endings(w[: -len(suf)])
    return w


def _plural(w: str) -> str:
    if w.endswith("ங்கள்") and _letters(w) >= 6:
        return w[: -len("ங்கள்")] + "ம்"
    if w.endswith("ீர்கள்"):
        return w  # 2pl person ending, not a plural (tense handles it)
    for suf in ("க்கள்", "கள்"):
        out = _strip(w, suf)
        if out is not None:
            return _fix_endings(out)
    return w


_COMMON = ["ிருந்து", "ுக்கு", "க்கு", "ாகிய", "ாவது", "ாக", "ான"]


def _common(w: str) -> str:
    for suf in _COMMON:
        out = _strip(w, suf)
        if out is not None:
            return _fix_endings(out)
    return w


# person endings split into sign-led (their strip exposes a bare tense
# marker and allows the doubled-stop undouble: அவன்ட்டேன்→அவன்டு) and
# plain (no undouble afterwards: அறிட்டது→அறிட்ட)
_PERSON_SIGN = [
    "ீர்கள்", "ார்கள்", "ேன்", "ான்", "ாள்", "ார்",
    "ோம்",
]
_PERSON_PLAIN = ["னர்", "து", "ன"]
# the plain 'து' strips only when NOT preceded by a vowel sign
# (உண்து→உண், எடுத்தது→எடு; but அறிது keeps)
# tense markers as they appear after a person strip (no trailing pulli)
_TENSE = [
    "க்கின்ற", "கின்ற", "க்கிற", "கிற",
    "ந்த", "த்த", "ப்ப", "வ",
]


def _undouble(w: str) -> str:
    if w.endswith("ட்ட"):
        return w[:-3] + "டு"
    if w.endswith("ற்ற"):
        return w[:-3] + "று"
    return w


def _tense(w: str) -> str:
    if len(w) < 5:
        return w
    # participle/infinitive forms with no person ending strip directly;
    # short stems strip only the து (வந்து→வந், but படித்து→படி)
    for suf in ("ந்து", "த்து"):
        if w.endswith(suf):
            if len(w) - len(suf) >= 3:
                return w[: -len(suf)]
            return _fix_endings(w[:-2])
    # bare infinitives (படிக்க→படி, செய்ய→செய், பார்க்க→பார்)
    if w.endswith("க்க") and len(w) >= 6:
        return _fix_endings(w[:-3])
    if w.endswith("ய") and len(w) >= 5 and w[-2] == PULLI:
        return w[:-1]
    sign_hit = False
    hit = False
    for suf in _PERSON_SIGN:
        out = _strip(w, suf)
        if out is not None:
            w = out
            hit = sign_hit = True
            break
    if not hit:
        for suf in _PERSON_PLAIN:
            out = _strip(w, suf)
            if out is not None:
                if suf == "து" and out and out[-1] in SIGNS:
                    continue
                w = out
                hit = True
                break
    markers = _TENSE + (["ற்ற"] if sign_hit else [])
    for suf in markers:
        if w.endswith(suf):
            return w[: -len(suf)]
    # a bare த tense remnant after a glide stem (செய்தேன்→செய்த→செய்)
    if hit and w.endswith("ய்த"):
        return w[:-1]
    if sign_hit:
        return _undouble(w)
    return w


def tamil(word: str) -> str:
    w = word
    if _letters(w) < 3:
        return w
    w = _question(w)
    w = _um(w)
    w = _vetrumai(w)
    w = _plural(w)
    before = w
    w = _common(w)
    w = _tense(w)
    # glide வ் before a bare இ ending re-simplifies (கல்வி→கல்,
    # கல்விகள்→கல்வி→கல்) — but not after a dative/tense strip
    # (கல்விக்கு→கல்வி stays)
    if w == before and w.endswith("வி") and len(w) >= 5 \
            and w[-3] == PULLI:
        w = w[:-2]
    return w


tamil.probe_suffixes = [
    "கள்", "ங்கள்", "ை", "யை",
    "ில்", "ின்", "ால்", "ுக்கு",
    "க்கு", "ும்", "ா", "ே",
    "கிறேன்", "ந்தேன்", "த்தேன்",
    "ப்பேன்", "வேன்", "ந்து", "த்து",
]
