"""Generate NATURAL inflected word forms for the oracle-fitted Snowball
ports (turkish / arabic / greek / tamil) — VERDICT r5 Next #7: the
real-word held-out sets (138-298 words/language) are thin for a 100%
claim; this grows each to >=1k natural inflections.

Each generator expands real lemmas through regular inflectional
paradigms with the language's morphophonology applied:
- Turkish: 2-way/4-way vowel harmony, d/t voicing assimilation,
  final-stop voicing before vowel-initial suffixes (kitap -> kitabı,
  encoded per-lemma), buffer y/s/n, -Iyor vowel drop (iste -> istiyor).
- Arabic: productive clitics (ال، و، ب، ل، ك), pronominal suffixes
  with ة -> ت before suffixes (مدرسة -> مدرستها), productive dual,
  sound verb prefix/suffix paradigm (hamza-initial and assimilating
  roots excluded — their forms aren't concatenative).
- Greek: declension classes split by accent position (oxytone lemmas
  take accented endings: γιατρός -> γιατρού; paroxytones take plain:
  δρόμος -> δρόμου); accent-shifting proparoxytone nouns contribute
  only their accent-stable cells.
- Tamil: -ம் oblique in -த்த- with plural -ங்கள், final-டு/று
  gemination (வீடு -> வீட்டில்), y/v glides after front/round vowels
  (தலையை, தெருவில்), verb tense stems x person endings.

Every emitted string is a real word form: lemma lists avoid known
irregulars (Turkish su, Arabic امرأة/وصل, Greek contracted τρώω/λέω)
rather than emitting wrong regularizations. The PostgreSQL
dict_snowball oracle then defines the expected stem for each form
(tools/snowball_check.py pg_stem), and agreement with the pure-Python
port is reported; random-string coverage is separate (40k-92k
probes/language in snowball_check).

Usage:
    python tools/inflect_gen.py <lang>            # report agreement
    python tools/inflect_gen.py <lang> --dump     # merge with the
        hand-written tools/snowball_vocab/real/<lang>.txt list and
        rewrite tests/data/snowball/<lang>_realwords.tsv

Requires the postgres oracle (server setup: tools/snowball_check.py
docstring).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.snowball_check import pg_stem  # noqa: E402

from bayard_spark.analysis.snowball import STEMMERS  # noqa: E402

# ------------------------------------------------------------- turkish

_TR_BACK = set("aıou")
_TR_FRONT = set("eiöü")
_TR_ROUND = set("oöuü")
_TR_VOICELESS = set("pçtkfhsş")
_TR_VOWELS = _TR_BACK | _TR_FRONT


def _tr_last_vowel(w: str) -> str:
    for c in reversed(w):
        if c in _TR_VOWELS:
            return c
    return "e"


def _tr_add(w: str, suf_tmpl: str) -> str:
    """Attach a suffix template: A = 2-way vowel, I = 4-way vowel,
    D = d/t by voicing, Y/S = buffer consonant only after a vowel.
    Harmony is re-evaluated per vowel slot."""
    out = w
    for ch in suf_tmpl:
        if ch == "A":
            out += "a" if _tr_last_vowel(out) in _TR_BACK else "e"
        elif ch == "I":
            v = _tr_last_vowel(out)
            if v in _TR_BACK:
                out += "u" if v in _TR_ROUND else "ı"
            else:
                out += "ü" if v in _TR_ROUND else "i"
        elif ch == "D":
            out += "t" if out[-1] in _TR_VOICELESS else "d"
        elif ch == "Y":
            if out[-1] in _TR_VOWELS:
                out += "y"
        elif ch == "S":
            if out[-1] in _TR_VOWELS:
                out += "s"
        else:
            out += ch
    return out


# (citation form, pre-vowel stem) — differs when the final stop voices
# before a vowel-initial suffix (kitap -> kitabı) or the vowel drops
# (şehir -> şehri)
_TR_NOUNS = [
    ("ev", "ev"), ("araba", "araba"), ("okul", "okul"),
    ("kitap", "kitab"), ("kalem", "kalem"), ("masa", "masa"),
    ("kapı", "kapı"), ("pencere", "pencere"), ("şehir", "şehr"),
    ("ülke", "ülke"), ("deniz", "deniz"), ("göz", "göz"),
    ("gün", "gün"), ("yıl", "yıl"), ("hafta", "hafta"),
    ("sabah", "sabah"), ("akşam", "akşam"), ("gece", "gece"),
    ("çocuk", "çocuğ"), ("kadın", "kadın"), ("adam", "adam"),
    ("arkadaş", "arkadaş"), ("öğrenci", "öğrenci"),
    ("öğretmen", "öğretmen"), ("doktor", "doktor"),
    ("sokak", "sokağ"), ("yol", "yol"), ("ağaç", "ağac"),
    ("çiçek", "çiçeğ"), ("kuş", "kuş"), ("köpek", "köpeğ"),
    ("kedi", "kedi"), ("balık", "balığ"), ("ekmek", "ekmeğ"),
    ("çay", "çay"), ("kahve", "kahve"),
    ("yemek", "yemeğ"), ("para", "para"), ("iş", "iş"),
    ("oda", "oda"), ("bahçe", "bahçe"), ("dağ", "dağ"),
    ("nehir", "nehr"), ("orman", "orman"), ("gemi", "gemi"),
    ("uçak", "uçağ"), ("tren", "tren"), ("otobüs", "otobüs"),
    ("telefon", "telefon"), ("bilgisayar", "bilgisayar"),
    ("müzik", "müziğ"), ("resim", "resm"), ("film", "film"),
    ("oyun", "oyun"), ("top", "top"), ("renk", "reng"),
    ("ses", "ses"), ("söz", "söz"), ("dil", "dil"),
    ("kelime", "kelime"), ("cümle", "cümle"), ("sayfa", "sayfa"),
    ("defter", "defter"), ("çanta", "çanta"), ("anahtar", "anahtar"),
]

_TR_VERBS = [
    ("gel", "gel"), ("git", "gid"), ("al", "al"), ("ver", "ver"),
    ("yap", "yap"), ("gör", "gör"), ("bil", "bil"), ("iste", "iste"),
    ("bekle", "bekle"), ("oku", "oku"), ("yaz", "yaz"),
    ("çalış", "çalış"), ("anla", "anla"), ("sev", "sev"),
    ("koş", "koş"), ("uyu", "uyu"), ("düşün", "düşün"),
    ("öğren", "öğren"), ("başla", "başla"), ("konuş", "konuş"),
    ("dinle", "dinle"), ("sor", "sor"), ("bak", "bak"), ("aç", "aç"),
]


def gen_turkish() -> list[str]:
    words: list[str] = []
    for cite, vstem in _TR_NOUNS:
        vowel_final = cite[-1] in _TR_VOWELS
        words.append(cite)
        words.append(_tr_add(cite, "lAr"))       # plural
        words.append(_tr_add(vstem, "YI") if not vowel_final
                     else _tr_add(cite, "YI"))   # accusative
        words.append(_tr_add(vstem, "YA") if not vowel_final
                     else _tr_add(cite, "YA"))   # dative
        words.append(_tr_add(cite, "DA"))        # locative
        words.append(_tr_add(cite, "DAn"))       # ablative
        words.append(_tr_add(cite, "nIn") if vowel_final
                     else _tr_add(vstem, "In"))  # genitive
        words.append(_tr_add(cite, "m") if vowel_final
                     else _tr_add(vstem, "Im"))  # 1sg poss
        words.append(_tr_add(cite, "mIz") if vowel_final
                     else _tr_add(vstem, "ImIz"))  # 1pl poss
        words.append(_tr_add(vstem if not vowel_final else cite, "SI"))
        words.append(_tr_add(vstem if not vowel_final else cite, "SInDA"))
        words.append(_tr_add(cite, "lArI"))      # pl + 3 poss
        words.append(_tr_add(cite, "lArDA"))
        words.append(_tr_add(cite, "lArDAn"))
        words.append(_tr_add(cite, "mDA") if vowel_final
                     else _tr_add(vstem, "ImDA"))
        words.append(_tr_add(cite, "lArImIz"))
    for stem, vstem in _TR_VERBS:
        words.append(_tr_add(stem, "mAk"))    # infinitive
        words.append(_tr_add(stem, "DI"))     # past 3sg
        words.append(_tr_add(stem, "DIm"))    # past 1sg
        words.append(_tr_add(stem, "DIlAr"))  # past 3pl
        words.append(_tr_add(stem, "mIş"))    # evidential
        words.append(_tr_add(stem, "sA"))     # conditional
        words.append(_tr_add(stem, "mA"))     # verbal noun
        # -Iyor: vowel-final stems drop the final vowel first
        prog = stem[:-1] if stem[-1] in _TR_VOWELS else stem
        words.append(_tr_add(prog, "Iyor"))
        words.append(_tr_add(prog, "Iyorum"))
        words.append(_tr_add(prog, "IyorlAr"))
        # future / participle: buffer y after vowel-final stems
        words.append(_tr_add(vstem, "YAcAk"))
        words.append(_tr_add(vstem, "YAn"))
    return words


# -------------------------------------------------------------- arabic

_AR_NOUNS = """
كتاب قلم بيت باب مدرسة مدينة بلد ولد بنت رجل طالب معلم درس علم
عمل يوم ليلة شمس قمر بحر نهر جبل شجرة زهرة طعام خبز لحم سوق شارع
سيارة طائرة قطار هاتف حاسوب صورة فيلم لعبة كرة لون صوت كلمة جملة صفحة
دفتر حقيبة مفتاح نافذة غرفة مطبخ حديقة صديق جار طبيب مستشفى جامعة
""".split()

# sound triliteral roots only: hamza-initial (أكل), hamza-final (قرأ)
# and assimilating-waw (وصل) roots have non-concatenative forms
_AR_VERBS = """
كتب درس عمل فتح دخل خرج ذهب رجع سمع نظر جلس شرب لعب سكن عرف
سأل حمل فهم نزل ضرب
""".split()


def gen_arabic() -> list[str]:
    words: list[str] = []
    for n in _AR_NOUNS:
        words.append(n)
        words.append("ال" + n)          # definite
        words.append("و" + n)           # and-
        words.append("وال" + n)         # and-the-
        words.append("ب" + n)           # with-
        words.append("بال" + n)         # with-the-
        words.append("لل" + n)          # to-the- (ل+ال -> لل)
        words.append("كال" + n)         # like-the-
        words.append("فال" + n)         # so-the-
        # suffixes attach to ت for ة-final nouns (مدرسة -> مدرستها)
        base = n[:-1] + "ت" if n.endswith("ة") else n
        for poss in ("ه", "ها", "هم", "نا", "كم", "ي", "ك"):
            words.append(base + poss)
        words.append("و" + base + "ه")
        words.append("ب" + base + "ها")
        words.append(base + "ان")       # dual (fully productive)
        words.append(base + "ين")
    for v in _AR_VERBS:
        words.append(v)
        words.append("ي" + v)           # imperfect 3m
        words.append("ت" + v)           # imperfect 3f/2m
        words.append("ن" + v)           # imperfect 1pl
        words.append("أ" + v)           # imperfect 1sg
        words.append("ي" + v + "ون")    # imperfect 3mpl
        words.append("ت" + v + "ون")
        words.append(v + "وا")          # perfect 3mpl
        words.append(v + "نا")          # perfect 1pl
        words.append(v + "ت")           # perfect 3f.sg
        words.append("سي" + v)          # future
        words.append("وي" + v)
    return words


# --------------------------------------------------------------- greek

# full -ος paradigm, split by accent position: paroxytones take plain
# endings, oxytones take accented endings
_EL_MASC_OS_PAROX = """
δρόμος φίλος κήπος τοίχος λόγος νόμος τόπος χρόνος κόσμος ύπνος μύθος
φόβος πόνος γάμος ώμος δίσκος κύκλος φόρος πύργος πάγος στίχος ήχος
ύμνος
""".split()
_EL_MASC_OS_OXY = """
γιατρός ουρανός αδερφός καιρός θεός ποταμός λαός ναός
αετός σκοπός χορός βυθός καπνός αριθμός σταθμός σεισμός
λογαριασμός πολιτισμός οργανισμός
""".split()
_EL_FEM = """
ώρα μέρα γλώσσα θάλασσα χώρα καρδιά δουλειά χαρά φωνή αγορά
εικόνα ελπίδα πατρίδα εφημερίδα οικογένεια ιστορία πόρτα λίμνη βροχή γραμμή
αγάπη νίκη τέχνη ψυχή αρχή ζωή αυλή βουλή φωτιά ματιά
καρέκλα κουζίνα βιβλιοθήκη εκκλησία πλατεία γειτονιά δασκάλα μητέρα γάτα κότα
""".split()
# neuter -ο/-ό with stable accent: full paradigm
_EL_NEUT_O = "βουνό νερό φυτό δέντρο βιβλίο σχολείο".split()
# accent-shifting proparoxytones: only the accent-stable cells
_EL_NEUT_PROP = "δωμάτιο πρόσωπο παράθυρο αυτοκίνητο".split()
_EL_NEUT_I = """
παιδί ψωμί κρασί τυρί κλειδί νησί χαρτί σπίτι τραπέζι χέρι πόδι μάτι
τραγούδι λουλούδι ποτήρι μαχαίρι αγόρι κορίτσι
""".split()
# -μα neuters whose accent survives the plural (χρώμα -> χρώματα)
_EL_NEUT_MA = "χρώμα πράγμα γράμμα σώμα κύμα".split()
# regular -ω verbs (contracted τρώω/λέω/ακούω/ζω excluded)
_EL_VERBS_O = """
γράφω παίζω διαβάζω ανοίγω κλείνω πίνω βλέπω θέλω
ξέρω φεύγω μένω δίνω παίρνω βρίσκω κάνω έχω
αγοράζω δουλεύω μαθαίνω καταλαβαίνω πιστεύω χορεύω μαγειρεύω ταξιδεύω διδάσκω
τρέχω πλένω ψάχνω φτάνω πιάνω δείχνω ρίχνω στέλνω ντύνω λύνω
σβήνω ανάβω σηκώνω πληρώνω τελειώνω διορθώνω γεμίζω αδειάζω
καθαρίζω γυρίζω νομίζω γνωρίζω ελπίζω αρχίζω χτίζω σκουπίζω ζυγίζω
""".split()
# -ώ verbs of the -είς class (προσπαθώ -> προσπαθείς)
_EL_VERBS_EIS = "προσπαθώ μπορώ οδηγώ τηλεφωνώ θεωρώ".split()
# -ώ verbs of the -άς class (μιλώ -> μιλάς)
_EL_VERBS_AS = """
μιλώ ζητώ αγαπώ ρωτώ περπατώ τραγουδώ απαντώ ξεκινώ πετώ γελώ χτυπώ
""".split()
_EL_ADJ_PAROX = """
μεγάλος ωραίος άσπρος μαύρος κόκκινος πράσινος γαλάζιος κρύος
καινούργιος εύκολος δύσκολος γρήγορος
""".split()
_EL_ADJ_OXY = "μικρός καλός κακός ζεστός παλιός ακριβός φτηνός αργός".split()


def gen_greek() -> list[str]:
    words: list[str] = []
    for w in _EL_MASC_OS_PAROX:
        s = w[:-2]
        words += [w, s + "ου", s + "ο", s + "οι", s + "ων", s + "ους"]
    for w in _EL_MASC_OS_OXY:
        s = w[:-2]  # strips the accented ός
        words += [w, s + "ού", s + "ό", s + "οί", s + "ών", s + "ούς"]
    for w in _EL_FEM:
        words.append(w)
        words.append(w + "ς")  # genitive
        if w.endswith("ά"):
            words.append(w[:-1] + "ές")
        elif w.endswith("ή"):
            words.append(w[:-1] + "ές")
        elif w.endswith("α") or w.endswith("η"):
            words.append(w[:-1] + "ες")
    for w in _EL_NEUT_O:
        if w.endswith("ό"):
            words += [w, w + "ύ", w[:-1] + "ά", w[:-1] + "ών"]
        else:
            words += [w, w + "υ", w[:-1] + "α", w[:-1] + "ων"]
    for w in _EL_NEUT_PROP:
        words += [w, w[:-1] + "α"]  # nominative + plural only
    for w in _EL_NEUT_I:
        if w.endswith("ί"):
            # accent moves onto the ending: παιδί -> παιδιού, παιδιά
            words += [w, w[:-1] + "ιού", w[:-1] + "ιά"]
        else:
            # unaccented -ι: the genitive shifts accent (σπίτι ->
            # σπιτιού) so emit only the accent-stable nom + plural
            # (σπίτια, τραπέζια, χέρια)
            words += [w, w + "α"]
    for w in _EL_NEUT_MA:
        words += [w, w + "τα"]
    for w in _EL_VERBS_O:
        s = w[:-1]
        words += [w, s + "εις", s + "ει", s + "ουμε", s + "ετε",
                  s + "ουν", s + "οντας"]
    for w in _EL_VERBS_EIS:
        s = w[:-1]
        words += [w, s + "είς", s + "εί", s + "ούμε", s + "ούν"]
    for w in _EL_VERBS_AS:
        s = w[:-1]
        words += [w, s + "άς", s + "ά", s + "ούμε", s + "ούν"]
    for w in _EL_ADJ_PAROX:
        s = w[:-2]
        words += [w, s + "η", s + "ο", s + "οι", s + "ες", s + "α",
                  s + "ου", s + "ων"]
    for w in _EL_ADJ_OXY:
        s = w[:-2]
        words += [w, s + "ή", s + "ό", s + "οί", s + "ές", s + "ά",
                  s + "ού", s + "ών"]
    # παλιός: fem is παλιά, not παλιή
    words.remove("παλιή")
    words.append("παλιά")
    return words


# --------------------------------------------------------------- tamil

# -ம் nouns: oblique -த்த-, plural -ங்கள்
_TA_M = ["மரம்", "பழம்", "நகரம்", "பாடம்", "இடம்", "உலகம்", "அறம்",
         "பணம்", "மனம்", "குளம்", "மேகம்", "தேசம்", "வானம்", "பாலம்",
         "நிலம்", "வட்டம்", "சட்டம்", "திட்டம்", "பட்டம்", "குடம்",
         "மணம்", "குணம்", "எண்ணம்", "வண்ணம்", "தோட்டம்"]
# final-டு/று gemination before vowel-initial case (வீடு -> வீட்டில்)
_TA_DOUBLE = ["வீடு", "காடு", "ஆறு", "நாடு", "ஏடு", "கூடு", "மாடு",
              "சேறு"]
# vowel-final with glide: front vowels take ய், rounded take வ்
_TA_Y = ["தலை", "கை", "மலை", "வாழை", "கடை", "இலை", "கதை", "நதி",
         "கிளி", "புலி", "தெரு", "பசு", "விலை", "கலை", "நிலை",
         "மழை", "சாலை", "வேலை", "மேசை", "பனை", "யானை"]
# consonant-final, non-geminating (long-vowel or nasal-final stems:
# vowel cases attach directly, no doubling)
_TA_PLAIN = ["மனிதன்", "மகன்", "அரசன்", "நண்பர்", "ஆசிரியர்",
             "ஊர்", "கால்", "நாய்", "மீன்", "மான்", "தேன்", "பால்",
             "நூல்", "வேர்"]

# verb tense stems (past, present, future) ending in consonant+a;
# person endings attach as vowel signs (வந்த + ான் = வந்தான்)
_TA_VERBS = [
    ("வந்த", "வருகிற", "வருவ"),
    ("போன", "போகிற", "போவ"),
    ("பார்த்த", "பார்க்கிற", "பார்ப்ப"),
    ("படித்த", "படிக்கிற", "படிப்ப"),
    ("சொன்ன", "சொல்கிற", "சொல்வ"),
    ("இருந்த", "இருக்கிற", "இருப்ப"),
    ("செய்த", "செய்கிற", "செய்வ"),
    ("கொடுத்த", "கொடுக்கிற", "கொடுப்ப"),
    ("எடுத்த", "எடுக்கிற", "எடுப்ப"),
    ("நடந்த", "நடக்கிற", "நடப்ப"),
    ("சாப்பிட்ட", "சாப்பிடுகிற", "சாப்பிடுவ"),
    ("எழுதிய", "எழுதுகிற", "எழுதுவ"),
    ("கேட்ட", "கேட்கிற", "கேட்ப"),
    ("ஓடிய", "ஓடுகிற", "ஓடுவ"),
    ("பாடிய", "பாடுகிற", "பாடுவ"),
    ("ஆடிய", "ஆடுகிற", "ஆடுவ"),
    ("தந்த", "தருகிற", "தருவ"),
    ("நின்ற", "நிற்கிற", "நிற்ப"),
    ("கண்ட", "காண்கிற", "காண்ப"),
    ("கற்ற", "கற்கிற", "கற்ப"),
]
_TA_PERSON = ["ான்", "ாள்", "ார்", "ார்கள்", "ேன்", "ோம்", "ீர்கள்"]


def gen_tamil() -> list[str]:
    words: list[str] = []
    for w in _TA_M:
        base = w[:-2]  # strip ம + pulli
        words.append(w)
        words += [base + "த்தை", base + "த்தில்", base + "த்தின்",
                  base + "த்தால்", base + "த்துக்கு",
                  base + "த்திலிருந்து"]
        words += [base + "ங்கள்", base + "ங்களை", base + "ங்களில்",
                  base + "ங்களின்", base + "ங்களுக்கு"]
    for w in _TA_DOUBLE:
        words.append(w)
        # வீடு = ...ட+ு: drop the u sign, geminate the stop with pulli
        obl = w[:-1] + "்" + w[-2]  # வீட்ட — vowel signs attach to it
        words += [obl + "ை", obl + "ில்", obl + "ின்", obl + "ால்",
                  obl + "ுக்கு", obl + "ிலிருந்து"]
        words += [w + "கள்", w + "களை", w + "களில்", w + "களுக்கு"]
    for w in _TA_Y:
        words.append(w)
        # vowel signs attach directly to the bare glide consonant:
        # தலை + ய + ை = தலையை, தெரு + வ + ில் = தெருவில்
        glide = "வ" if w[-1] in "ுூொோ" else "ய"
        g = w + glide
        words += [g + "ை", g + "ில்", g + "ின்", g + "ால்",
                  g + "ிலிருந்து"]
        words += [w + "க்கு", w + "கள்", w + "களில்", w + "களை"]
    for w in _TA_PLAIN:
        words.append(w)
        stem = w[:-1]  # strip pulli: vowel signs attach directly
        words += [stem + "ை", stem + "ின்", stem + "ால்",
                  stem + "ுக்கு", stem + "ில்"]
        if w.endswith("ர்"):
            words += [w + "கள்", w + "களை", w + "களுக்கு"]
    for past, pres, fut in _TA_VERBS:
        for p in _TA_PERSON:
            words.append(past + p)
        for p in ("ான்", "ாள்", "ார்கள்", "ேன்", "ோம்"):
            words.append(pres + p)
            words.append(fut + p)
    return words


GENERATORS = {
    "turkish": gen_turkish,
    "arabic": gen_arabic,
    "greek": gen_greek,
    "tamil": gen_tamil,
}


def main() -> None:
    lang = sys.argv[1]
    gen = GENERATORS[lang]()
    here = os.path.dirname(os.path.abspath(__file__))
    real_path = os.path.join(here, "snowball_vocab", "real", f"{lang}.txt")
    hand: list[str] = []
    if os.path.exists(real_path):
        with open(real_path) as f:
            hand = [w.strip() for w in f if w.strip()]
    seen: set[str] = set()
    words = []
    for w in hand + gen:
        if w and w not in seen:
            seen.add(w)
            words.append(w)
    expected = pg_stem(lang, words)
    fn = STEMMERS[lang]
    bad = [(w, fn(w), e) for w, e in zip(words, expected) if fn(w) != e]
    print(f"{lang}: {len(words)} natural forms "
          f"({len(hand)} hand + {len(words) - len(hand)} generated), "
          f"{len(bad)} mismatches "
          f"({100 * (1 - len(bad) / max(len(words), 1)):.2f}% agreement)")
    for w, got, exp in bad[:30]:
        print(f"  {w!r}: port {got!r} oracle {exp!r}")
    if "--dump" in sys.argv:
        out = os.path.join(
            os.path.dirname(here), "tests", "data", "snowball",
            f"{lang}_realwords.tsv",
        )
        with open(out, "w") as f:
            for w, e in zip(words, expected):
                f.write(f"{w}\t{e}\n")
        print(f"wrote {len(words)} pairs to {out}")


if __name__ == "__main__":
    main()
