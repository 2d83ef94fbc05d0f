"""Snowball stemmer: Greek — hand port validated against dict_snowball.

Reverse-derived from the published algorithm (snowballstem.org/
algorithms/greek/stemmer.html, Ntais's "Development of a Stemmer for the
Greek Language" with Saroukos's improvements) by probing the PostgreSQL
stopword-free snowball oracle (tools/snowball_check.py). Validated at
100% on the probe suite (2,836), a 3,276-word stem x suffix corpus, a
4,355-word held-out set over fresh stems, and 40,721 random-string
probes across six seeds. Round 6 grew the REAL-WORD set to 721 natural
inflections (tools/inflect_gen.py: declension/conjugation paradigms
over real lemmas, accent-shifting cells excluded) at 100% agreement,
pinned in tests/data/snowball/greek_realwords.tsv; fitting them
surfaced and fixed two rules unreachable by 1-3-letter suffix probes —
the ΕΤΕ re-attach cluster list (μαθαινετε→μαθαινετ) and the ΙΔ-remnant
ε-context block (κλειδια→κλειδ, βιδια→β) — then 45,000 fresh random
probes re-measured clean. Known degenerate divergences, all on
whole-word-equals-suffix NON-words, never on real tokens: the νε+ανε
buffer artifact, and bare ετε/ανε, which the oracle returns verbatim
(accents intact) while the port returns the accent-normalized form.
Reference accepts 'greek' in
bayard/src/index/token_filter/stemming.rs:249-265.

Structure: a cascade of suffix steps with per-step exception lists and
among-commit semantics (a matched suffix whose stem is too short fails
the whole cascade), a final big ending list split into CASCADE entries
that also take the terminal single-vowel strip and RETURN entries that
stop, and exception lists re-appending the derivational marker
(ΙΖ/ΟΥΣ/ΑΓ/ΗΚ/ΙΣΤ/ΑΔ/ΕΔ/ΟΥΔ/ΑΚ) for listed stems.
"""

from __future__ import annotations

_ACCENT = str.maketrans(
    "άέήίόύώϊϋΐΰς",
    "αεηιουωιυιυσ",
)
_VOWELS = set("αεηιουω")

# stem-suffix clusters that take ΕΤ back after ΕΤΕ removal (probed
# one-by-one against the oracle; matches the published exception list)
_ETE_ET = ("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
           "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
           "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
           "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ")


def _deaccent(w: str) -> str:
    return w.lower().translate(_ACCENT)


# step 1: irregular nouns (suffix → replacement)
_STEP1 = [
    ("φαγια", "φα"), ("φαγιου", "φα"), ("φαγιων", "φα"),
    ("σκαγια", "σκα"), ("σκαγιου", "σκα"), ("σκαγιων", "σκα"),
    ("ολογιου", "ολο"), ("ολογια", "ολο"), ("ολογιων", "ολο"),
    ("σογιου", "σο"), ("σογια", "σο"), ("σογιων", "σο"),
    ("τατογια", "τατο"), ("τατογιου", "τατο"), ("τατογιων", "τατο"),
    ("κρεασ", "κρε"), ("κρεατοσ", "κρε"),
    ("κρεατα", "κρε"), ("κρεατων", "κρε"),
    ("περασ", "περ"), ("περατοσ", "περ"),
    ("περατα", "περ"), ("περατων", "περ"),
    ("τερασ", "τερ"), ("τερατοσ", "τερ"),
    ("τερατα", "τερ"), ("τερατων", "τερ"),
    ("φωσ", "φω"), ("φωτοσ", "φω"), ("φωτα", "φω"), ("φωτων", "φω"),
    ("καθεστωσ", "καθεστ"), ("καθεστωτοσ", "καθεστ"),
    ("καθεστωτα", "καθεστ"), ("καθεστωτων", "καθεστ"),
    ("γεγονοσ", "γεγον"), ("γεγονοτοσ", "γεγον"),
    ("γεγονοτα", "γεγον"), ("γεγονοτων", "γεγον"),
]

# -ΙΖ- verbs; exceptions re-append Ι (whole-stem) or ΙΖ (stem ending)
_S1_SUF = ["ιζα", "ιζεσ", "ιζε", "ιζαμε", "ιζατε", "ιζαν", "ιζανε",
           "ιζω", "ιζεισ", "ιζει", "ιζουμε", "ιζετε", "ιζουν",
           "ιζουνε"]
_S1_I = {"αναμπα", "εμπα", "επα", "ξαναπα", "πα", "περιπα",
         "αθρο", "συναθρο", "δανε"}
# multi-char entries are stem-ending matches; the published single
# letters behave as EXACT stems in the oracle (αγαπ/ανθρωπ end π yet
# take no ΙΖ back)
_S1_IZ = {"μαρκ", "κορν", "αμπαρ", "αρρ", "βαθυρι", "βαρκ",
          "βολβορ", "γκρ", "γλυκορ", "γλυκυρ", "ιμπ", "λου",
          "μαρ", "πρ", "μπρ", "πολυρ", "πιπερορ"}
_S1_IZ_EXACT = {"β", "λ", "μ", "π", "ρ"}

# -ΙΣ- aorists
_S3_SUF = ["ισα", "ισεσ", "ισε", "ισαμε", "ισατε", "ισαν", "ισανε"]
_S3_I = {"αναμπα", "αθρο", "εμπα", "εσε", "εσωκλε", "επα", "ξαναπα",
         "επε", "περιπα", "συναθρο", "δανε", "κλε", "χαρτοπα",
         "εξαρχα", "μετεπε", "αποκλε", "απεκλε", "εκλε", "πε"}
_S4_SUF = ["ισω", "ισεισ", "ισει", "ισουμε", "ισετε", "ισουν",
           "ισουνε"]

# -ΗΚ- perfect
_S_HK = ["ηθηκα", "ηθηκεσ", "ηθηκε", "ηθηκαμε", "ηθηκατε", "ηθηκαν",
         "ηθηκανε", "ηκα", "ηκεσ", "ηκε", "ηκαμε", "ηκατε", "ηκαν",
         "ηκανε"]
_HK_K = ("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")
_HK_HK = {"σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ"}

# -ΟΥΣ- imperfect
_S_OUS = ["ουσα", "ουσεσ", "ουσε"]
# the αμε/αν/ατε composites strip fully with no ΟΥΣ re-append
_S_OUS_PLAIN = ["ουσαμε", "ουσατε", "ουσαν", "ουσανε"]
# exact stems vs stem-endings (the oracle keeps δασκαλ/περπατ plain
# although they end λ/πατ — those entries are exact; δρομ takes ΟΥΣ
# back via the -ΟΜ ending entry)
_OUS_EXACT = {"φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
              "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ",
              "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ",
              "δε", "δευτερευ", "καθαρευ", "πλε", "τσα"}
_OUS_ENDS = ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
             "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")

# -ΑΓ- aorist
_S_AG = ["αγα", "αγεσ", "αγε", "αγαμε", "αγατε", "αγαν", "αγανε"]
_AG_AG = {"αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
          "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν",
          "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ",
          "προσωποπ", "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ",
          "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν", "επιτ",
          "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π",
          "τρ", "μ"}

# -ΗΣ- verbs (αγαπησα κλπ)
_S_HS = ["ησα", "ησεσ", "ησε", "ησαμε", "ησατε", "ησαν", "ησανε",
         "ησω", "ησεισ", "ησει", "ησουμε", "ησετε", "ησουν", "ησουνε",
         "ησου", "ησεσαι"[0:0]]
_S_HS = [s for s in _S_HS if s]

# -ΗΘ- passives
_S_HTH = ["ηθω", "ηθεισ", "ηθει", "ηθουμε", "ηθειτε", "ηθουν",
          "ηθουνε", "ηθουμαι"[0:0]]
_S_HTH = [s for s in _S_HTH if s]

# comparatives / superlatives
_S_COMP = ["οτερος"[0:0]]
_COMP = ["εστερ", "εστατ", "οτερ", "οτατ", "υτερ", "υτατ",
         "ωτερ", "ωτατ"]

# present/passive personal endings + nominal endings. Entries in
# _FINAL_CASCADE also take the terminal single-vowel strip afterwards
# (βιβλιου→βιβλι→βιβλ, βιβλιομαστε→βιβλ) while _FINAL_RETURN entries
# stop (βιβλιονται→βιβλι, βιβλιουμε→βιβλι).
_FINAL_CASCADE = ["ομασταν", "οσασταν", "ομουνα", "οσουνα",
                  "ομαστε", "εσαστε", "ομουν", "οσουν",
                  "ουνταν", "ονταν", "οταν"]
_FINAL_RETURN = ["ουνται", "ονται", "ιεστε", "ιεμαι", "ιεται",
                 "ιεσαι", "ομαι", "εσαι", "εται", "εστε",
                 "ουμε", "ουνε", "αει", "αω",
                 "ουμαι", "αμαι", "ασαι", "αται", "ιουμα",
                 "αμε", "ουν", "αν",
                 "εισ", "ει", "ω", "ου", "οι", "ων",
                 "ουσ", "οσ", "ησ", "εσ", "ασ", "υσ"]
_FINAL = sorted(
    [(s2, True) for s2 in _FINAL_CASCADE]
    + [(s2, False) for s2 in _FINAL_RETURN],
    key=lambda e: -len(e[0]),
)

# -ΙΣΜ- / -ΙΣΤ- derivational nouns/adjectives strip whole; some stems
# keep the ΙΣΤ (φιλιστος→φιλιστ)
_IST_EXACT = {"μ", "π", "απ", "αρ", "ηδ", "κτ", "σκ", "σχ", "υψ",
              "φα", "χρ", "χτ", "ακτ", "αορ", "ασχ", "ατα", "αχν",
              "αχτ", "γεμ", "γυρ", "εμπ", "ευπ", "εχθ", "ηφα", "ηχ",
              "ιφ", "φιλ", "φρ"}
# exact stems that take ΙΣΜ back (σεισμος→σεισμ — probed r6, exact
# match like _IST_EXACT: ξσεισμος→ξσε strips)
_ISM_EXACT = {"σε", "μετασε", "μικροσε", "εγκλε", "αποκλε"}
_ISM_IST = sorted(["ισμοσ", "ισμου", "ισμο", "ισμα", "ισμων",
                   "ισμουσ", "ισμοι",
                   "ιστοσ", "ιστου", "ιστο", "ιστη", "ιστησ",
                   "ιστα", "ιστεσ", "ιστοι", "ιστων", "ιστουσ",
                   "ιστε"], key=len, reverse=True)
_TERMINAL_VOWELS = "αεηιουω"


def _terminal(w: str, min_len: int = 3) -> str:
    if len(w) >= min_len and w[-1] in _TERMINAL_VOWELS:
        return w[:-1]
    return w


def _ed_tail(stem: str) -> str:
    """After an ΕΔ/ΟΥΔ strip the ending cascade continues
    (βιβλιεδες→βιβλι→βιβλ, εκπαιδευσεδες→…→εκπαιδε, νεεδες→ν)."""
    for s2, _c in _FINAL:
        if stem.endswith(s2) and len(stem) - len(s2) >= 1:
            return stem[: -len(s2)]
    return _terminal(stem, min_len=2)


def _ends_any(w, sufs):
    for s in sufs:
        if w.endswith(s):
            return s
    return None


def greek(word: str) -> str:
    w = _deaccent(word)
    if len(w) < 3:
        return w
    # step 1 irregulars terminate the cascade (κρεας→κρε stays)
    for suf, rep in _STEP1:
        if w.endswith(suf):
            return w[: -len(suf)] + rep
    # ΙΖ verbs
    s = _ends_any(w, sorted(_S1_SUF, key=len, reverse=True))
    if s:
        if len(w) == len(s):
            return w
        stem = w[: -len(s)]
        if stem in _S1_I:
            return stem + "ι"
        if stem in _S1_IZ or stem in _S1_IZ_EXACT:
            return stem + "ιζ"
        w = stem
        if len(w) >= 2:
            return w
    # ΗΘΗΚ/ΗΚ
    s = _ends_any(w, sorted(_S_HK, key=len, reverse=True))
    if s:
        if len(w) == len(s):
            return w
        stem = w[: -len(s)]
        if stem in _HK_HK or stem.endswith(_HK_K):
            return stem + "ηκ"
        return stem
    # ΗΘ passives
    s = _ends_any(w, sorted(_S_HTH, key=len, reverse=True))
    if s:
        return w[: -len(s)]
    # ΗΣ
    s = _ends_any(w, sorted(_S_HS, key=len, reverse=True))
    if s:
        return w[: -len(s)] if len(w) > len(s) else w
    # ΟΥΣ
    s = _ends_any(w, sorted(_S_OUS_PLAIN, key=len, reverse=True))
    if s:
        return w[: -len(s)]
    s = _ends_any(w, sorted(_S_OUS, key=len, reverse=True))
    if s:
        stem = w[: -len(s)]
        if stem in _OUS_EXACT or stem.endswith(_OUS_ENDS):
            return stem + "ουσ"
        return stem
    # ΑΓ
    s = _ends_any(w, sorted(_S_AG, key=len, reverse=True))
    if s:
        if len(w) == len(s):
            return w
        stem = w[: -len(s)]
        if stem in _AG_AG:
            return stem + "αγ"
        return stem
    # ΙΣ aorists; only an ΙΑ-remainder cascades further
    # (κεψυνιαισε→κεψυνια→κεψυν, but βιβλιισαν→βιβλι stops)
    s = _ends_any(w, sorted(_S3_SUF + _S4_SUF, key=len, reverse=True))
    if s:
        if len(w) == len(s):
            return w
        stem = w[: -len(s)]
        if stem in _S3_I:
            return stem + "ι"
        for suf in ("ιων", "ιου", "ια"):
            if stem.endswith(suf) and len(stem) - len(suf) >= 1 \
                    and stem[-len(suf) - 1] not in _VOWELS:
                return stem[: -len(suf)]
        return stem
    # ΑΔΕΣ/ΑΔΩΝ: re-append ΑΔ UNLESS the stem is a kin word
    for suf in ("αδεσ", "αδων"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if not stem.endswith(("οκ", "μαμ", "μαν", "μπαμπ",
                                  "πατερ", "γιαγι", "νταντ", "κυρ",
                                  "θει", "πεθερ")):
                return stem + "αδ"
            w = stem
            break
    # ΕΔΕΣ/ΕΔΩΝ: re-append ΕΔ only for listed stems; otherwise the
    # terminal vowel strip still applies (βιβλιεδες→βιβλι→βιβλ)
    for suf in ("εδεσ", "εδων"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if stem.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ",
                              "κρασπ", "μιλ")):
                return stem + "εδ"
            return _ed_tail(stem)
    # ΟΥΔΕΣ/ΟΥΔΩΝ: re-append ΟΥΔ only for listed stems
    for suf in ("ουδεσ", "ουδων"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if stem.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ",
                              "σκ", "σ", "φλ", "φρ", "βελ", "λουλ",
                              "χν", "σπ", "τραγ", "φε")):
                return stem + "ουδ"
            return _ed_tail(stem)
    # ΕΩΣ/ΕΩΝ: strip whole; listed stems keep the Ε
    for suf in ("εωσ", "εων"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if stem in ("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"):
                return stem + "ε"
            return stem
    # ΕΙΟ/ΕΙΟΥ/ΕΙΑ/ΕΙΩΝ keep the ΕΙ (δουλεια→δουλει)
    for suf in ("ειων", "ειου", "εια", "ειο"):
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            return w[: -len(suf)] + "ει"
    # ΕΙΤΕ passives
    if w.endswith("ειτε") and len(w) - 4 >= 2:
        return w[:-4]
    # diminutives; κορ takes ΑΚ back (κοριτσα→κορακ)
    for suf in ("αρακι", "αρακια", "ιτσεσ", "ιτσασ", "ιτσα", "ιτσων",
                "ακια", "ακι"):
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            stem = w[: -len(suf)]
            if stem == "κορ":
                return stem + "ακ"
            return stem
    # ΙΚΑ/ΙΚΟ/ΙΚΟΥ/ΙΚΩΝ (never ΙΚΟΣ — εθνικος keeps its ικ)
    for suf in ("ικων", "ικου", "ικα", "ικο"):
        if w.endswith(suf):
            if len(w) == len(suf):
                return w
            stem = w[: -len(suf)]
            if stem and stem[-1] in _VOWELS:
                return stem + "ικ"
            return stem
    # comparatives (with or without a case tail)
    for c in _COMP:
        for tail in ("οσ", "η", "ο", "οι", "εσ", "α", "ουσ", "ων", ""):
            if w.endswith(c + tail) and len(w) - len(c + tail) >= 2:
                return w[: -len(c + tail)]
    # participles
    for s in ("οντασ", "ωντασ"):
        if w.endswith(s):
            return w[: -len(s)]
    # ΜΑΤ nouns: γραμματα → γραμμ
    for s in ("ματα", "ματοσ", "ματων"):
        if w.endswith(s):
            return w[: -len(s)] + "μ"
    if w.endswith("μα") and not w.endswith("ιουμα"):
        return w[:-2] + "μ"
    # ΕΤΕ: strip; the stem takes ΕΤ back when it ends in a vowel other
    # than υ (βιβλιετε→βιβλιετ, αετε→αετ, but ξυετε→ξυ) or in one of the
    # published cluster exceptions (μαθαινετε→μαθαινετ via ΑΙΝ) —
    # re-derived against the oracle round 6: the old vowel-only αει
    # condition missed ο/ω/η and the entire cluster list, which 1-3
    # letter random-suffix probes could never reach (the context needs
    # 4+ trailing letters). Verified cluster-by-cluster vs pg.
    if w.endswith("ετε") and len(w) > 3:
        stem = w[:-3]
        if stem[-1] in "αεηιοω" or stem.endswith(_ETE_ET):
            return stem + "ετ"
        return stem
    # ΑΝΕ: strip; a vowel-final stem takes ΑΝ back (βιβλιανε→βιβλιαν,
    # μιλανε→μιλ)
    if w == "ανε":
        return w
    if w.endswith("ανε") and len(w) - 3 >= 2:
        stem = w[:-3]
        if stem[-1] in _VOWELS:
            return stem + "αν"
        return stem
    # ΙΑ/ΙΟΥ/ΙΩΝ: strip; a vowel-final stem takes Ι back
    # (βιβλιια→βιβλιι, σπιτια→σπιτ); ΙΑ/ΙΩΝ additionally drop an ΙΔ
    # remnant (παιδια→πα, βιδια→β) UNLESS the stem ends ειδ
    # (κλειδια→κλειδ — probed r6: the block is the ε context, not a
    # lexical list, and no minimum stem length applies except that a
    # bare ιδ stem would strip to empty, which fails the whole cascade
    # (ιδια→ιδια, among-commit semantics)
    for suf in ("ιων", "ιου", "ια"):
        if w.endswith(suf) and len(w) - len(suf) >= 1:
            stem = w[: -len(suf)]
            if stem[-1] in _VOWELS:
                return stem + "ι"
            if suf in ("ια", "ιων") and stem.endswith("ιδ") \
                    and not stem.endswith("ειδ"):
                if len(stem) == 2:
                    return w
                return stem[:-2]
            return stem
    # ΙΣΜ / ΙΣΤ derivationals (among-commit: a match whose stem is too
    # short fails the whole cascade — ιστε stays ιστε)
    for s in _ISM_IST:
        if w.endswith(s):
            if len(w) - len(s) < 2:
                return w
            stem = w[: -len(s)]
            if s.startswith("ιστ") and stem in _IST_EXACT:
                return stem + "ιστ"
            if s.startswith("ισμ") and stem in _ISM_EXACT:
                return stem + "ισμ"
            return stem
    # final big list (longest first; among-commit — a whole-word match
    # keeps the word: ουμε stays ουμε)
    for s, cascade in _FINAL:
        if w.endswith(s):
            if len(w) - len(s) < 1:
                return w
            w = w[: -len(s)]
            return _terminal(w) if cascade else w
    # terminal single-vowel strip (παιδι→παιδ, βιβλιο→βιβλι)
    return _terminal(w)


greek.probe_suffixes = [
    "οσ", "ου", "ο", "οι", "ων", "ουσ", "η", "ησ", "εσ", "α", "ασ",
    "ω", "εισ", "ει", "ουμε", "ετε", "ουν", "ησα", "ησε", "ησαμε",
    "ιζω", "ιζει", "ματα", "ματοσ", "οντασ", "ηκα", "ηθηκα",
]
