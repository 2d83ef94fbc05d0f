"""Pins oracle-verified Turkish stemmer semantics (every pair confirmed
against the stopword-free PostgreSQL dict_snowball oracle word-by-word).
The full golden suite lives in tests/data/snowball/turkish.tsv (11,974
pairs, 100% agreement); this file guards the derived mechanics (scanning
vowel harmony, buffer policies, continuation chains) with readable cases.
"""

import pytest

from bayard_spark.analysis.snowball.turkish import turkish

VERIFIED = [
    # definite-article-ish / simple suffixes
    ("kitaplar", "kitap"), ("evler", "ev"), ("evleri", "ev"),
    ("evlerim", "ev"), ("kitapları", "kitap"),
    # harmony scans ALL earlier vowels, not just the adjacent one
    ("güzeldü", "güzel"), ("evdü", "evdü"), ("kitapde", "kitap"),
    ("evda", "evda"), ("güzellar", "güzellar"),
    # DI family + buffers
    ("kitapdı", "kitap"), ("kitapti", "kitap"), ("arabaydı", "arap"),
    ("arabadı", "arabadı"), ("kitapydı", "kitapydı"),
    # possessives (no harmony, U buffer after consonants only)
    ("kitapım", "kitap"), ("kitapüm", "kitap"), ("evim", "ev"),
    ("arabayım", "arap"), ("arabaım", "arabaım"),
    # s is kept context, y is consumed
    ("arabası", "arabas"), ("babası", "babas"), ("kitapsı", "kitapsı"),
    ("arabayı", "araba"), ("kitapı", "kitap"), ("kitabı", "kitap"),
    ("arabaı", "arabaı"),
    # n is lenient
    ("arabanın", "araba"), ("kitapnın", "kitapn"),
    ("kitapnda", "kitapn"), ("arabada", "araba"),
    # locative/ki chains
    ("evde", "ev"), ("evdeki", "ev"), ("evdekiler", "evdeki"),
    ("onunki", "o"), ("kitapki", "kitapki"),
    # case chains
    ("evlerinde", "ev"), ("evlerinden", "ev"), ("kitaplarında", "kitap"),
    ("kitabımız", "kitap"), ("kitabımızda", "kitap"),
    ("gözlerimle", "göz"), ("evlerinin", "ev"),
    ("kitapcasına", "kitapca"), ("adamcasına", "adamca"),
    ("delicesine", "delice"), ("arabasına", "araba"),
    # nominal verb chains
    ("kitaplardır", "kitap"), ("kitaplarmış", "kitap"),
    ("kitaplardı", "kitap"), ("kitaplarsa", "kitap"),
    ("kitapmışsınız", "kitap"), ("kitaptırlar", "kitap"),
    ("kitapsınızdır", "kitaps"), ("kitapmuş", "kitapmuş"),
    ("kitapdur", "kitapdur"), ("evsa", "ev"),
    # misc verified
    ("zamanı", "zama"), ("arabaya", "araba"), ("araba", "arap"),
    ("evken", "ev"), ("kitapca", "kitap"),
]


@pytest.mark.parametrize("word,stem", VERIFIED, ids=[w for w, _ in VERIFIED])
def test_verified_pairs(word, stem):
    assert turkish(word) == stem


def test_registered():
    from bayard_spark.analysis.snowball import STEMMERS

    assert STEMMERS["turkish"] is turkish
