"""Snowball stemmers: German, Dutch.

Ports of the published algorithm descriptions
(snowballstem.org/algorithms/{german,dutch}/stemmer.html), validated against
PostgreSQL dict_snowball golden pairs.
"""

from __future__ import annotations

from bayard_spark.analysis.snowball._base import longest_suffix, r1_of, r2_of

# ----------------------------------------------------------------- german

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = set("bdfghklmnt")


def _de_regions(word: str) -> tuple[int, int]:
    r1 = r1_of(word, _DE_VOWELS)
    r2 = r2_of(word, _DE_VOWELS, r1)
    return max(r1, min(3, len(word))), r2


def german(word: str) -> str:
    if len(word) <= 2:
        return word
    word = word.replace("ß", "ss")
    # mark u/y between vowels as consonants
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in "uy"
            and chars[i - 1] in _DE_VOWELS
            and chars[i + 1] in _DE_VOWELS
        ):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1, _ = _de_regions(word)
    # step 1
    suf = longest_suffix(word, ["em", "ern", "er"], r1)
    suf_b = longest_suffix(word, ["e", "en", "es"], r1)
    if suf and (not suf_b or len(suf) >= len(suf_b)):
        word = word[: -len(suf)]
    elif suf_b:
        word = word[: -len(suf_b)]
        # undocumented in older spec, in current: ends 'niss' → drop one s
        if word.endswith("niss"):
            word = word[:-1]
    elif (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in _DE_S_END
    ):
        word = word[:-1]

    # step 2
    r1, _ = _de_regions(word)
    suf = longest_suffix(word, ["en", "er", "est"], r1)
    if suf:
        word = word[: -len(suf)]
    elif (
        word.endswith("st")
        and len(word) - 2 >= r1
        and len(word) >= 6
        and word[-3] in _DE_ST_END
    ):
        word = word[:-2]

    # step 3 (d-suffixes in R2)
    r1, r2 = _de_regions(word)
    suf = longest_suffix(
        word, ["end", "ung", "ig", "ik", "isch", "lich", "heit", "keit"], 0
    )
    if suf in ("end", "ung") and len(word) - len(suf) >= r2:
        word = word[: -len(suf)]
        if (
            word.endswith("ig")
            and len(word) - 2 >= r2
            and not word.endswith("eig")
        ):
            word = word[:-2]
    elif suf in ("ig", "ik", "isch") and len(word) - len(suf) >= r2:
        if not word[: -len(suf)].endswith("e"):
            word = word[: -len(suf)]
    elif suf in ("lich", "heit") and len(word) - len(suf) >= r2:
        word = word[: -len(suf)]
        tail = longest_suffix(word, ["er", "en"], r1)
        if tail:
            word = word[: -len(tail)]
    elif suf == "keit" and len(word) - 4 >= r2:
        word = word[:-4]
        tail = longest_suffix(word, ["lich", "ig"], r2)
        if tail:
            word = word[: -len(tail)]

    word = word.lower()
    return (
        word.replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


# ------------------------------------------------------------------ dutch

_NL_VOWELS = "aeiouyè"


def _nl_regions(word: str) -> tuple[int, int]:
    r1 = r1_of(word, _NL_VOWELS)
    r2 = r2_of(word, _NL_VOWELS, r1)
    return max(r1, min(3, len(word))), r2


def _nl_undouble(word: str) -> str:
    if word[-2:] in ("kk", "dd", "tt"):
        return word[:-1]
    return word


def dutch(word: str) -> str:
    if len(word) <= 2:
        return word
    # fold accents
    table = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
    word = word.translate(table)
    # mark consonantal i/y
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        if (
            chars[i] == "i"
            and chars[i - 1] in _NL_VOWELS
            and i + 1 < len(chars)
            and chars[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    word = "".join(chars)

    r1, r2 = _nl_regions(word)
    # step 1 — Snowball `among` semantics: commit to the LONGEST matching
    # suffix; if its condition fails, the whole step fails (no fallback to a
    # shorter suffix).
    suf = longest_suffix(word, ["heden", "ene", "en", "se", "s"], 0)
    if suf == "heden":
        if len(word) - 5 >= r1:
            word = word[:-5] + "heid"
    elif suf in ("ene", "en"):
        if (
            len(word) - len(suf) >= r1
            and word[: -len(suf)]
            and word[-len(suf) - 1] not in _NL_VOWELS
            and not word[: -len(suf)].endswith("gem")
        ):
            word = _nl_undouble(word[: -len(suf)])
    elif suf in ("se", "s"):
        if (
            len(word) - len(suf) >= r1
            and word[: -len(suf)]
            and word[-len(suf) - 1] not in _NL_VOWELS + "j"
        ):
            word = word[: -len(suf)]

    # step 2: delete e if in R1 and preceded by non-vowel
    e_found = False
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] not in _NL_VOWELS
    ):
        e_found = True
        word = _nl_undouble(word[:-1])

    # step 3a: heid
    if (
        word.endswith("heid")
        and len(word) - 4 >= r2
        and not word.endswith("cheid")
    ):
        word = word[:-4]
        if (
            word.endswith("en")
            and len(word) - 2 >= r1
            and word[:-2]
            and word[-3] not in _NL_VOWELS
            and not word[:-2].endswith("gem")
        ):
            word = _nl_undouble(word[:-2])

    # step 3b: d-suffixes
    r1, r2 = _nl_regions(word)
    suf = longest_suffix(word, ["end", "ing", "ig", "lijk", "baar", "bar"], 0)
    if suf in ("end", "ing") and len(word) - 3 >= r2:
        word = word[:-3]
        if (
            word.endswith("ig")
            and len(word) - 2 >= r2
            and not word.endswith("eig")
        ):
            word = word[:-2]
        else:
            word = _nl_undouble(word)
    elif suf == "ig" and len(word) - 2 >= r2 and not word.endswith("eig"):
        word = word[:-2]
    elif suf == "lijk" and len(word) - 4 >= r2:
        word = word[:-4]
        if (
            word.endswith("e")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] not in _NL_VOWELS
        ):
            word = _nl_undouble(word[:-1])
    elif suf == "baar" and len(word) - 4 >= r2:
        word = word[:-4]
    elif suf == "bar" and len(word) - 3 >= r2 and e_found:
        word = word[:-3]

    # step 4: undouble vowel — C v v C (C≠I, last C not I... per spec d≠I)
    if (
        len(word) >= 4
        and word[-1] not in _NL_VOWELS
        and word[-1] != "I"
        and word[-2] == word[-3]
        and word[-2] in "aeou"
        and word[-4] not in _NL_VOWELS
    ):
        word = word[:-2] + word[-1]

    return word.lower()
