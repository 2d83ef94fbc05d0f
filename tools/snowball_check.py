"""Validate the pure-Python Snowball ports against PostgreSQL dict_snowball.

PostgreSQL compiles the upstream Snowball algorithms (dict_snowball.so), so
ts_lexize('<lang>_stem', word) is ground truth for the same public algorithms
the reference's rust-stemmers uses. This harness probes each port with
(a) a real-word list (tools/snowball_vocab/<lang>.txt, if present),
(b) pseudo-words: sample stems × every suffix in the port's tables,
(c) exhaustive 1..3-letter suffix enumeration over the language's suffix
    alphabet — catches missing short suffixes outright.

Usage:  python tools/snowball_check.py <lang> [--limit-show N]
        python tools/snowball_check.py <lang> --dump-golden <outfile.tsv>
"""

from __future__ import annotations

import itertools
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayard_spark.analysis.snowball import STEMMERS  # noqa: E402

# letters likely to appear in suffixes, per language (probe alphabet)
PROBE_ALPHABET = {
    "danish": "edrnshgt",
    "norwegian": "aedrnshgtv",
    "swedish": "aedrnshgto",
    "german": "esnrtiguhkc",
    "dutch": "esndgtijbalrk",
    "french": "aeiustmnrcx",
    "spanish": "aeiosndrm",
    "portuguese": "aeiosdrmã~",
    "italian": "aeiostnrv",
    "romanian": "aeiăâşţurm",
    "russian": "аеиоуяыйтнсшьлвюм",
    "finnish": "aeiystnkl",
    "hungarian": "aeiostnkl",
    "turkish": "aeiıuünkdlmsy",
    "arabic": "اتيونهمك",
    "greek": "αειουσντμ",
    "tamil": "களனுமைதி",  # no bare pulli: ்-clusters are not suffix material
}
STEMS = {
    "danish": ["kontor", "spis", "læs", "hurtig", "klog", "ven"],
    "norwegian": ["kontor", "spis", "les", "hurtig", "klok", "venn"],
    "swedish": ["kontor", "läs", "snabb", "klok", "vän", "hoppa"],
    "german": ["arbeit", "schnell", "kind", "lauf", "schön", "tag"],
    "dutch": ["werk", "snel", "kind", "loop", "mooi", "dag"],
    "french": ["continu", "nation", "grand", "port", "charg", "fin"],
    "spanish": ["trabaj", "nacion", "grand", "port", "carg", "fin"],
    "portuguese": ["trabalh", "nacion", "grand", "port", "carreg", "fim"],
    "italian": ["lavor", "nazion", "grand", "port", "caric", "fin"],
    "romanian": ["lucr", "natiun", "mar", "port", "inc", "fin"],
    "russian": ["работ", "книг", "стол", "бел", "говор", "сил"],
    "finnish": ["talo", "kirja", "nopea", "puhu", "katu", "vesi"],
    "hungarian": ["asztal", "könyv", "gyors", "beszél", "ház", "víz"],
    "turkish": ["kitap", "ev", "güzel", "konuş", "okul", "araba", "gemi", "oda", "kedi", "kalem"],
    "arabic": ["كتاب", "مدرس", "علم", "قلم"],
    "greek": ["δουλει", "βιβλι", "μεγαλ", "πορτ"],
    "tamil": ["புத்தக", "வீடு"],
}


_NOSTOP_READY: set[str] = set()


def _ensure_nostop(lang: str) -> None:
    """Create a stopword-free snowball dictionary: <lang>_stem ships
    with a stopword list (ts_lexize returns {} for e.g. turkish 'ile'),
    which is NOT stemmer behavior — rust-stemmers has no stopwords."""
    if lang in _NOSTOP_READY:
        return
    r = subprocess.run(
        ["psql", "-h", "/tmp", "-U", "postgres", "-tA"],
        input=("CREATE TEXT SEARCH DICTIONARY {l}_nostop "
               "(TEMPLATE=snowball, Language={l});".format(l=lang)),
        capture_output=True, text=True,
    )
    # only the duplicate-dictionary case is benign; a dead server or a bad
    # language name must fail HERE, not as a confusing missing-dictionary
    # error on the later ts_lexize (ADVICE r3)
    if r.returncode != 0 and "already exists" not in r.stderr:
        raise RuntimeError(
            f"could not create {lang}_nostop dictionary: {r.stderr.strip()!r}"
            " — is the postgres oracle running? See this file's docstring"
            " for server setup."
        )
    _NOSTOP_READY.add(lang)


def pg_stem(lang: str, words: list[str]) -> list[str]:
    """Batch ts_lexize via psql (server on /tmp socket)."""
    _ensure_nostop(lang)
    out: list[str] = []
    for i in range(0, len(words), 5000):
        chunk = words[i : i + 5000]
        arr = ",".join("'" + w.replace("'", "''") + "'" for w in chunk)
        sql = (
            "SELECT coalesce((ts_lexize('{l}_nostop', w))[1], w) "
            "FROM unnest(array[{a}]) AS w".format(l=lang, a=arr)
        )
        r = subprocess.run(
            ["psql", "-h", "/tmp", "-U", "postgres", "-tA"],
            input=sql, capture_output=True, text=True, check=True,
        )
        got = r.stdout.splitlines()
        assert len(got) == len(chunk), (len(got), len(chunk), r.stderr[:400])
        out.extend(got)
    return out


def probe_words(lang: str, fn) -> list[str]:
    words = []
    vocab = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "snowball_vocab",
        f"{lang}.txt",
    )
    if os.path.exists(vocab):
        with open(vocab) as f:
            words += [w.strip().lower() for w in f if w.strip()]
    # internal markers (Y/I/U/He…) never appear in real lowercased input
    suffixes = [
        s for s in (getattr(fn, "probe_suffixes", None) or [])
        if s == s.lower()
    ]
    stems = STEMS.get(lang, ["xyzstem"])
    for s, suf in itertools.product(stems, suffixes):
        words.append(s + suf)
    alpha = PROBE_ALPHABET.get(lang, "")
    if alpha:
        for n in (1, 2, 3):
            for combo in itertools.product(alpha, repeat=n):
                words.append(stems[0] + "".join(combo))
    seen = set()
    uniq = []
    for w in words:
        if w not in seen:
            seen.add(w)
            uniq.append(w)
    return uniq


def main():
    lang = sys.argv[1]
    fn = STEMMERS[lang]
    words = probe_words(lang, fn)
    expected = pg_stem(lang, words)
    if "--dump-golden" in sys.argv:
        out = sys.argv[sys.argv.index("--dump-golden") + 1]
        with open(out, "w") as f:
            for w, e in zip(words, expected):
                f.write(f"{w}\t{e}\n")
        print(f"wrote {len(words)} golden pairs to {out}")
        return
    bad = [(w, fn(w), e) for w, e in zip(words, expected) if fn(w) != e]
    print(f"{lang}: {len(words)} probes, {len(bad)} mismatches "
          f"({100 * (1 - len(bad) / max(len(words), 1)):.2f}% match)")
    for w, got, exp in bad[:40]:
        print(f"  {w!r}: got {got!r} want {exp!r}")


if __name__ == "__main__":
    main()
