"""Deterministic Common-Crawl-style webtext synthesis.

Produces the BASELINE input table shape exactly:

    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Determinism contract: every column is a pure function of (seed, doc index) —
independent of partitioning, parallelism, or execution order — via a
vectorized splitmix64 PRNG over numpy uint64. The same (seed, i) yields the
same page on any cluster size, which is also what makes index builds
resumable/replayable.

Round-trip invariant (tested): extract_text(html) == text, byte-identical,
for every row — the html embeds the text paragraphs plus extraction-noise
(scripts, styles, comments, entities) that the extractor SPEC removes.

Scale note: generation runs as mapInPandas over spark.range(n), so a
10^12-row synthesis is embarrassingly parallel with no shuffle and no
driver-side state.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from bayard_spark.analysis.html_extract import extract_text

# ~160-word vocabulary; zipfian sampling gives realistic df skew (a few
# stopword-like hot terms, a long tail) — exercises hot-term salting.
VOCAB = np.array(
    (
        "the of and to a in is it you that he was for on are with as i his "
        "they be at one have this from or had by hot word but what some we "
        "can out other were all there when up use your how said an each she "
        "which do their time if will way about many then them write would "
        "like so these her long make thing see him two has look more day "
        "could go come did number sound no most people my over know water "
        "than call first who may down side been now find any new work part "
        "take get place made live where after back little only round man "
        "year came show every good me give our under name very through just "
        "form sentence great think say help low line differ turn cause much "
        "mean before move right boy old too same tell does set three want "
        "air well also play small end put home read hand port large spell "
        "add even land here must big high such follow act why ask men "
        "change went light kind off need house picture try us again animal "
        "point mother world near build self earth father"
    ).split()
)
LANGS = np.array(["en", "en", "en", "en", "de", "es", "fr", "zh"])
HOSTS = np.array(
    ["example.com", "news.example.org", "blog.example.net", "wiki.example.io",
     "shop.example.co", "docs.example.dev"]
)
WARC_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _rand_u64(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        base = (
            ids.astype(np.uint64) * np.uint64(0x100000001B3)
            + (np.uint64(stream) * np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
            + np.uint64(seed)
        )
    return _splitmix64(base)


def _rand_unit(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return (_rand_u64(ids, stream, seed) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )


def _zipf_word_idx(u: np.ndarray, v: int) -> np.ndarray:
    """Map uniform u∈[0,1) to a rank with P(r) ∝ 1/(r+1): inverse-CDF of the
    truncated zeta via exp — cheap, vectorized, rank 0 hottest."""
    return np.minimum((np.exp(u * np.log(v + 1.0)) - 1.0), v - 1).astype(np.int64)


def synthesize_batch(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate pages for the given doc indices (vectorized, pure)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    if n == 0:
        return pd.DataFrame(
            {"url": pd.Series([], dtype="object"),
             "warc_ts": pd.Series([], dtype="datetime64[us]"),
             "html": pd.Series([], dtype="object"),
             "text": pd.Series([], dtype="object"),
             "lang": pd.Series([], dtype="object")}
        )
    host = HOSTS[(_rand_u64(ids, 1, seed) % np.uint64(len(HOSTS))).astype(int)]
    lang = LANGS[(_rand_u64(ids, 2, seed) % np.uint64(len(LANGS))).astype(int)]
    ts_off = (_rand_u64(ids, 3, seed) % np.uint64(365 * 24 * 3600)).astype(
        "timedelta64[s]"
    )
    warc_ts = WARC_EPOCH + ts_off
    urls = np.array(
        [f"https://{h}/page/{i}" for h, i in zip(host, ids)], dtype=object
    )

    # body: n_para paragraphs of n_words zipf-sampled words
    n_para = (2 + (_rand_u64(ids, 4, seed) % np.uint64(4))).astype(int)  # 2..5
    words_per = (20 + (_rand_u64(ids, 5, seed) % np.uint64(40))).astype(int)  # 20..59
    texts = []
    htmls = []
    v = len(VOCAB)
    for k in range(n):
        i = ids[k]
        paras = []
        for p in range(n_para[k]):
            # one vectorized draw per paragraph
            widx = _zipf_word_idx(
                _rand_unit(
                    np.arange(words_per[k], dtype=np.int64)
                    + i * np.int64(1 << 20)
                    + np.int64(p) * np.int64(1 << 14),
                    6,
                    seed,
                ),
                v,
            )
            paras.append(" ".join(VOCAB[widx]))
        text = "\n".join(paras)
        texts.append(text)
        title = paras[0].split(" ", 3)
        title = " ".join(title[:3])
        noise_u = _rand_u64(np.array([i]), 7, seed)[0]
        script = (
            "<script type='text/javascript'>var t=%d;</script>" % (noise_u % 1000)
            if noise_u % 3 == 0
            else ""
        )
        style = "<style>.c%d{color:red}</style>" % (noise_u % 7) if noise_u % 4 == 0 else ""
        comment = "<!-- crawl id %d -->" % i if noise_u % 2 == 0 else ""
        body = "".join(
            f"<p>{p}</p>" for p in paras
        )
        html = (
            f"<html><head><title>{title}</title>{style}{script}</head>"
            f"<body>{comment}<div class=\"main\">{body}</div>"
            f"<footer>&amp;copy {2024 + int(noise_u % 2)}</footer></body></html>"
        )
        htmls.append(html.encode("utf-8"))
    # title + footer become extra text lines under the extraction SPEC; fold
    # them into the text column so the round-trip invariant holds exactly.
    full_texts = []
    for k in range(n):
        title_line = " ".join(texts[k].split("\n")[0].split(" ")[:3])
        noise_u = _rand_u64(np.array([ids[k]]), 7, seed)[0]
        footer = f"&copy {2024 + int(noise_u % 2)}"
        full_texts.append(title_line + "\n" + texts[k] + "\n" + footer)
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(warc_ts),
            "html": htmls,
            "text": full_texts,
            "lang": lang,
        }
    )


WEBTEXT_SCHEMA = (
    "url string, warc_ts timestamp_ntz, html binary, text string, lang string"
)


def webtext_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic synthesis: spark.range(n) → mapInPandas."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield synthesize_batch(pdf["id"].to_numpy(), seed)

    return rng.mapInPandas(gen, WEBTEXT_SCHEMA)


def verify_roundtrip(pdf: pd.DataFrame) -> pd.Series:
    """Boolean Series: extract_text(html) == text, byte-identical."""
    return extract_text(pdf["html"]).reset_index(drop=True) == pdf[
        "text"
    ].reset_index(drop=True)
