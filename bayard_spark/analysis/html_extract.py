"""Deterministic HTML → text extraction, vectorized over pandas Series.

Not present in the reference engine (Bayard indexes pre-extracted text); the
BASELINE input contract requires extracting `text` from an `html:binary`
column with a byte-identical result per url. The extraction SPEC below is
therefore normative for this engine and is locked by golden-fixture tests
(tests/test_html_extract.py); the webtext synthesizer
(bayard_spark.sources.webtext) round-trips against it exactly.

SPEC (applied in order, all steps vectorized pd.Series.str ops):
 1. decode UTF-8 (errors='replace')
 2. drop <script>/<style>/<noscript>/<template> elements incl. content,
    and <!-- comments --> (case-insensitive, dot-matches-newline)
 3. block-level open/close tags (p, br, div, li, ul, ol, h1-h6, tr, table,
    section, article, header, footer, blockquote, pre, hr, title) → '\n'
 4. every remaining tag → '' (inline flow concatenates)
 5. decode the closed entity set: &amp; &lt; &gt; &quot; &#39; &nbsp;
    (&nbsp; → ' '); &amp; decoded LAST so '&amp;lt;' → '&lt;' (literal)
 6. whitespace normalization: [ \t\r\f\v]+ → ' '; strip spaces around
    newlines; collapse \n+ → '\n'; strip leading/trailing whitespace
"""

from __future__ import annotations

import pandas as pd

_BLOCK_TAGS = (
    "p|br|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|section|article|header|"
    "footer|blockquote|pre|hr|title"
)
_DROP_ELEMENT_RE = (
    r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>"
)
_COMMENT_RE = r"(?s)<!--.*?-->"
_BLOCK_TAG_RE = rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*/?>"
_ANY_TAG_RE = r"(?s)<[^>]*>"


def extract_text(html: pd.Series) -> pd.Series:
    """bytes-or-str HTML Series → extracted text Series (see module SPEC)."""
    if len(html) == 0:
        return pd.Series([], dtype="object")
    if html.map(lambda v: isinstance(v, (bytes, bytearray)), na_action="ignore").any():
        s = html.map(
            lambda v: v.decode("utf-8", errors="replace")
            if isinstance(v, (bytes, bytearray))
            else v
        )
    else:
        s = html
    s = s.fillna("").astype(str)
    s = s.str.replace(_DROP_ELEMENT_RE, "", regex=True)
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    s = s.str.replace(_BLOCK_TAG_RE, "\n", regex=True)
    s = s.str.replace(_ANY_TAG_RE, "", regex=True)
    # closed entity set; &amp; last
    s = s.str.replace("&lt;", "<", regex=False)
    s = s.str.replace("&gt;", ">", regex=False)
    s = s.str.replace("&quot;", '"', regex=False)
    s = s.str.replace("&#39;", "'", regex=False)
    s = s.str.replace("&nbsp;", " ", regex=False)
    s = s.str.replace("&amp;", "&", regex=False)
    # whitespace normalization
    s = s.str.replace(r"[ \t\r\f\v]+", " ", regex=True)
    s = s.str.replace(r" ?\n ?", "\n", regex=True)
    s = s.str.replace(r"\n+", "\n", regex=True)
    s = s.str.strip()
    return s
