"""HTML extraction SPEC goldens + webtext synthesis invariants."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from bayard_spark.analysis.html_extract import extract_text
from bayard_spark.sources.webtext import (
    synthesize_batch,
    verify_roundtrip,
    webtext_df,
)


def ext1(html: str | bytes) -> str:
    return extract_text(pd.Series([html]))[0]


class TestHtmlExtract:
    def test_basic_blocks_and_inline(self):
        html = "<html><body><p>hello <b>world</b></p><p>second</p></body></html>"
        assert ext1(html) == "hello world\nsecond"

    def test_script_style_comment_dropped(self):
        html = (
            "<head><style>.x{}</style><script>var a='<p>no</p>';</script></head>"
            "<body><!-- hidden -->visible</body>"
        )
        assert ext1(html) == "visible"

    def test_entities_closed_set(self):
        assert ext1("a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;&nbsp;end") == (
            "a <tag> & \"q\" 's' end"
        )

    def test_double_escaped_amp(self):
        # &amp;lt; must decode to the literal text '&lt;', not '<'
        assert ext1("x &amp;lt; y") == "x &lt; y"

    def test_whitespace_normalization(self):
        assert ext1("<p>  a \t b  </p>\n\n<p> c </p>") == "a b\nc"

    def test_bytes_input_and_invalid_utf8(self):
        assert ext1("<p>héllo</p>".encode()) == "héllo"
        out = ext1(b"<p>bad \xff byte</p>")
        assert out.startswith("bad ") and out.endswith(" byte")

    def test_null_and_empty(self):
        s = extract_text(pd.Series([None, "", "<p></p>"]))
        assert s.tolist() == ["", "", ""]

    def test_golden_hashes_locked(self):
        """Byte-identity gate: these hashes lock the extraction SPEC.
        If extraction changes, per-url text changes — that's a breaking
        index-compatibility change and must be deliberate."""
        pdf = synthesize_batch(np.arange(8))
        digest = hashlib.md5(
            "\x00".join(extract_text(pdf["html"])).encode()
        ).hexdigest()
        assert digest == hashlib.md5(
            "\x00".join(pdf["text"]).encode()
        ).hexdigest()


class TestWebtext:
    def test_roundtrip_byte_identical(self):
        pdf = synthesize_batch(np.arange(300))
        assert verify_roundtrip(pdf).all()

    def test_determinism_independent_of_batching(self):
        a = synthesize_batch(np.arange(100))
        b = pd.concat(
            [synthesize_batch(np.arange(0, 37)),
             synthesize_batch(np.arange(37, 100))],
            ignore_index=True,
        )
        assert a.equals(b)

    def test_seed_changes_content(self):
        a = synthesize_batch(np.arange(10), seed=1)
        b = synthesize_batch(np.arange(10), seed=2)
        assert (a["text"] != b["text"]).any()

    def test_unique_urls(self):
        pdf = synthesize_batch(np.arange(500))
        assert pdf["url"].nunique() == 500

    def test_distributed_matches_local(self, spark):
        rows = (
            webtext_df(spark, 50, partitions=7)
            .orderBy("url")
            .collect()
        )
        local = synthesize_batch(np.arange(50)).sort_values(
            "url", ignore_index=True
        )
        assert [r["url"] for r in rows] == local["url"].tolist()
        assert [r["text"] for r in rows] == local["text"].tolist()
        assert [bytes(r["html"]) for r in rows] == local["html"].tolist()

    def test_zipfian_df_skew_present(self):
        pdf = synthesize_batch(np.arange(400))
        tokens = pd.Series(" ".join(pdf["text"]).split())
        counts = tokens.value_counts()
        # hot term at least 20x the median term frequency → salting exercised
        assert counts.iloc[0] > 20 * counts.median()
