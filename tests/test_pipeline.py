"""clean_pipeline: composition identity vs manually-chained production
ops, carry-join semantics, terminal-step enforcement."""

import pytest
from pyspark.sql import functions as F

from bayard_spark.functions.pipeline import clean_pipeline

MOJI = "cafÃ©"  # 'café' read as cp1252


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, f"visit {MOJI} now", "a"),
        (1, "mail bob@example.com for the offer", "a"),
        (2, "shared boiler line\n\nunique two alpha", "b"),
        (3, "shared boiler line\n\nunique three beta", "b"),
        (4, "dup doc body here", "a"),
        (5, "dup doc body here", "b"),
        (6, "tiny", "a"),
        (7, "a longer unique document body with words", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# exact dedup BEFORE paragraph dedup (the RefinedWeb order): a whole-doc
# duplicate is one corpus-duplicated paragraph per paragraph, so running
# para_dedup first would empty BOTH copies instead of keeping one
STEPS = [
    ("mojibake", {}),
    ("pii", {}),
    ("exact_dedup", {}),
    ("para_dedup", {"max_count": 1}),
    ("min_tokens", {"n": 2}),
]


class TestPipeline:
    def test_composition_identity(self, spark, corpus):
        from bayard_spark.functions.dedup import dedupe_exact, paragraph_dedup
        from bayard_spark.functions.encoding import fix_mojibake
        from bayard_spark.functions.textstats import _tokens_col, pii_redact

        got, report = clean_pipeline(corpus, STEPS)
        assert [r["step"] for r in report] == [s[0] for s in STEPS]

        cur = corpus.select("doc_id", "text")
        cur = fix_mojibake(cur).select(
            "doc_id", F.col("text_fixed").alias("text")
        )
        cur = pii_redact(cur).select(
            "doc_id", F.col("text_redacted").alias("text")
        )
        cur = dedupe_exact(cur, ["text"])
        cur = paragraph_dedup(cur, max_count=1).select(
            "doc_id", F.col("text_clean").alias("text")
        )
        cur = cur.where(F.size(_tokens_col("text")) >= 2)

        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, cur.collect())
        )

    def test_expected_effects(self, spark, corpus):
        got, _ = clean_pipeline(corpus, STEPS)
        rows = {r.doc_id: r.text for r in got.collect()}
        assert "café" in rows[0]                       # mojibake repaired
        assert "<EMAIL>" in rows[1]                    # pii redacted
        assert "shared boiler line" not in rows.get(2, "")  # para dedup
        assert 3 in rows and "unique three beta" in rows[3]
        assert (4 in rows) != (5 in rows)              # exact dedup keeps one
        assert 4 in rows                               # min doc_id survives
        assert 6 not in rows                           # min_tokens dropped
        assert 7 in rows

    def test_carry_join(self, spark, corpus):
        got, _ = clean_pipeline(corpus, STEPS, carry=("source",))
        rows = {r.doc_id: r.source for r in got.collect()}
        assert rows[0] == "a" and rows[7] == "b"
        assert set(got.columns) == {"doc_id", "text", "source"}

    def test_count_stages(self, spark, corpus):
        _, report = clean_pipeline(corpus, STEPS, count_stages=True)
        counts = [r["rows"] for r in report]
        assert counts[0] == 8 and counts[1] == 8  # transforms keep all rows
        assert counts[-1] < 8  # filters dropped rows
        assert all(a >= b for a, b in zip(counts[2:], counts[3:]))

    def test_terminal_enforced(self, spark, corpus):
        with pytest.raises(ValueError, match="must be last"):
            clean_pipeline(corpus, [("chunk", {}), ("pii", {})])
        with pytest.raises(ValueError, match="unknown pipeline step"):
            clean_pipeline(corpus, [("nope", {})])

    def test_chunk_and_bpe_terminal(self, spark, corpus):
        got, _ = clean_pipeline(
            corpus,
            [("min_tokens", {"n": 2}), ("chunk", {"size": 4, "stride": 4})],
        )
        assert {"doc_id", "chunk_idx", "chunk_text", "n_tokens"} <= set(
            got.columns
        )
        assert got.count() > 0
        got2, _ = clean_pipeline(
            corpus, [("bpe", {"merges": [("d", "u"), ("du", "p")]})]
        )
        r = {x.doc_id: x.bpe_tokens for x in got2.collect()}
        assert r[4][0] == "dup"

    def test_sample_with_strata(self, spark, corpus):
        got, _ = clean_pipeline(
            corpus,
            [
                (
                    "sample",
                    {
                        "strata": corpus.select("doc_id", "source"),
                        "fractions": {"a": 1.0, "b": 0.0},
                    },
                )
            ],
        )
        ids = {r.doc_id for r in got.collect()}
        assert ids == {0, 1, 4, 6}  # every 'a', no 'b'


class TestReviewFixes:
    def test_min_tokens_rejects_unknown_kwarg(self, spark, corpus):
        with pytest.raises(TypeError):
            clean_pipeline(corpus, [("min_tokens", {"min_n": 5})])

    def test_sample_missing_strata_uses_default(self, spark, corpus):
        # strata frame covers only doc 0; everyone else falls into the
        # sentinel stratum governed by default_fraction
        strata = corpus.where("doc_id = 0").select("doc_id", "source")
        kept_all, _ = clean_pipeline(
            corpus,
            [("sample", {"strata": strata, "fractions": {"a": 1.0},
                         "default_fraction": 1.0})],
        )
        assert kept_all.count() == corpus.count()
        kept_none, _ = clean_pipeline(
            corpus,
            [("sample", {"strata": strata, "fractions": {"a": 1.0},
                         "default_fraction": 0.0})],
        )
        assert {r.doc_id for r in kept_none.collect()} == {0}

    def test_quality_keeps_unscored_by_default(self, spark):
        from pyspark.sql import functions as SF

        docs = spark.createDataFrame(
            [(0, "good words here"), (1, "")],  # doc 1: no features -> NULL
            "doc_id long, text string",
        )
        wts = spark.range(64).select(
            SF.col("id").alias("bucket"), SF.lit(5.0).alias("weight")
        )
        kept, _ = clean_pipeline(
            docs,
            [("quality", {"weights": wts, "num_buckets": 64,
                          "min_score": 0.5})],
        )
        assert {r.doc_id for r in kept.collect()} == {0, 1}
        dropped, _ = clean_pipeline(
            docs,
            [("quality", {"weights": wts, "num_buckets": 64,
                          "min_score": 0.5, "keep_unscored": False})],
        )
        assert {r.doc_id for r in dropped.collect()} == {0}

    def test_carry_preserves_terminal_train_order(self, spark, corpus):
        got, _ = clean_pipeline(
            corpus,
            [("min_tokens", {"n": 1}), ("train_order", {"seed": 3})],
            carry=("source",),
        )
        rows = got.collect()
        assert "source" in got.columns
        keys = [(r._order_key, r.doc_id) for r in rows]
        # per-partition sorted = writer order; collected partitions are
        # each internally ordered
        parts = got.rdd.glom().map(
            lambda rs: [(r["_order_key"], r["doc_id"]) for r in rs]
        ).collect()
        for p in parts:
            assert p == sorted(p)
