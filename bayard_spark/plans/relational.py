"""On-the-fly relational search plans over raw document tables.

These express the SAME semantics as the index-backed engine (SURVEY §2.4,
§2.7: simple tokenizer + lower_case, BM25 k1=1.2 b=0.75, global stats,
half-open ranges, score-sum booleans) as pure Catalyst plans over an
un-indexed table — used (a) by the driver correctness gate, where every plan
has an ANSI-SQL twin executed by DuckDB, and (b) as the query-time fallback
when no index exists (the reference has no such mode; Spark makes it free).

Everything here is built-in pyspark.sql.functions — whole-stage codegen,
no Python. The tokenization expression is EXACTLY the same regex in Spark
(Java regex) and DuckDB (RE2): '[^\\p{L}\\p{N}]+', empties dropped,
positions = split index (leading-separator adjusted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bayard_spark import BM25_B, BM25_K1

TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pos, term) — simple tokenizer + lower_case, emitted-token
    positions (leading separator does not shift positions)."""
    lead = F.when(
        F.col(text_col).rlike(r"^[^\p{L}\p{N}]"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias(
                "pos", "term"
            ),
            lead.alias("_lead"),
        )
        .filter(F.col("term") != "")
        .select("doc_id", (F.col("pos") - F.col("_lead")).alias("pos"), "term")
    )


def norms(tok: DataFrame) -> DataFrame:
    """(doc_id, len) token counts per doc."""
    return tok.groupBy("doc_id").agg(F.count("*").alias("len"))


def corpus_stats(docs: DataFrame, nrm: DataFrame) -> DataFrame:
    """1-row (n_docs, avg_len): avg over ALL docs (zero-token docs count)."""
    n = docs.select(F.count("*").alias("n_docs"))
    tot = nrm.select(F.sum("len").alias("total_len"))
    return n.crossJoin(tot).select(
        "n_docs", (F.col("total_len") / F.col("n_docs")).alias("avg_len")
    )


def term_scores(
    tok: DataFrame,
    nrm: DataFrame,
    stats: DataFrame,
    term: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score) BM25 for one term — global stats, exact lengths."""
    tf = (
        tok.filter(F.col("term") == term)
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    return _bm25(tf, nrm, stats, k1, b)


def terms_scores(
    tok: DataFrame,
    nrm: DataFrame,
    stats: DataFrame,
    term_pred,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Σ over matching terms of per-term BM25 (fuzzy/regex expansion).

    term_pred: Column predicate over a `term` column of the distinct
    term dictionary.
    """
    dictionary = tok.select("term").distinct().filter(term_pred)
    tf = (
        tok.join(F.broadcast(dictionary), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tok.select("term", "doc_id").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    per_term = (
        tf.join(F.broadcast(df.join(dictionary, "term")), "term")
        .join(nrm, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            _bm25_expr(k1, b).alias("score"),
        )
    )
    return per_term.groupBy("doc_id").agg(F.sum("score").alias("score"))


def _bm25_expr(k1: float, b: float):
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("len") / F.col("avg_len")
    )
    return idf * (tf * F.lit(k1 + 1.0)) / denom


def _bm25(tf: DataFrame, nrm: DataFrame, stats: DataFrame, k1: float, b: float) -> DataFrame:
    df = tf.select(F.count("*").alias("df"))
    return (
        tf.join(nrm, "doc_id")
        .crossJoin(F.broadcast(df))
        .crossJoin(F.broadcast(stats))
        .select("doc_id", _bm25_expr(k1, b).alias("score"))
    )


def phrase_scores(
    tok: DataFrame,
    nrm: DataFrame,
    stats: DataFrame,
    first: str,
    second: str,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Two-term adjacent phrase: tf = adjacency count, idf = Σ term idfs."""
    t1 = tok.filter(F.col("term") == first).select("doc_id", "pos")
    t2 = tok.filter(F.col("term") == second).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    tf = t1.join(t2, ["doc_id", "pos"]).groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    df1 = (
        tok.filter(F.col("term") == first)
        .select("doc_id").distinct().select(F.count("*").alias("df1"))
    )
    df2 = (
        tok.filter(F.col("term") == second)
        .select("doc_id").distinct().select(F.count("*").alias("df2"))
    )
    idf = (
        F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df1") + F.lit(0.5))
              / (F.col("df1") + F.lit(0.5)))
        + F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df2") + F.lit(0.5))
                / (F.col("df2") + F.lit(0.5)))
    )
    tfc = F.col("tf").cast("double")
    denom = tfc + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("len") / F.col("avg_len")
    )
    return (
        tf.join(nrm, "doc_id")
        .crossJoin(F.broadcast(df1))
        .crossJoin(F.broadcast(df2))
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * (tfc * F.lit(k1 + 1.0)) / denom).alias("score"))
    )


def eval_ast(
    tok: DataFrame,
    nrm: DataFrame,
    stats: DataFrame,
    ast: dict,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Evaluate a parsed query AST (bayard_spark.query.parser output) as a
    relational plan — same composition rules as SearchEngine._boolean_scores
    (score-sum booleans, boolean.rs:272-290): must = join chain with
    clause-order sum, should = union + groupBy sum, must_not = left_anti.
    Lets the driver gate run the REAL query_string parser end-to-end with a
    hand-expanded SQL twin."""
    from functools import reduce

    kind = ast["kind"]
    opts = ast.get("options", {})
    if kind == "term":
        return term_scores(tok, nrm, stats, opts["term"], k1, b)
    if kind == "phrase":
        terms = opts["phrase_terms"]
        if len(terms) != 2 or opts.get("slop", 0) != 0:
            raise ValueError("relational phrase plan supports 2-term slop-0")
        return phrase_scores(tok, nrm, stats, terms[0], terms[1], k1, b)
    if kind == "boost":
        inner = eval_ast(tok, nrm, stats, opts["query"], k1, b)
        return inner.select(
            "doc_id", (F.col("score") * F.lit(float(opts["boost"]))).alias("score")
        )
    if kind == "boolean":
        musts, shoulds, must_nots = [], [], []
        for sq in opts.get("subqueries", []):
            {"must": musts, "should": shoulds, "must_not": must_nots}[
                sq["occurrence"]
            ].append(sq["query"])
        cand = None
        if musts:
            frames = [
                eval_ast(tok, nrm, stats, q, k1, b).withColumnRenamed(
                    "score", f"_m{i}"
                )
                for i, q in enumerate(musts)
            ]
            base = reduce(lambda a, fr: a.join(fr, "doc_id"), frames[1:], frames[0])
            total = reduce(
                lambda a, bb: a + bb,
                [F.col(f"_m{i}") for i in range(len(musts))],
            )
            cand = base.select("doc_id", total.alias("score"))
        if shoulds:
            frames = [eval_ast(tok, nrm, stats, q, k1, b) for q in shoulds]
            unioned = reduce(lambda a, bb: a.unionByName(bb), frames)
            ssum = unioned.groupBy("doc_id").agg(F.sum("score").alias("_s"))
            if cand is None:
                cand = ssum.select("doc_id", F.col("_s").alias("score"))
            else:
                cand = (
                    cand.join(ssum, "doc_id", "left")
                    .withColumn(
                        "score",
                        F.col("score") + F.coalesce(F.col("_s"), F.lit(0.0)),
                    )
                    .drop("_s")
                )
        if cand is None:
            raise ValueError("boolean with only must_not is unsupported here")
        for q in must_nots:
            neg = eval_ast(tok, nrm, stats, q, k1, b).select("doc_id")
            cand = cand.join(neg, "doc_id", "left_anti")
        return cand
    raise ValueError(f"unsupported AST kind for relational eval: {kind!r}")


# ---------- shared SQL fragments for the DuckDB oracle twins ----------

def sql_tokens(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB CTE body producing (doc_id, pos, term) with identical
    semantics to tokens()."""
    return f"""
    SELECT doc_id,
           i - 1 - (CASE WHEN regexp_matches({text_col}, '^[^\\p{{L}}\\p{{N}}]')
                    THEN 1 ELSE 0 END) AS pos,
           toks[i] AS term
    FROM (
        SELECT doc_id, {text_col},
               regexp_split_to_array(lower({text_col}), '[^\\p{{L}}\\p{{N}}]+') AS toks
        FROM {table}
    ), LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
    WHERE toks[i] <> ''
    """


SQL_BM25_PRELUDE = """
tok AS ({tokens}),
nrm AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT sum(len) FROM nrm) * 1.0
                 / (SELECT count(*) FROM documents) AS avg_len)
"""


def sql_bm25_prelude(table: str = "documents") -> str:
    return SQL_BM25_PRELUDE.format(tokens=sql_tokens(table))


def sql_bm25_score(k1: float = BM25_K1, b: float = BM25_B) -> str:
    """Score expression over columns tf, df, len, n_docs, avg_len — written
    with the same operation order as _bm25_expr for float identity."""
    return (
        f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * "
        f"((tf * {k1 + 1.0}) / (tf + {k1} * (1.0 - {b} + {b} * len / avg_len)))"
    )
