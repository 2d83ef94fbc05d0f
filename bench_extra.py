"""Round-7 optimization probes (bench.py is FROZEN for measurement; every
extra number cited in OPTIMIZATION_r07.md comes from here).

Sections (pick with argv[1], default `build`):

  build    per-stage wall of the 960k IndexBuilder fast path on local[32]
           (ids+docs write / hot-term sample / tokenize+blockify / norms)
           — the scaling+large bench sections are ~75% of bench.py's
           headline value and are pure IndexBuilder.build, so this is the
           profile that decides where optimization effort goes (guide §1).
  tokenize tokenize-only vs blockify split: posting_rows forced with a
           noop-style count vs the full blockify exchange+encode+write.
  queries  per-query engine timings over a prebuilt 960k index with
           setJobDescription labels, plus .explain('formatted') capture
           to plans/r07/ (guide §1.4-1.5).
  pipeline clean-chain + per-op isolation at 960k with a noop sink.

Usage: python bench_extra.py [build|tokenize|queries|pipeline] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # frozen harness: reuse its session/config/corpus helpers


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def probe_build() -> dict:
    from pyspark.sql import functions as F

    from bayard_spark.build.indexer import IndexBuilder
    from bayard_spark.schema import webtext_index_meta

    corpus = bench.materialize_scaling_corpus()
    spark = bench.make_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    src = spark.read.parquet(corpus)
    meta = webtext_index_meta(
        num_buckets=bench.SCALE_BUCKETS, num_waves=1, salt_span=50_000,
        hot_df_threshold=100_000,
    )
    shm = "/dev/shm/bayard-bench-idx"
    os.makedirs(shm, exist_ok=True)

    # warmup (JIT + python worker imports), 1/8 slice, untimed
    warm_root = tempfile.mkdtemp(prefix="probe_warm_", dir=shm)
    warm = src.filter(F.pmod(F.xxhash64("url"), F.lit(8)) == 0)
    IndexBuilder(spark, meta, warm_root).build(warm, resume=False)
    shutil.rmtree(warm_root, ignore_errors=True)

    out: dict = {"n_docs": bench.SCALE_DOCS, "cpus": bench.CPUS}
    root = tempfile.mkdtemp(prefix="probe_stage_", dir=shm)
    try:
        b = IndexBuilder(spark, meta, root)
        b.io.makedirs(b.paths.root)
        b.io.write_text(b.paths.meta, b.meta.to_json())

        sc.setJobDescription("probe: ids+docs write")
        t0 = time.time()
        with_ids = b.assign_doc_ids(src)
        b.write_docs(with_ids)
        out["t_ids_docs"] = round(time.time() - t0, 2)

        docs = spark.read.parquet(b.paths.docs)
        par = sc.defaultParallelism
        if docs.rdd.getNumPartitions() < par:
            docs = docs.repartition(par * 2)

        sc.setJobDescription("probe: hot-term sample")
        t0 = time.time()
        hot_terms = b._hot_terms_sampled(docs)
        out["t_hot_sample"] = round(time.time() - t0, 2)
        out["n_hot_terms"] = len(hot_terms)

        sc.setJobDescription("probe: tokenize+blockify+write")
        t0 = time.time()
        nb = meta.num_buckets
        rows = (
            b.posting_rows(docs)
            .withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int")
            )
            .withColumn("wave", F.lit(0))
        )
        b.blockify_wave(rows, 0, hot_terms)
        out["t_blockify"] = round(time.time() - t0, 2)

        sc.setJobDescription("probe: norms+stats")
        t0 = time.time()
        b.write_norms_stats_direct(docs, None)
        out["t_norms_stats"] = round(time.time() - t0, 2)
        sc.setJobDescription(None)
        out["t_total"] = round(
            sum(v for k, v in out.items() if k.startswith("t_")), 2
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return out


def probe_tokenize() -> dict:
    """Split the blockify stage: tokenize-only (noop over posting_rows)
    vs +bucket column vs the full exchange+encode (no write)."""
    from pyspark.sql import functions as F

    from bayard_spark.build.indexer import IndexBuilder
    from bayard_spark.schema import webtext_index_meta

    corpus = bench.materialize_scaling_corpus()
    spark = bench.make_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    src = spark.read.parquet(corpus)
    meta = webtext_index_meta(
        num_buckets=bench.SCALE_BUCKETS, num_waves=1, salt_span=50_000,
        hot_df_threshold=100_000,
    )
    root = tempfile.mkdtemp(prefix="probe_tok_", dir="/dev/shm")
    b = IndexBuilder(spark, meta, root)
    out: dict = {}
    try:
        # docs parquet must exist for a faithful read path
        sc.setJobDescription("probe: docs write (untimed prep)")
        b.io.makedirs(b.paths.root)
        b.io.write_text(b.paths.meta, b.meta.to_json())
        b.write_docs(b.assign_doc_ids(src))
        docs = spark.read.parquet(b.paths.docs)

        sc.setJobDescription("probe: scan only")
        out["t_scan"] = round(noop(docs.select("doc_id", "url", "text", "lang")), 2)

        sc.setJobDescription("probe: tokenize only (warm)")
        rows = b.posting_rows(docs)
        noop(rows)  # warm
        out["t_tokenize"] = round(noop(rows), 2)

        sc.setJobDescription("probe: tokenize+exchange+encode (no write)")
        nb = meta.num_buckets
        rows2 = rows.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int")
        ).withColumn("salt", F.lit(0))
        from bayard_spark.build.indexer import (
            BLOCK_SCHEMA,
            encode_group_table,
        )

        blocks = rows2.groupBy("bucket", "salt").applyInArrow(
            lambda t: encode_group_table(t, meta.block_size), BLOCK_SCHEMA
        )
        out["t_tok_exch_encode"] = round(noop(blocks), 2)
        sc.setJobDescription(None)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return out


def probe_queries() -> dict:
    """Per-query best-of-3 (after one cold draw) over a prebuilt 960k
    index, job-labelled. Plan capture for declared queries lives in
    tools/plan_capture.py."""
    from bayard_spark.query import SearchEngine

    corpus = bench.materialize_scaling_corpus()
    spark = bench.make_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    shm = "/dev/shm/bayard-bench-idx"
    os.makedirs(shm, exist_ok=True)
    root = tempfile.mkdtemp(prefix="probe_q_", dir=shm)
    out: dict = {}
    try:
        src = spark.read.parquet(corpus)
        bench._one_scale_build(spark, src, root)
        engine = SearchEngine(spark, root)
        for entry in bench.QUERY_SET:
            name, q = entry[0], entry[1]
            overrides = entry[2] if len(entry) > 2 else None
            req = {"query": q, "collection_kind": "top_docs", "hits": 10}
            if overrides:
                req.update(overrides)
            sc.setJobDescription(f"probe query: {name}")
            times = []
            for _ in range(4):
                t0 = time.time()
                engine.search(req)
                times.append(time.time() - t0)
            out[name] = round(min(times[1:]), 4)  # drop the cold draw
        sc.setJobDescription(None)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return out


def probe_pipeline() -> dict:
    from pyspark.sql import functions as F

    from bayard_spark.functions.dedup import paragraph_dedup
    from bayard_spark.functions.encoding import fix_mojibake
    from bayard_spark.functions.pipeline import clean_pipeline
    from bayard_spark.functions.textstats import gopher_rules, pii_redact

    corpus = bench.materialize_scaling_corpus()
    spark = bench.make_spark(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = spark.read.parquet(corpus)
    out: dict = {}
    sc.setJobDescription("probe: mojibake only")
    out["t_mojibake"] = round(noop(fix_mojibake(docs, text_col="text")), 2)
    sc.setJobDescription("probe: pii only")
    out["t_pii"] = round(
        noop(pii_redact(docs, text_col="text", id_col="url")), 2
    )
    sc.setJobDescription("probe: para_dedup only")
    out["t_para_dedup"] = round(
        noop(
            paragraph_dedup(
                docs, text_col="text", id_col="url", sep="\n", max_count=2
            )
        ),
        2,
    )
    sc.setJobDescription("probe: gopher only")
    out["t_gopher"] = round(
        noop(gopher_rules(docs, text_col="text", id_col="url")), 2
    )
    sc.setJobDescription("probe: clean chain (bench recipe)")
    t0 = time.time()
    cleaned, _ = clean_pipeline(
        docs,
        [
            ("mojibake", {}),
            ("pii", {}),
            ("para_dedup", {"sep": "\n", "max_count": 2}),
            ("min_tokens", {"n": 1}),
        ],
        id_col="url",
    )
    cleaned.agg(F.count("*"), F.sum(F.length("text"))).collect()
    out["t_clean_chain"] = round(time.time() - t0, 2)
    sc.setJobDescription(None)
    spark.stop()
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "build"
    fn = {
        "build": probe_build,
        "tokenize": probe_tokenize,
        "queries": probe_queries,
        "pipeline": probe_pipeline,
    }[which]
    t0 = time.time()
    out = fn()
    out["probe"] = which
    out["wall_s"] = round(time.time() - t0, 1)
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
