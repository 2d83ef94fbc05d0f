"""Distributed inverted-index build.

Pipeline (all stages declarative DataFrame ops; Python only inside Arrow
batches):

  source (url, warc_ts, html?, text, lang)
    │ 1. upsert: last write per url wins (window by url, warc_ts desc)
    │    — reference semantics bayard/src/node.rs:1191-1192 (delete_term+add)
    │ 2. dense doc_id: rank of url within url-hash bucket + bucket offset
    │    (deterministic: no sampling; one shuffle; bucket ranges contiguous)
    ├─ docs/    parquet, doc_id-sorted within partitions (min/max pruning)
    │ 3. analyzer pass (mapInPandas): per (doc, field, term) → tf, positions,
    │    doc_len — shuffle volume is postings, not token occurrences
    ├─ postings_staging/  parquet, partitioned by wave (= bucket % num_waves)
    │ 4. term df agg → hot-term set (df > hot_df_threshold) → salting plan
    │ 5. per wave: groupBy(bucket, term, salt) → applyInPandas block encoder
    │    (delta+varint, 128-doc blocks, block-max metadata as plain columns)
    ├─ postings/field=<f>/bucket=<b>/  parquet
    ├─ norms/   (field, doc_id, len)   — exact lengths (SURVEY §2.7)
    ├─ stats/   (field, n_docs, total_len, avg_len)
    └─ lineage/ per-stage/wave metrics: docs, postings, bytes, build_ms —
       restart skips completed stages/waves (resumable builds).

Salting: a hot term's postings are split into contiguous doc_id ranges
(salt = doc_id // salt_span), so concatenating salts in order preserves
global doc order — intersection/WAND never needs a re-sort. Cold terms get
salt 0. This is explicit skew handling for Zipfian df (SURVEY §7).

Scale notes: the only full-data shuffles are (dedupe by url) + (doc-bucket
exchange) + (staging write by wave) + (blockify exchange by bucket/term/salt).
All aggregations are partial-agg friendly. No driver-side iteration over
data, no collect() of anything larger than bucket counts (num_buckets rows).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bayard_spark.analysis.analyzer import Analyzer, build_analyzers
from bayard_spark.build.codec import encode_block, varint_encode
from bayard_spark.schema import IndexMeta, IndexPaths

POSTING_ROW_SCHEMA = (
    "doc_id long, field string, term string, tf int, positions array<int>, "
    "doc_len int"
)
BLOCK_SCHEMA = (
    "field string, bucket int, term string, salt int, block_id int, "
    "n_docs int, first_doc_id long, last_doc_id long, max_tf int, "
    "min_tf int, min_len int, max_len int, doc_bytes binary, "
    "tf_bytes binary, len_bytes binary, pos_bytes binary"
)


def encode_group_frame(pdf: pd.DataFrame, block_size: int = 128) -> pd.DataFrame:
    """pandas frame of posting rows (doc_id, field, term, tf, positions,
    doc_len, bucket, salt) → block rows (BLOCK_SCHEMA). Shared by the bulk
    builder, incremental segment writer, and the merge compactor so block
    bytes are identical regardless of which path wrote them."""
    pdf = pdf.sort_values(["field", "term", "salt", "doc_id"], ignore_index=True)
    out_rows = []
    for (fld, term, salt), g in pdf.groupby(["field", "term", "salt"], sort=False):
        doc_ids = g["doc_id"].to_numpy(dtype=np.int64)
        tfs = g["tf"].to_numpy(dtype=np.int64)
        lens = g["doc_len"].to_numpy(dtype=np.int64)
        has_pos = g["positions"].iloc[0] is not None
        pos_lists = g["positions"].tolist() if has_pos else None
        bucket = int(g["bucket"].iloc[0])
        n = len(g)
        for b0 in range(0, n, block_size):
            b1 = min(b0 + block_size, n)
            d = doc_ids[b0:b1]
            t = tfs[b0:b1]
            ln = lens[b0:b1]
            if has_pos:
                flat = (
                    np.concatenate(
                        [np.asarray(p, dtype=np.uint64) for p in pos_lists[b0:b1]]
                    )
                    if b1 > b0
                    else np.empty(0, dtype=np.uint64)
                )
                offs = np.zeros(b1 - b0 + 1, dtype=np.int64)
                np.cumsum(t, out=offs[1:])
                db, tb, pb = encode_block(d, t, flat, offs)
            else:
                db, tb, pb = encode_block(d, t)
            lb = varint_encode(ln.astype(np.uint64))
            out_rows.append(
                (fld, bucket, term, int(salt), b0 // block_size, b1 - b0,
                 int(d[0]), int(d[-1]), int(t.max()), int(t.min()),
                 int(ln.min()), int(ln.max()), db, tb, lb, pb)
            )
    cols = [c.split(" ")[0] for c in BLOCK_SCHEMA.split(", ")]
    return pd.DataFrame(out_rows, columns=cols)


@dataclass
class BuildReport:
    n_docs: int
    stages_run: list[str]
    stages_skipped: list[str]
    wall_s: float


def _success(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


class IndexBuilder:
    def __init__(self, spark: SparkSession, meta: IndexMeta, root: str):
        self.spark = spark
        self.meta = meta
        self.paths = IndexPaths(root)
        self.analyzers = build_analyzers(meta.analyzers)

    # ---------- lineage ----------

    def _log_lineage(self, stage: str, wave: int, metrics: dict) -> None:
        row = {
            "stage": stage,
            "wave": wave,
            "ts": time.time(),
            **{k: float(v) for k, v in metrics.items()},
        }
        os.makedirs(self.paths.lineage, exist_ok=True)
        fname = os.path.join(self.paths.lineage, f"{stage}_w{wave}.json")
        with open(fname, "w") as f:
            json.dump(row, f)

    def _lineage_done(self, stage: str, wave: int = 0) -> bool:
        return os.path.exists(
            os.path.join(self.paths.lineage, f"{stage}_w{wave}.json")
        )

    # ---------- stage 1: docs + dense ids ----------

    def assign_doc_ids(self, source: DataFrame) -> DataFrame:
        nb = self.meta.num_buckets
        latest = (
            source.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("url").orderBy(
                        F.desc("warc_ts"), F.desc(F.xxhash64("text"))
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        bucketed = latest.withColumn(
            "doc_bucket", F.pmod(F.xxhash64("url"), F.lit(nb)).cast("int")
        )
        counts = {
            r["doc_bucket"]: r["n"]
            for r in bucketed.groupBy("doc_bucket").agg(F.count("*").alias("n"))
            .collect()
        }
        offsets, acc = {}, 0
        for b in range(nb):
            offsets[b] = acc
            acc += counts.get(b, 0)
        off_df = self.spark.createDataFrame(
            [(b, offsets[b]) for b in range(nb)], "doc_bucket int, _offset long"
        )
        w = Window.partitionBy("doc_bucket").orderBy("url")
        return (
            bucketed.join(F.broadcast(off_df), "doc_bucket")
            .withColumn(
                "doc_id", F.col("_offset") + F.row_number().over(w) - 1
            )
            .drop("_offset", "doc_bucket")
        )

    def write_docs(self, with_ids: DataFrame) -> None:
        (
            with_ids.repartitionByRange(
                max(self.spark.sparkContext.defaultParallelism, 1), "doc_id"
            )
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(self.paths.docs)
        )

    # ---------- stage 2: analyzer pass → posting rows ----------

    def posting_rows(self, docs: DataFrame) -> DataFrame:
        fields = [
            (f.name, self.analyzers[f.analyzer], f.record)
            for f in self.meta.text_fields()
        ]
        want_pos = {name: rec == "position" for name, _, rec in fields}
        analyzer_by_field: dict[str, Analyzer] = {
            name: an for name, an, _ in fields
        }
        field_names = [name for name, _, _ in fields]

        def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                outs = []
                doc_ids = pdf["doc_id"].to_numpy()
                for fname in field_names:
                    an = analyzer_by_field[fname]
                    frame = an.tokenize(pdf[fname].reset_index(drop=True))
                    if len(frame) == 0:
                        continue
                    doc_len = frame.groupby("idx")["token"].size()
                    if want_pos[fname]:
                        agg = (
                            frame.groupby(["idx", "token"], sort=False)
                            .agg(
                                tf=("pos", "size"),
                                positions=("pos", lambda s: s.to_numpy()
                                           .astype("int32").tolist()),
                            )
                            .reset_index()
                        )
                    else:
                        agg = (
                            frame.groupby(["idx", "token"], sort=False)
                            .agg(tf=("pos", "size"))
                            .reset_index()
                        )
                        agg["positions"] = None
                    agg["doc_len"] = doc_len.reindex(agg["idx"]).to_numpy()
                    agg["doc_id"] = doc_ids[agg["idx"].to_numpy()]
                    agg["field"] = fname
                    outs.append(
                        agg.rename(columns={"token": "term"})[
                            ["doc_id", "field", "term", "tf", "positions",
                             "doc_len"]
                        ]
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        cols = ["doc_id"] + field_names
        return docs.select(*cols).mapInPandas(analyze, POSTING_ROW_SCHEMA)

    # ---------- stage 3: staging / df / blockify ----------

    def stage_postings(self, docs: DataFrame) -> None:
        nb = self.meta.num_buckets
        nw = self.meta.num_waves
        rows = self.posting_rows(docs).withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int")
        ).withColumn("wave", (F.col("bucket") % nw).cast("int"))
        (
            rows.write.mode("overwrite")
            .partitionBy("wave")
            .parquet(self._staging_path)
        )

    @property
    def _staging_path(self) -> str:
        return os.path.join(self.paths.root, "postings_staging")

    def _hot_terms(self, staging: DataFrame) -> list[str]:
        thr = self.meta.hot_df_threshold
        hot = (
            staging.groupBy("field", "term")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > thr)
            .select("term")
            .distinct()
        )
        return [r["term"] for r in hot.collect()]

    def blockify_wave(self, staging: DataFrame, wave: int,
                      hot_terms: list[str]) -> dict:
        meta = self.meta
        span = meta.salt_span
        block_size = meta.block_size

        part = staging.filter(F.col("wave") == wave)
        if hot_terms:
            hot_set = F.array([F.lit(t) for t in hot_terms])
            part = part.withColumn(
                "salt",
                F.when(
                    F.array_contains(hot_set, F.col("term")),
                    (F.col("doc_id") / F.lit(span)).cast("int"),
                ).otherwise(F.lit(0)),
            )
        else:
            part = part.withColumn("salt", F.lit(0))

        def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return encode_group_frame(pdf, block_size)

        blocks = part.groupBy("bucket", "salt").applyInPandas(
            encode_group, BLOCK_SCHEMA
        )
        t0 = time.time()
        (
            blocks.write.mode("overwrite")
            .partitionBy("field", "bucket")
            .parquet(os.path.join(self.paths.postings, f"wave={wave}"))
        )
        return {"build_ms": (time.time() - t0) * 1000}

    # ---------- stage 4: norms + stats ----------

    def write_norms_stats(self, staging: DataFrame) -> None:
        norms = (
            staging.groupBy("field", "doc_id")
            .agg(F.max("doc_len").alias("len"))
        )
        norms.write.mode("overwrite").partitionBy("field").parquet(
            self.paths.norms
        )
        n_docs = self.spark.read.parquet(self.paths.docs).count()
        stats = (
            self.spark.read.parquet(self.paths.norms)
            .groupBy("field")
            .agg(
                F.count("*").alias("n_docs_field"),
                F.sum("len").alias("total_len"),
            )
            .withColumn("n_docs", F.lit(n_docs))
            .withColumn(
                "avg_len", F.col("total_len") / F.col("n_docs")
            )
        )
        stats.write.mode("overwrite").parquet(self.paths.stats)

    # ---------- orchestration ----------

    def build(self, source: DataFrame, resume: bool = True) -> BuildReport:
        t_start = time.time()
        run: list[str] = []
        skipped: list[str] = []
        os.makedirs(self.paths.root, exist_ok=True)
        with open(self.paths.meta, "w") as f:
            f.write(self.meta.to_json())

        if resume and _success(self.paths.docs) and self._lineage_done("docs"):
            skipped.append("docs")
        else:
            t0 = time.time()
            with_ids = self.assign_doc_ids(source)
            self.write_docs(with_ids)
            n = self.spark.read.parquet(self.paths.docs).count()
            self._log_lineage("docs", 0, {"docs": n,
                                          "build_ms": (time.time() - t0) * 1e3})
            run.append("docs")

        docs = self.spark.read.parquet(self.paths.docs)

        if resume and _success(self._staging_path) and self._lineage_done(
            "staging"
        ):
            skipped.append("staging")
        else:
            t0 = time.time()
            self.stage_postings(docs)
            self._log_lineage(
                "staging", 0, {"build_ms": (time.time() - t0) * 1e3}
            )
            run.append("staging")

        staging = self.spark.read.parquet(self._staging_path)
        hot_terms = self._hot_terms(staging)

        for wave in range(self.meta.num_waves):
            if resume and self._lineage_done("blocks", wave):
                skipped.append(f"blocks_w{wave}")
                continue
            metrics = self.blockify_wave(staging, wave, hot_terms)
            self._log_lineage("blocks", wave, metrics)
            run.append(f"blocks_w{wave}")

        if resume and _success(self.paths.stats) and self._lineage_done(
            "stats"
        ):
            skipped.append("stats")
        else:
            t0 = time.time()
            self.write_norms_stats(staging)
            self._log_lineage("stats", 0,
                              {"build_ms": (time.time() - t0) * 1e3})
            run.append("stats")

        n_docs = self.spark.read.parquet(self.paths.docs).count()
        return BuildReport(
            n_docs=n_docs,
            stages_run=run,
            stages_skipped=skipped,
            wall_s=time.time() - t_start,
        )


def read_postings(spark: SparkSession, paths: IndexPaths) -> DataFrame:
    """All postings blocks across waves (wave dirs are a build artifact;
    readers see one logical table)."""
    return spark.read.option("basePath", paths.postings).parquet(
        os.path.join(paths.postings, "wave=*")
    ).drop("wave")
