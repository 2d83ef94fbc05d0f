"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k against one query vector. The dot
  product is a JVM expression (zip_with + aggregate) — no Python, no shuffle
  except the final TakeOrderedAndProject.
- ivf: inverted-file ANN. Centroids are chosen deterministically (hash-spread
  sample), assignment is a one-pass argmax against the broadcast centroid
  matrix inside Arrow batches (numpy matmul), and search probes only the
  nprobe closest partitions — the scan is pruned by the `centroid` partition
  column, exactly like the term-bucket pruning in the text index.
- lsh_signatures: random-hyperplane signatures (deterministic splitmix
  planes); bucket equality gives approximate-cosine candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bayard_spark.sources.webtext import _rand_u64  # deterministic PRNG


def _dot_expr(vec_col: str, qarr) -> "F.Column":
    return F.aggregate(
        F.zip_with(F.col(vec_col), qarr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(vec_col: str) -> "F.Column":
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda a: a.cast("double") * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: one scan, JVM-side arithmetic, global top-k."""
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            (_dot_expr(vec_col, qarr) / (_norm_expr(vec_col) * F.lit(qn))).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def deterministic_centroids(
    emb: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Centroid matrix: the n vectors with smallest xxhash64(id) — a
    deterministic uniform sample (no RNG, no kmeans iterations; IVF recall
    at this corpus scale is dominated by nprobe, not centroid quality)."""
    rows = (
        emb.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    return np.asarray([r[vec_col] for r in rows], dtype=np.float64)


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Add `centroid` = nearest centroid (argmax cosine, or argmin L2 with
    ``metric="l2"`` — the choice for IVF-PQ, whose ADC scan ranks by L2);
    numpy matmul per batch."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")
    c = (
        centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        if metric == "cosine"
        else np.asarray(centroids, dtype=np.float64)
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            pdf = pdf.copy()
            if metric == "cosine":
                mn = m / np.maximum(
                    np.linalg.norm(m, axis=1, keepdims=True), 1e-12
                )
                best = (mn @ c.T).argmax(axis=1)
            else:
                d2 = (c**2).sum(axis=1)[None, :] - 2.0 * (m @ c.T)
                best = d2.argmin(axis=1)
            pdf["centroid"] = best.astype("int32")
            yield pdf

    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        list(emb.schema.fields) + [StructField("centroid", IntegerType())]
    )
    return emb.mapInPandas(assign, schema)


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest centroids only, then exact cosine within."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    # stable sort so exact centroid-cosine ties resolve by centroid index
    # ASC, matching the ann_ivf oracle's row_number tiebreak
    probes = np.argsort(-(cn @ qn), kind="stable")[:nprobe].tolist()
    pruned = assigned.filter(F.col("centroid").isin(probes))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)


def lsh_signatures(
    emb: DataFrame,
    n_bits: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sig) — random-hyperplane LSH; planes are ±1 from splitmix64
    (pure function of (seed, bit, dim): identical on every executor)."""

    def sign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            m = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if planes is None:
                dim = m.shape[1]
                idx = np.arange(n_bits * dim, dtype=np.int64)
                bits = _rand_u64(idx, 11, seed) & np.uint64(1)
                planes = (bits.astype(np.float64) * 2 - 1).reshape(n_bits, dim)
            proj = m @ planes.T > 0
            sig = np.zeros(len(m), dtype=np.int64)
            for i in range(n_bits):
                sig |= proj[:, i].astype(np.int64) << i
            yield pd.DataFrame({"vec_id": pdf[id_col], "sig": sig})

    return emb.mapInPandas(sign_batches, "vec_id long, sig long")


def embedding_near_dup_pairs(
    emb: DataFrame,
    n_bits: int = 64,
    n_bands: int = 4,
    min_cosine: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vectors: banded-LSH candidates → exact cosine verify.

    Requiring the WHOLE signature to match (one band) has poor recall near
    the threshold: at cos c each hyperplane bit flips with p = acos(c)/π
    (~0.10 at c=0.95), so a 16-bit full-signature join keeps only ~18% of
    true 0.95-pairs. Banding ORs the buckets: with 4 bands of 16 bits a
    0.99-pair survives with ~0.93 probability, a 0.999-pair with ~0.999.
    Raise n_bands (or lower the per-band width) for higher recall at the
    standard LSH cost of more candidate pairs.

    Scale shape: the band join moves only slim (band, key, id) rows — the
    wide embedding column joins back ONLY for verified candidate ids.
    16-bit band keys keep random collisions at ~n_bands/65536 of the
    all-pairs square (the same 16-bit-block discipline as
    simhash_near_pairs); true near-dups collide by construction.
    """
    if n_bits % n_bands != 0:
        raise ValueError("n_bits must be divisible by n_bands")
    bw = n_bits // n_bands
    sigs = lsh_signatures(emb, n_bits, id_col=id_col, vec_col=vec_col)
    bands = sigs.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), b * bw).bitwiseAND(
                        F.lit((1 << bw) - 1)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    )
    a = bands.select(F.col("vec_id").alias("id_a"), "band", "key")
    b = bands.select(F.col("vec_id").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (_norm_expr("va") * _norm_expr("vb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


# ---------------------------------------------------- IVF physical layout


def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize an IVF index with a partition layout that turns the
    probe filter into FILE pruning, not just row pruning.

    Layout:
      <path>/vectors/centroid=<c>/part-*.parquet   (hive-partitioned)
      <path>/centroids/part-*.parquet              (cidx, vector)

    The vectors frame is hash-repartitioned on `centroid` before the
    partitioned write so each cell lands in exactly one task → one file
    per cell (no small-file explosion at 1000 executors); a hot cell is
    bounded by its own size, never by the corpus. At search time
    `centroid IN (probes)` matches the hive partition column, so Spark
    plans PartitionFilters and reads only nprobe directories — the same
    physics as the text index's term-bucket pruning.

    Returns the centroid matrix (also persisted for load_ivf_index).
    """
    cents = deterministic_centroids(emb, n_centroids, id_col, vec_col)
    assigned = ivf_assign(emb, cents, id_col, vec_col)
    (
        assigned.repartition(F.col("centroid"))
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{path}/vectors")
    )
    spark = emb.sparkSession
    cent_rows = [
        (int(i), [float(x) for x in cents[i]]) for i in range(len(cents))
    ]
    (
        spark.createDataFrame(cent_rows, "cidx int, vector array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/centroids")
    )
    return cents


def load_ivf_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """(assigned vectors frame, centroid matrix) from write_ivf_index.

    The returned frame's `centroid` column is the hive partition column,
    so ivf_search's isin(probes) filter prunes at the file level —
    assert `PartitionFilters` in the plan, not just a row Filter."""
    vectors = spark.read.parquet(f"{path}/vectors")
    crows = spark.read.parquet(f"{path}/centroids").orderBy("cidx").collect()
    cents = np.asarray([r.vector for r in crows], dtype=np.float64)
    return vectors, cents


# ---------------------------------------------------------------------------
# product quantization (PQ / IVF-PQ)
# ---------------------------------------------------------------------------


def pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: np.ndarray | None = None,
) -> np.ndarray:
    """(m, k, d/m) sub-codebooks from a deterministic hash-spread sample.

    At 100 TB the float32 embedding column is the storage and scan
    bottleneck — PQ replaces each d-dim vector by m one-byte codes, and
    search scans codes, not floats. Codebook rows come from the same
    deterministic sampling rule as IVF centroids (smallest xxhash64(id)),
    so training is one bounded collect and fully replayable — no RNG, no
    k-means state to persist; pass `sample_rows` (k, d) to inject an
    externally-chosen (or k-means-refined) sample instead.
    """
    if sample_rows is None:
        sample_rows = deterministic_centroids(emb, k, id_col, vec_col)
    d = sample_rows.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack(
        [sample_rows[:, j * dsub : (j + 1) * dsub] for j in range(m)]
    )


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Add `out_col: array<int>` — per subspace, the L2-nearest codebook
    entry (ties to the lowest index). One numpy matmul pass per Arrow
    batch (the ivf_assign pattern); the float vector can be dropped
    afterwards — codes are m bytes of information per row."""
    m, k, dsub = codebooks.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * dsub : (j + 1) * dsub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is
                # constant per row, so argmin over (-2 x.c + ||c||^2)
                d2 = (codebooks[j] ** 2).sum(axis=1)[None, :] - 2.0 * (
                    xs @ codebooks[j].T
                )
                codes[:, j] = d2.argmin(axis=1)
            pdf = pdf.copy()
            pdf[out_col] = list(codes)
            yield pdf

    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    schema = StructType(
        list(emb.schema.fields) + [StructField(out_col, ArrayType(IntegerType()))]
    )
    return emb.mapInPandas(encode, schema)


def pq_search(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes — JVM-ONLY scan.

    The m×k query-to-centroid distance table is tiny and rides the plan
    as array literals; each row's approximate distance is m element_at
    lookups + adds inside whole-stage codegen (no Python, no floats read
    from storage). Ties order by vec_id ASC on the 6dp-rounded distance,
    the driver-gate convention."""
    m, k, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError("query dim mismatch")
    dist = F.lit(0.0)
    for j in range(m):
        qs = q[j * dsub : (j + 1) * dsub]
        table = ((codebooks[j] - qs[None, :]) ** 2).sum(axis=1)
        tlit = F.array(*[F.lit(float(v)) for v in table])
        dist = dist + F.element_at(
            tlit, F.element_at(F.col(code_col), j + 1) + 1
        )
    return (
        encoded.select(
            F.col(id_col).alias("vec_id"),
            F.round(dist, 6).alias("pq_dist"),
        )
        .orderBy(F.asc("pq_dist"), F.asc("vec_id"))
        .limit(topk)
    )


def ivf_pq_search(
    assigned_encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec: list[float],
    topk: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """IVF-PQ: prune to the nprobe nearest cells (partition/file pruning
    when written via write_ivf_index), then the JVM ADC scan over codes —
    the standard billion-scale layout (coarse quantizer + PQ refinement),
    with every stage deterministic and replayable.

    Metric alignment: the ADC scan ranks by L2, so probe cells are chosen
    by L2 distance to the centroids as well — assign the table with
    ``ivf_assign(..., metric="l2")`` so all three stages (assignment,
    probing, ranking) agree; a cosine-assigned table under an L2 scan
    systematically misses near neighbors when vector norms vary."""
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probes = np.argsort(d2, kind="stable")[:nprobe].tolist()
    pruned = assigned_encoded.filter(F.col("centroid").isin(probes))
    return pq_search(pruned, codebooks, query_vec, topk, id_col, code_col)


def kmeans_refine(
    sample: np.ndarray, init: np.ndarray, n_iter: int = 10
) -> np.ndarray:
    """Deterministic Lloyd refinement for IVF centroids / PQ codebooks.

    Pure driver-side numpy over a BOUNDED sample (the caller draws it with
    the deterministic hash rule, e.g. deterministic_centroids with a
    larger n): no RNG, no Spark state — init + sample fully determine the
    result, so a rebuilt index reproduces byte-identical centroids.
    Ties in assignment go to the lowest centroid index (argmin); a
    centroid that loses all members keeps its previous position (no
    resampling — that would need randomness).

    Quality knob only: ivf_search / pq_search are agnostic to where the
    centroid matrix came from (`deterministic_centroids(emb, 64)` sample →
    `kmeans_refine(sample, sample[:16], 10)` → better-balanced cells).
    """
    cents = np.array(init, dtype=np.float64, copy=True)
    sample = np.asarray(sample, dtype=np.float64)
    k = len(cents)
    for _ in range(n_iter):
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is constant per
        # row, so argmin over the matmul form — O(n*k) memory, not the
        # O(n*k*d) broadcast tensor (a 100k x 256 x 768 refine would
        # allocate ~157 GB the naive way)
        d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (sample @ cents.T)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents
