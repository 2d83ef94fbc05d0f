"""Deterministic corpus sampling for training-data mixing.

Pretraining runs don't consume a cleaned corpus whole — they MIX it:
"30% of domain A, 5% of domain B, at most 1M docs per source". Both
primitives here are hash-deterministic, which at 100 TB is not a
nicety but a requirement: a re-run (or a resumed run) must select the
SAME rows with no sampling state to persist, and `sample()`-style
RNG-per-partition selections change whenever partitioning changes.
Doc-id hashing makes the choice a pure function of the row.

- hash_fraction_sample: per-stratum Bernoulli keep via an integer hash
  threshold — one narrow filter, ZERO shuffle, trivially scales.
- stratified_cap: EXACT per-stratum cap — the cap rows with the
  smallest (hash, id) per stratum, i.e. a deterministic uniform draw
  without replacement. Uses a per-stratum row_number window: correct
  for strata of operational size (domains, sources, languages); for a
  stratum with billions of rows a window partition cannot be split by
  AQE, so use hash_fraction_sample to pre-thin first (the docstring
  rule of thumb: cap / stratum_size <= fraction keeps the window input
  ~cap-sized).

`hash_fn` is injectable like linear_text_score's: xxhash64 in
production, the md5-derived hash in the driver gate so DuckDB replays
the draw bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 1 << 20  # integer threshold resolution (~1e-6 fraction steps)


def _row_hash(id_col: str, seed: int, hash_fn):
    if hash_fn is None:
        hash_fn = F.xxhash64
    key = F.concat_ws(
        "\x1f", F.col(id_col).cast("string"), F.lit(str(seed))
    )
    return F.pmod(hash_fn(key), F.lit(HASH_BUCKETS))


def hash_fraction_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn=None,
) -> DataFrame:
    """Keep each row iff hash(id, seed) falls under its stratum's integer
    threshold floor(fraction * 2^20). Deterministic, idempotent,
    partitioning-independent; a narrow filter with no shuffle. Strata
    absent from `fractions` use `default_fraction`."""
    thr = F.lit(int(default_fraction * HASH_BUCKETS))
    for s, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == s, F.lit(int(frac * HASH_BUCKETS))
        ).otherwise(thr)
    return df.where(_row_hash(id_col, seed, hash_fn) < thr)


def stratified_cap(
    df: DataFrame,
    strata_col: str,
    cap: int | dict[str, int],
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn=None,
) -> DataFrame:
    """Exact per-stratum cap: the `cap` rows with the smallest
    (hash, id) in each stratum — a deterministic uniform draw without
    replacement. `cap` is one int or a per-stratum dict (missing strata
    keep everything). See the module docstring for the
    billion-row-stratum caveat (pre-thin with hash_fraction_sample)."""
    h = _row_hash(id_col, seed, hash_fn)
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    if isinstance(cap, dict):
        capc = F.lit(None).cast("long")
        for s, c in sorted(cap.items()):
            capc = F.when(F.col(strata_col) == s, F.lit(c)).otherwise(capc)
    else:
        capc = F.lit(int(cap))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(capc.isNull() | (F.col("_rn") <= capc))
        .drop("_rn")
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    hash_fn=None,
    num_files: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training-example order.

    Pretraining wants the corpus in a reproducible pseudo-random order —
    `orderBy(rand())` changes run to run and with partitioning, so a
    resumed or re-run job would see a different data order. This keys
    every row with hash(id, seed); the total order (_order_key, id) is a
    pure function of the rows. A different `seed` is a fresh epoch
    permutation — epoch 2 is `training_order(df, seed=2)`, not a
    reshuffle job over epoch 1's output.

    Scale shape: with `num_files`, rows get `_file_id` by slicing the
    hash's 64-bit key space into `num_files` EQUAL ANALYTIC ranges —
    uniform hash in, balanced files out, and unlike repartitionByRange
    there is NO sampled RangePartitioner (sampling-based partitioners
    break resume determinism — the repo-wide rule). Write with
    `.write.partitionBy("_file_id")` (or repartition on it first); the
    global order is (_file_id, _order_key, id) because file slices are
    key-range slices, so "file 0037, row 12" is a stable resume cursor.
    The analytic split assumes the default xxhash64 key (full-range
    64-bit); a custom narrow-range hash_fn should pass num_files=None.
    Without `num_files` the keyed frame is returned sorted within
    partitions — `orderBy("_order_key", id_col)` for a fully collected
    order.
    """
    if hash_fn is None:
        hash_fn = F.xxhash64
    key = hash_fn(
        F.concat_ws("\x1f", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    out = df.withColumn("_order_key", key)
    if num_files is not None:
        if not 0 < num_files <= (1 << 30):
            raise ValueError("num_files must be in (0, 2^30]")
        # file = (key_as_unsigned >> 32) * n >> 32: pure long arithmetic
        # (shifted < 2^32, n <= 2^30 — the product can't overflow; no
        # float rounding, no sampled RangePartitioner), monotone in key
        shifted = F.shiftright(F.col("_order_key"), 32) + F.lit(1 << 31)
        out = out.withColumn(
            "_file_id",
            F.shiftright(shifted * F.lit(int(num_files)), 32).cast("int"),
        )
        out = out.repartition(num_files, "_file_id")
    return out.sortWithinPartitions(
        *(["_file_id"] if num_files is not None else []),
        "_order_key",
        F.col(id_col),
    )
