"""KMV (k-minimum-values) distinct-count sketch — deterministic,
mergeable, cross-engine-exact approximate COUNT(DISTINCT).

Why not approx_count_distinct: Spark's HLL++ and DuckDB's HLL use
different hash functions and register layouts, so their estimates can
never hash-match — un-oracle-able, and two runs of two engines disagree.
KMV replaces it with a sketch every engine can replay bit-for-bit: hash
each key onto the uniform 48-bit grid md5[0:12] (the sampling module's
portable-hash convention), keep each group's k smallest DISTINCT hash
values, and estimate

    distinct ~= (k-1) * 2^48 DIV kth_smallest_hash     (BIGINT arithmetic)

(the classic KMV/bottom-k estimator: if k uniform points occupy [0, h_k],
the full set's density extrapolates to the whole range). Groups with
fewer than k distinct hashes report their EXACT count — the sketch
degrades to truth, never the reverse.

Scale shape: one DISTINCT on (group, hash) — map-side partial dedup —
then a row_number window per GROUP (partitioned, and Spark's
WindowGroupLimit pre-prunes rank<=k map-side, so a billion-key group
ships ~k rows per task, not its whole mass), then one algebraic agg. The
sketch state (k hashes per group) is tiny and MERGEABLE: union two
sketches' hash sets and re-take the k smallest — exactly how a 100 TB
corpus aggregates per-shard sketches without re-scanning
(tests/test_sketch.py proves merge(sketch(A), sketch(B)) == sketch(A|B)).

Reference analog: the corpus-stats queries the ingest dashboard issues
(SELECT COUNT(DISTINCT ...) per folder, processors/queue.py) — exact
there because the corpus is small; at 100 TB the exact form is a full
shuffle of every key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 48  # md5[0:12] hex = uniform 48-bit grid
_SALT = "kmv"


def kmv_hash(key: Column) -> Column:
    """Uniform 48-bit hash of a key (portable: DuckDB replays it with
    string/md5 functions; same recipe as sampling.sample_bucket minus the
    modulus)."""
    h = F.md5(F.concat_ws("|", key.cast("string"), F.lit(_SALT)))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count: (group, n_kept, est_distinct).

    n_kept = min(k, #distinct hashes) — the sketch size actually held;
    est_distinct is exact when n_kept < k, else the bottom-k estimate.
    Hash collisions on the 48-bit grid under-count by ~n^2/2^49 —
    negligible below ~10^12 distinct keys per group."""
    if k < 2:
        raise ValueError("k must be >= 2")
    hashes = (
        df.select(F.col(group_col), kmv_hash(F.col(key_col)).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("_h")
    kept = hashes.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return kept.groupBy(group_col).agg(
        F.count("*").alias("n_kept"),
        F.when(
            F.count("*") < k, F.count("*")
        )
        .otherwise(
            F.expr(f"CAST({(k - 1) * HASH_SPACE} AS BIGINT) DIV MAX(_h)")
        )
        .alias("est_distinct"),
    )
