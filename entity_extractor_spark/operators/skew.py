"""Skew-safe equi-join via key salting.

A shuffle hash-partitions on the join key, so one hot key ("Water" in the
reference's chemical tables — its row loops serialize exactly the same
way, `artifact_ingestor_service.py:1108-1145`) lands its ENTIRE row mass
in one task; at 100 TB that task runs for hours while the rest of the
cluster idles, and AQE's skew-join split only helps when the planner sees
the skew at runtime. Salting removes the hazard by construction: the big
side appends a deterministic salt in [0, s), the small side is replicated
once per salt value, and the join key becomes (key, salt) — the hot key's
mass spreads over s tasks, the result is row-for-row identical to the
plain join (each big row matches exactly the one replica carrying its
salt). Cost: the small side shuffles s copies — chosen s*|small| << |big|.

The salt derives from xxhash64 of the big side's payload columns, not
rand(): partition- and retry-invariant (the sampling module's
determinism rule), and identical payload rows co-locating is harmless.

Equality with the unsalted join is value-checked cross-engine by
contract:j10_salted_skew_join (the DuckDB oracle is the PLAIN join — the
strongest possible statement that salting is pure plan shaping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on key with the big side salted s ways.

    `how` supports inner and left (the shapes where every big row keeps
    exactly its plain-join multiplicity under salting). Output columns =
    the plain join's (salt dropped)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salts < 1:
        raise ValueError("salts must be >= 1")
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in big.columns if c not in keys]
    salt_src = [F.col(c) for c in payload] if payload else [F.col(k) for k in keys]
    b = big.withColumn(_SALT, F.pmod(F.xxhash64(*salt_src), F.lit(salts)).cast("int"))
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return b.join(s, keys + [_SALT], how).drop(_SALT)


def skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Shuffle-health diagnostic: the top_k heaviest join/groupBy keys with
    (key, n_rows, share_ppm, salt_factor) — salt_factor = ceil(n_rows /
    target_rows_per_task) is the replication count salted_join would need
    so no task owns more than ~target rows of that key. Run this BEFORE
    keying a 100 TB shuffle: it is the measurement behind the
    explicit-repartition / salting levers, not a guess.

    Scale shape: ONE groupBy(key).count() (map-side combine) is the only
    pass over the data; the count table is localCheckpoint'd so the total
    (one scalar agg-collect, the pagerank pattern — never a 1-row
    crossJoin, which plans as BNLJ) and the top-k
    (orderBy().limit == distributed TakeOrderedAndProject) reuse it
    without rescanning. Ties at the k boundary break by key ascending.
    NULL keys count as a key (they hash to one shuffle partition too —
    the classic hidden hot key)."""
    if top_k <= 0 or target_rows_per_task <= 0:
        raise ValueError("top_k and target_rows_per_task must be > 0")
    counts = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("n_rows")).collect()[0][0] or 0
    if total == 0:
        return counts.select(
            "key",
            "n_rows",
            F.lit(None).cast("long").alias("share_ppm"),
            F.lit(None).cast("long").alias("salt_factor"),
        )
    return (
        counts.select(
            "key",
            "n_rows",
            F.expr(f"n_rows * 1000000 DIV {total}L").alias("share_ppm"),
            F.expr(
                f"(n_rows + {target_rows_per_task}L - 1L) DIV {target_rows_per_task}L"
            ).alias("salt_factor"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(top_k)
    )
