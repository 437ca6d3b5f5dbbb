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
