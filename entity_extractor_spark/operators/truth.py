"""Truth discovery over conflicting claims — source-reliability estimation.

When the KG ingests the same fact key (subject, predicate) from many
sources (crawl pages, PDFs, queue batches — reference: the per-file
extract rows that later collide on material identity, `main.py`'s
multi-file reprocess loop), the sources disagree. The reference resolves
conflicts with fixed precedence (the A3/A4 source lattice); this module
adds the data-driven counterpart: estimate each source's reliability from
how often it agrees with the (weighted) majority, then score each claimed
value by the total reliability behind it. The classic iterative-voting
shape (TruthFinder / Investment family, simplified to the exact-arithmetic
core):

    trust_0(s)        = 1/2
    belief_i(k, v)    = sum_{s asserts (k,v)} trust_i(s)
    conf_i(k, v)      = belief_i(k, v) / sum_{v'} belief_i(k, v')
    trust_i+1(s)      = mean over s's claims of conf_i(claim)

Determinism: trust and confidence live in FIXED-POINT ppm integers
(1e-6 grid) and every step is exact BIGINT arithmetic — no float op
anywhere, so results are bit-identical across engines, partitionings and
retries (same discipline as graph.pagerank's 1e-9 fixed point).
Truncating integer division is floor here because every operand is
non-negative.

Magnitudes: the widest intermediate is belief * 1e6 <= |sources| * 1e12;
BIGINT holds it to ~9.2e6 sources. Past that, lift the two quotient
expressions to DECIMAL(38,0) (exact integer decimal, same operators).

Scale shape (10^12-claim corpus):
  * the trust table is one row per SOURCE — orders of magnitude smaller
    than the claims table; every claims-x-trust join is broadcast-sized
    and hinted so;
  * belief/total aggregations are algebraic integer SUMs => map-side
    partial aggregation absorbs hot-key skew (popular fact keys) before
    the shuffle;
  * conf joins back to claims on (key, value) — the same clustering the
    belief agg produced, so AQE reuses the exchange;
  * fixed round count (default 2) with a localCheckpoint per round so the
    plan does not grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
TRUST0_PPM = PPM // 2


def _iterate(
    claims: DataFrame,
    source_col: str,
    key_col: str,
    value_col: str,
    rounds: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run the fixed-point loop; returns (distinct claims, final per-claim
    confidence, final per-source trust)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    c = claims.select(
        F.col(source_col).alias("source"),
        F.col(key_col).alias("claim_key"),
        F.col(value_col).alias("claim_value"),
    ).where(
        F.col("source").isNotNull()
        & F.col("claim_key").isNotNull()
        & F.col("claim_value").isNotNull()
    )
    c = c.distinct().localCheckpoint(eager=True)

    trust = c.select("source").distinct().select(
        "source", F.lit(TRUST0_PPM).cast("long").alias("trust_ppm")
    )
    conf = None
    for _ in range(rounds):
        belief = (
            c.join(F.broadcast(trust), "source")
            .groupBy("claim_key", "claim_value")
            .agg(F.sum("trust_ppm").alias("belief"))
        )
        total = belief.groupBy("claim_key").agg(F.sum("belief").alias("tot"))
        conf = belief.join(total, "claim_key").select(
            "claim_key",
            "claim_value",
            F.expr(f"(belief * {PPM}L) div tot").cast("long").alias("conf_ppm"),
        )
        trust = (
            c.join(conf, ["claim_key", "claim_value"])
            .groupBy("source")
            .agg(
                F.expr("sum(conf_ppm) div count(1)").cast("long").alias("trust_ppm"),
                F.count(F.lit(1)).alias("n_claims"),
            )
        ).localCheckpoint(eager=True)
    return c, conf, trust


def truth_discovery(
    claims: DataFrame,
    source_col: str = "source",
    key_col: str = "claim_key",
    value_col: str = "claim_value",
    rounds: int = 2,
) -> DataFrame:
    """Resolve each fact key to its most-believed value.

    Returns one row per distinct claim key: (claim_key, claim_value,
    conf_ppm, n_sources) — the winning value, its final fixed-point
    confidence, and how many sources asserted it. Tiebreak on equal
    confidence is deterministic: smallest value wins (ORDER BY conf DESC,
    value ASC). The row_number window is partitioned by claim_key, so
    no partitionless Window appears in the plan.
    """
    c, conf, _ = _iterate(claims, source_col, key_col, value_col, rounds)
    n_sources = c.groupBy("claim_key", "claim_value").agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("claim_key").orderBy(
        F.col("conf_ppm").desc(), F.col("claim_value").asc()
    )
    return (
        conf.join(n_sources, ["claim_key", "claim_value"])
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def source_trust(
    claims: DataFrame,
    source_col: str = "source",
    key_col: str = "claim_key",
    value_col: str = "claim_value",
    rounds: int = 2,
) -> DataFrame:
    """Per-source reliability after the fixed-point loop: (source,
    trust_ppm, n_claims). A source that always sides with the weighted
    majority converges toward 1e6; a contrarian source sinks. Feed this
    into ingest scorecards (audit.source_scorecard) or as a prior for the
    A3/A4 lattice precedence."""
    _, _, trust = _iterate(claims, source_col, key_col, value_col, rounds)
    return trust.select("source", "trust_ppm", "n_claims")
