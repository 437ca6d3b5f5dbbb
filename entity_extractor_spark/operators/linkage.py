"""Probabilistic record linkage (Fellegi–Sunter, the Splink shape):
graded match evidence instead of the reference's binary
exact-match-or-substring-LIKE linking (global_node_repository.py:180's
``lower(gn.name) LIKE '%'||lower(:name)||'%'`` — one unindexed scan per
probe, no notion of HOW MUCH an agreement means).

Fellegi–Sunter (JASA 1969) scores a candidate pair as a sum of per-field
log-likelihood-ratio weights: agreement on a field contributes
log2(m/u), disagreement log2((1-m)/(1-u)), where m = P(agree | match)
and u = P(agree | non-match). A surname agreement (u small) is worth
far more than a gender agreement (u ~ 0.5) — that asymmetry is the
whole point, and it is what the LIKE scan cannot express.

Engine doctrine: the log2 happens OFFLINE. Callers supply integer
CENTIBIT weights (w = round(100 * log2(m/u)), driver-side Python or a
config file), so the engine-side score is pure BIGINT addition —
bit-exact on any engine, partitioning, or order, per the repo-wide
no-transcendentals rule. u probabilities themselves are exact rationals
(u_probabilities below); m comes from labeled duplicates or domain
judgment, exactly as Splink's docs recommend seeding it.

Scale shape: scoring is a pure narrow map over the candidate-pair table
(ZERO shuffles at any scale — blocking/LSH upstream already paid the
join); u estimation is ONE pass over the records for ALL fields via a
stacked explode, two algebraic aggs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def u_probabilities(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact-rational u probabilities: for each field, the probability
    that two RANDOM records agree on it —

        u = sum_v c_v * (c_v - 1) / (n * (n - 1))

    over the field's value histogram (c_v = occurrences of value v,
    n = non-NULL records). This is the classic "random pairing" u
    estimate (Splink's estimate_u_using_random_sampling computes exactly
    this expectation by sampling; over the full histogram it is exact,
    no sampling noise). Output:

        (field, n, u_ppm)   u_ppm = the rational floored to ppm

    NULL field values are excluded from both numerator and denominator
    (a NULL comparison yields no evidence — the same convention
    fs_score applies pair-side); fields with n < 2 report u_ppm 0.
    Feed 100*log2(m/u) per field into fs_score as centibit weights.

    Scale shape: ONE pass over the records for ALL fields — values
    stack through a narrow array explode into (field, value) rows, one
    histogram agg (map-side partials absorb hot values), one tiny
    re-agg per field; k fields never means k scans. Products run in
    DECIMAL(38,0): c^2 at 10^12-row scale times 10^6 is 10^30."""
    if not cols:
        raise ValueError("u_probabilities: cols must be non-empty")
    stacked = F.array(
        *[
            F.struct(
                F.lit(c).alias("field"), F.col(c).cast("string").alias("v")
            )
            for c in cols
        ]
    )
    hist = (
        df.select(F.explode(stacked).alias("fv"))
        .select("fv.field", "fv.v")
        .where(F.col("v").isNotNull())
        .groupBy("field", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        hist.groupBy("field")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.expr("sum(CAST(c AS DECIMAL(38,0)) * (c - 1))").alias("_ag"),
        )
        .select(
            "field",
            "n",
            F.when(F.col("n") < 2, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "CAST(_ag * 1000000"
                    " div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)"
                )
            )
            .alias("u_ppm"),
        )
    )


def fs_score(
    pairs: DataFrame,
    fields: dict[str, tuple[Column, int, int]],
    prior_cb: int = 0,
) -> DataFrame:
    """Fellegi–Sunter pair scoring: append one evidence column per field
    and their sum to a candidate-pair table.

    `fields` maps a field name to (agreement_col, w_agree_cb,
    w_disagree_cb): `agreement_col` is any boolean Column over the pair
    row (typically F.col("a_x") == F.col("b_x"), but phonetic equality,
    levenshtein <= 1, or a banded numeric diff work the same);
    centibit weights are precomputed offline as round(100*log2(m/u))
    and round(100*log2((1-m)/(1-u))). Per field:

        w_<name> = w_agree_cb  if the column is TRUE
                   w_disagree_cb if FALSE
                   0 if NULL (either side missing: NO evidence — the
                   standard FS treatment; a missing surname neither
                   supports nor refutes the match)

    and  score_cb = prior_cb + sum of the w_<name> columns, where
    prior_cb = round(100*log2(P(match)/P(non-match))) encodes the
    candidate-generation prior. Posterior odds = 2^(score_cb/100);
    threshold downstream (er_metrics.threshold_sweep picks the cut,
    stats.knee_point picks it automatically).

    Validation: weights must be real ints (bools rejected — True is an
    int subclass) with w_agree_cb > w_disagree_cb; equal or inverted
    weights mean the m/u inputs were swapped and every downstream
    threshold would rank backwards, so that is a loud error, not a
    warning.

    Scale shape: a pure narrow map — ZERO shuffles and zero Python at
    any pair count; blocking/LSH upstream already paid the only join.
    Weights are literals folded into codegen."""
    if not fields:
        raise ValueError("fs_score: fields must be non-empty")
    for name, (_, wa, wd) in fields.items():
        if type(wa) is not int or type(wd) is not int:
            raise ValueError(
                f"fs_score: weights for {name!r} must be ints (centibits)"
            )
        if wa <= wd:
            raise ValueError(
                f"fs_score: w_agree_cb ({wa}) must exceed w_disagree_cb"
                f" ({wd}) for {name!r} — swapped m/u inputs rank backwards"
            )
    if type(prior_cb) is not int:
        raise ValueError("fs_score: prior_cb must be an int (centibits)")
    out = pairs
    w_cols = []
    for name, (agree, wa, wd) in fields.items():
        col = f"w_{name}"
        out = out.withColumn(
            col,
            F.when(agree.isNull(), F.lit(0).cast("long"))
            .when(agree, F.lit(wa).cast("long"))
            .otherwise(F.lit(wd).cast("long")),
        )
        w_cols.append(col)
    total = F.lit(prior_cb).cast("long")
    for c in w_cols:
        total = total + F.col(c)
    return out.withColumn("score_cb", total)
