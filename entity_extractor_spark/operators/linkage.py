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


def one_to_one_match(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    score_col: str,
    rounds: int = 3,
) -> DataFrame:
    """One-to-one assignment over scored candidate pairs — the step
    AFTER fs_score: each left entity ends up matched to at most one
    right entity and vice versa, via iterated MUTUAL BEST MATCH. Round
    r keeps the pairs where the right is its left's best partner AND
    the left is its right's best (ties broken score DESC then partner
    ASC — a total order, so the result is a pure function of the data
    on any engine or partitioning); matched entities leave the pool and
    the next round re-matches the remainder (whose best partners may
    have just been taken).

    This is the distributed stand-in for greedy weight-descending
    assignment (every mutual-best pair is IN the global greedy answer —
    both endpoints prefer each other over anything still unmatched, so
    iterating rounds converges toward it): Hungarian-style optimal
    assignment is inherently sequential, while each round here is two
    algebraic struct-min argmax aggs + one equi-join + two hash
    anti-joins — all map-side-combining shuffles, no windows, no
    driver loops over rows. `rounds` is small and fixed (unmatched
    stragglers after round k are leftovers by DESIGN — report them,
    don't chase closure); each round localCheckpoints the shrinking
    pool so plans stay bounded, the k_truss/star-CC convention.

    Requirements enforced loudly: score must be an integral column
    (BIGINT centibits from fs_score — float scores reintroduce
    cross-engine tie ambiguity); NULL left/right/score raise
    executor-side (a NULL endpoint is a broken blocker, not a
    matchable row). Output: (left, right, score, match_round).
    """
    if type(rounds) is not int or not 1 <= rounds <= 8:
        raise ValueError("one_to_one_match: rounds must be an int in [1, 8]")
    dt = {f.name: f.dataType.simpleString() for f in pairs.schema.fields}
    if dt.get(score_col) not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"one_to_one_match: {score_col!r} must be integral (centibits),"
            f" got {dt.get(score_col)}"
        )
    checked = F.when(
        F.col(left_col).isNotNull()
        & F.col(right_col).isNotNull()
        & F.col(score_col).isNotNull(),
        F.col(score_col).cast("long"),
    ).otherwise(
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit("one_to_one_match: NULL in"),
                F.lit(f"({left_col}, {right_col}, {score_col}):"),
                F.col(left_col).cast("string"),
                F.col(right_col).cast("string"),
                F.col(score_col).cast("string"),
            )
        )
    )
    pool = pairs.select(
        F.col(left_col).alias("_l"),
        F.col(right_col).alias("_r"),
        checked.alias("_s"),
    )
    # Duplicate candidate pairs (the same (l, r) surfacing from several
    # LSH bands or blocking keys) collapse to their best score up front:
    # otherwise every surviving duplicate row — including lower-scored
    # ones — passes the mutual-best join and the output stops being
    # one-to-one. One algebraic agg; unique pairs are untouched.
    pool = pool.groupBy("_l", "_r").agg(F.max("_s").alias("_s"))
    matched = None
    for rnd in range(1, rounds + 1):
        pool = pool.localCheckpoint(eager=True)
        # argmax by (score DESC, partner ASC) == struct-MIN of
        # (-score, partner): one algebraic agg per side, no windows
        best_l = pool.groupBy("_l").agg(
            F.min(F.struct(F.negate(F.col("_s")).alias("_n"), F.col("_r"))).alias("_bl")
        ).select("_l", F.col("_bl._r").alias("_blr"))
        best_r = pool.groupBy("_r").agg(
            F.min(F.struct(F.negate(F.col("_s")).alias("_n"), F.col("_l"))).alias("_br")
        ).select("_r", F.col("_br._l").alias("_brl"))
        won = (
            pool.join(best_l, "_l")
            .where(F.col("_r") == F.col("_blr"))
            .join(best_r, "_r")
            .where(F.col("_l") == F.col("_brl"))
            .select("_l", "_r", "_s", F.lit(rnd).cast("int").alias("match_round"))
            .localCheckpoint(eager=True)
        )
        matched = won if matched is None else matched.unionByName(won)
        if rnd < rounds:
            pool = pool.join(
                won.select("_l").distinct(), "_l", "left_anti"
            ).join(won.select("_r").distinct(), "_r", "left_anti")
    return matched.select(
        F.col("_l").alias(left_col),
        F.col("_r").alias(right_col),
        F.col("_s").alias(score_col),
        "match_round",
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 3,
    num_ranges: int = 32,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995) —
    the classic complement to LSH/q-gram blocking: sort all records by
    a blocking key and emit every pair within `window` positions. Where
    LSH needs things to COLLIDE, sorted-neighborhood only needs them to
    sort NEAR each other (typo'd names, zero-padded ids, date strings),
    and its candidate count is exactly <= window * n — linear by
    construction, no hot-bucket blowup to guard.

    The global sort rank is computed WITHOUT a partitionless window
    (the round-1 scale-killer this repo banned): range-repartition by
    (key, id), per-partition ranks from a PARTITIONED row_number, plus
    broadcast per-partition offsets (a bounded #partitions-row
    collect, the star-CC size-probe convention). Because (key, id) is
    a total order and range partitions respect it, the assembled rank
    — hence the output — is a pure function of the data, whatever the
    sampled range boundaries did. Pairs then come from a d in 1..window
    explode + ONE hash equi-join on rank+d = rank (never a theta
    join), so the whole operator is one range exchange plus one
    equi-join at any scale, with candidate volume capped at window*n.

    NULL blocking keys raise executor-side (a record that sorts
    nowhere is upstream breakage, the fs_score convention). Output:
    (id_a, id_b, key_a, key_b, gap) with gap in [1, window]; id_a is
    the LOWER-ranked record, every pair emitted once.
    """
    if type(window) is not int or not 1 <= window <= 64:
        raise ValueError(
            "sorted_neighborhood_pairs: window must be an int in [1, 64]"
        )
    checked_key = F.when(
        F.col(key_col).isNotNull(), F.col(key_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("sorted_neighborhood_pairs: NULL blocking key for "),
                F.col(id_col).cast("string"),
            )
        )
    )
    from pyspark.sql import Window as W

    keyed = (
        df.select(F.col(id_col).alias("_id"), checked_key.alias("_k"))
        .repartitionByRange(num_ranges, F.col("_k"), F.col("_id"))
        .withColumn("_pid", F.spark_partition_id())
    )
    keyed = keyed.localCheckpoint(eager=True)  # pin partitioning for both uses
    counts = {
        r._pid: r.c
        for r in keyed.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    ranked = keyed.withColumn(
        "_rank",
        off_map[F.col("_pid")]
        + F.row_number().over(W.partitionBy("_pid").orderBy("_k", "_id")),
    ).select("_id", "_k", F.col("_rank").cast("long").alias("_rank"))
    lhs = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_k").alias("key_a"),
        F.explode(F.array(*[F.lit(d) for d in range(1, window + 1)])).alias(
            "gap"
        ),
        F.col("_rank").alias("_ra"),
    ).withColumn("_rb", F.col("_ra") + F.col("gap"))
    rhs = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_k").alias("key_b"),
        F.col("_rank").alias("_rb"),
    )
    return lhs.join(rhs, "_rb").select(
        "id_a", "id_b", "key_a", "key_b", F.col("gap").cast("int").alias("gap")
    )
