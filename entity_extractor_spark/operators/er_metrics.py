"""Pairwise clustering evaluation — precision/recall/F1 of a predicted
entity clustering against gold labels, WITHOUT materializing pairs.

Entity resolution's standard metric counts item PAIRS: a pair is a true
positive when predicted co-clustered AND gold co-clustered. The naive
computation joins the table to itself (O(n^2) pairs — instantly fatal on
a 100 TB corpus); this operator uses the contingency-table identity
instead: every count is a sum of C(n,2) over group sizes,

    tp_pairs   = sum over (pred, gold) cells   of  c * (c-1) / 2
    pred_pairs = sum over pred clusters        of  n * (n-1) / 2
    gold_pairs = sum over gold classes         of  n * (n-1) / 2

so the whole evaluation is one groupBy(pred, gold) plus two tiny re-aggs
of the cell table — O(n) data movement, map-side partial aggregation,
no joins at all. The three scalars meet in ONE row via a union of
(kind, pairs) rows folded by a single algebraic agg — no 1-row
crossJoin (which Spark plans as BroadcastNestedLoopJoin) and no
driver-side collect.

All arithmetic is BIGINT (ppm rates via floor division), so the result
is bit-exact on any engine. Undefined rates (zero predicted or zero gold
pairs) surface as NULL, never a fake 0 or 1.

KG use: grade a blocking/clustering scheme (LSH band buckets, simhash
prefixes, the canonicalization CC) against known duplicate classes
before trusting it at scale. The reference has no evaluation story at
all — dedup quality there is whatever `normalized_name` equality gives
(global_node_repository.py upsert-by-name); this makes the quality
measurable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PPM = 1_000_000


def _pairs(n) -> F.Column:
    # C(n, 2) in BIGINT: n*(n-1) is always even, DIV is exact
    return F.expr(f"CAST({n} AS BIGINT) * ({n} - 1) DIV 2")


def pair_metrics(df: DataFrame, pred_col: str, gold_col: str) -> DataFrame:
    """One row: (tp_pairs, pred_pairs, gold_pairs, precision_ppm,
    recall_ppm, f1_ppm) for the clustering `pred_col` scored against the
    classes `gold_col`, over one row per item.

    precision = tp/pred_pairs, recall = tp/gold_pairs, f1 = 2tp/(pred+gold)
    — each in parts-per-million by BIGINT floor division, NULL when its
    denominator is zero (all-singleton clusterings have no pairs to be
    right or wrong about).

    Scale shape: cells = groupBy(pred, gold).count() is the only pass over
    the data (map-side combine; output is #distinct label combinations,
    not #rows). The two marginal re-aggs and the final fold run over that
    tiny cell table, localCheckpoint'd once so its three consumers don't
    recompute the scan."""
    cells = (
        df.groupBy(F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g"))
        .count()
        .localCheckpoint()
    )
    tp = cells.select(F.lit("tp").alias("kind"), _pairs("count").alias("pairs"))
    pp = (
        cells.groupBy("_p")
        .agg(F.sum("count").alias("n"))
        .select(F.lit("pp").alias("kind"), _pairs("n").alias("pairs"))
    )
    gp = (
        cells.groupBy("_g")
        .agg(F.sum("count").alias("n"))
        .select(F.lit("gp").alias("kind"), _pairs("n").alias("pairs"))
    )

    def _tot(kind: str) -> F.Column:
        return F.coalesce(
            F.sum(F.when(F.col("kind") == kind, F.col("pairs"))), F.lit(0)
        ).cast("long")

    one = tp.unionByName(pp).unionByName(gp).agg(
        _tot("tp").alias("tp_pairs"),
        _tot("pp").alias("pred_pairs"),
        _tot("gp").alias("gold_pairs"),
    )
    rate = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.expr(f"{num} * {_PPM} DIV {den}")
    )
    return one.select(
        "tp_pairs",
        "pred_pairs",
        "gold_pairs",
        rate("tp_pairs", "pred_pairs").alias("precision_ppm"),
        rate("tp_pairs", "gold_pairs").alias("recall_ppm"),
        F.when(
            F.col("pred_pairs") + F.col("gold_pairs") > 0,
            F.expr(f"2 * tp_pairs * {_PPM} DIV (pred_pairs + gold_pairs)"),
        ).alias("f1_ppm"),
    )


def threshold_sweep(
    df: DataFrame,
    group_col: str,
    score_col: str,
    gold_col: str,
) -> DataFrame:
    """Per-group precision/recall curve over an integer score grid — the
    calibration step between candidate generation and a match decision:
    "at which minhash-agreement / similarity threshold does this matcher
    hit the precision we need, and what recall does that buy?". One row
    per (group, distinct observed score), reading as "accept every
    candidate scoring >= threshold":

        (group, threshold, tp, fp, fn,
         precision_ppm, recall_ppm, f1_ppm)

    tp/fp are cumulative from the highest score down; fn = group
    positives - tp. Rates are parts-per-million by floor division —
    bit-exact on any engine; recall/f1 are NULL for a group with zero
    gold positives (never a fake 0: that group cannot grade a matcher).
    f1 uses the pair identity 2tp/(2tp+fp+fn) = 2tp/(tp+fp+P).

    The sweep is grouped (per language / per source / per blocking
    strategy) because one global threshold is exactly what miscalibrates
    a heterogeneous corpus — short-text groups saturate minhash
    agreement long before long-text groups.

    Scale shape (the vocab_coverage doctrine): the scored-candidate
    table collapses to the per-(group, score) histogram FIRST — one
    map-side-combinable aggregation over the big table; every cumulative
    runs over that tiny histogram (score grids are enumerable: 0..16
    minhash slots, 0..64 hamming bits, a ppm grid) with group-partitioned
    windows only. Cumulative products run in DECIMAL(38,0) so 10^12
    candidate pairs cannot overflow the ppm numerator; counts come back
    as BIGINT (an ANSI overflow there is a loud error, never a wrap).

    Inputs are validated executor-side: a NULL score and a gold outside
    {0, 1} each raise (a NULL gold is exactly the unlabeled-candidate
    bug an evaluation must not silently absorb). Reference contrast: the
    reference links on one hard-coded equality rule
    (global_node_repository.py upsert-by-normalized-name) — there is no
    threshold to pick because there is no score; this operator is what
    makes a scored matcher (minhash, simhash, levenshtein, cosine)
    deployable with a measured operating point."""
    ok = (
        F.col("_score").isNotNull()
        & F.col("_gold").isin(0, 1)
    )
    hist = (
        df.select(
            F.col(group_col).alias("_grp"),
            F.col(score_col).alias("_score"),
            F.col(gold_col).alias("_gold"),
        )
        .select(
            "_grp",
            F.when(
                F.assert_true(
                    ok,
                    F.lit(
                        "threshold_sweep: score must be non-NULL and gold in {0, 1}"
                    ),
                ).isNull(),
                F.col("_score"),
            ).alias("_score"),
            "_gold",
        )
        .groupBy("_grp", "_score")
        .agg(
            F.sum("_gold").cast("long").alias("_pos"),
            (F.count(F.lit(1)) - F.sum("_gold")).cast("long").alias("_neg"),
        )
    )
    w = Window.partitionBy("_grp").orderBy(F.col("_score").desc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy("_grp")
    stats = hist.select(
        "_grp",
        "_score",
        F.sum("_pos").over(cum).alias("_tp"),
        F.sum("_neg").over(cum).alias("_fp"),
        F.sum("_pos").over(whole).alias("_p"),
    )
    rate = lambda num, den: F.expr(  # noqa: E731
        f"CAST(CAST({num} AS DECIMAL(38,0)) * {_PPM} DIV ({den}) AS BIGINT)"
    )
    return stats.select(
        F.col("_grp").alias(group_col),
        F.col("_score").alias("threshold"),
        F.col("_tp").cast("long").alias("tp"),
        F.col("_fp").cast("long").alias("fp"),
        (F.col("_p") - F.col("_tp")).cast("long").alias("fn"),
        rate("_tp", "_tp + _fp").alias("precision_ppm"),
        F.when(F.col("_p") > 0, rate("_tp", "_p")).alias("recall_ppm"),
        F.when(
            F.col("_p") > 0, rate("2 * _tp", "_tp + _fp + _p")
        ).alias("f1_ppm"),
    )


def blocking_quality(
    df: DataFrame,
    strategy_col: str,
    block_col: str,
    gold_col: str,
) -> DataFrame:
    """Grade candidate-generation (blocking) schemes BEFORE materializing
    a single pair — one row per strategy:

        (strategy, n_items, n_blocked, candidate_pairs, gold_pairs,
         covered_pairs, reduction_ppm, completeness_ppm)

    reduction_ppm    = 1 - candidate_pairs / C(n_items, 2): how much of
                       the all-pairs quadratic the scheme prunes (the
                       reason blocking exists at 100 TB);
    completeness_ppm = covered_pairs / gold_pairs: the fraction of true
                       duplicate pairs the scheme still co-blocks (the
                       recall ceiling any downstream matcher inherits).
    The tension between the two IS the blocking design problem; this
    measures both sides in one pass so schemes can be compared on a grid
    (coarser key -> completeness up, reduction down).

    Input: one row per (strategy, item) with the item's block key under
    that strategy and its gold class. A NULL block means UNBLOCKED —
    the item generates no candidates (its gold pairs count as missed),
    which is the honest semantics; grouping NULLs into one mega-block
    would instead fabricate the largest candidate bucket in the corpus.
    A NULL gold raises executor-side (an unlabeled item can't be graded).
    Multi-block schemes (LSH: one item, many buckets) must be reduced to
    one block per item first or graded post-hoc with pair_metrics on the
    deduplicated pair set — summing C(n,2) across a non-partition
    overcounts, so this operator's contract is one block per item.

    Scale shape: the pair_metrics identity, widened with a strategy
    dimension — cells = groupBy(strategy, block, gold).count() is the
    only pass over the data (map-side combine); candidate/gold marginals
    and the final fold are re-aggs of that tiny cell table,
    localCheckpoint'd once for its four consumers. Every C(n,2) and ppm
    product runs in DECIMAL(38,0) (a 10^12-item corpus has ~5*10^23
    all-pairs — past BIGINT); output counts cast back to BIGINT, where
    ANSI overflow is a loud error, never a wrap. No joins, no windows."""
    c2 = lambda n: F.expr(  # noqa: E731
        f"CAST({n} AS DECIMAL(38,0)) * ({n} - 1) DIV 2"
    )
    cells = (
        df.select(
            F.col(strategy_col).alias("_s"),
            F.col(block_col).alias("_b"),
            F.when(
                F.assert_true(
                    F.col(gold_col).isNotNull(),
                    F.lit("blocking_quality: gold class must be non-NULL"),
                ).isNull(),
                F.col(gold_col),
            ).alias("_g"),
        )
        .groupBy("_s", "_b", "_g")
        .count()
        .localCheckpoint()
    )
    blocked = cells.where(F.col("_b").isNotNull())
    kinds = (
        blocked.select(
            F.col("_s"), F.lit("cov").alias("kind"), c2("count").alias("v")
        )
        .unionByName(
            blocked.groupBy("_s", "_b")
            .agg(F.sum("count").alias("n"))
            .select("_s", F.lit("cand").alias("kind"), c2("n").alias("v"))
        )
        .unionByName(
            cells.groupBy("_s", "_g")
            .agg(F.sum("count").alias("n"))
            .select("_s", F.lit("gold").alias("kind"), c2("n").alias("v"))
        )
        .unionByName(
            cells.select(
                "_s",
                F.lit("n").alias("kind"),
                F.col("count").cast("decimal(38,0)").alias("v"),
            )
        )
        .unionByName(
            blocked.select(
                "_s",
                F.lit("nb").alias("kind"),
                F.col("count").cast("decimal(38,0)").alias("v"),
            )
        )
    )
    tot = lambda kind: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col("kind") == kind, F.col("v"))),
        F.lit(0).cast("decimal(38,0)"),
    )
    one = kinds.groupBy("_s").agg(
        tot("n").alias("_n"),
        tot("nb").alias("_nb"),
        tot("cand").alias("_cand"),
        tot("gold").alias("_gold"),
        tot("cov").alias("_cov"),
    )
    rate = lambda num, den: F.expr(  # noqa: E731
        f"CAST(({num}) * {_PPM} DIV ({den}) AS BIGINT)"
    )
    return one.select(
        F.col("_s").alias(strategy_col),
        F.col("_n").cast("long").alias("n_items"),
        F.col("_nb").cast("long").alias("n_blocked"),
        F.col("_cand").cast("long").alias("candidate_pairs"),
        F.col("_gold").cast("long").alias("gold_pairs"),
        F.col("_cov").cast("long").alias("covered_pairs"),
        F.when(
            F.col("_n") > 1,
            rate("(_n * (_n - 1) DIV 2) - _cand", "_n * (_n - 1) DIV 2"),
        ).alias("reduction_ppm"),
        F.when(F.col("_gold") > 0, rate("_cov", "_gold")).alias(
            "completeness_ppm"
        ),
    )


def bcubed_metrics(df: DataFrame, pred_col: str, gold_col: str) -> DataFrame:
    """One row: (n_items, precision_ppm, recall_ppm, f1_ppm) — B-cubed
    (Bagga-Baldwin) item-averaged clustering quality for `pred_col`
    scored against `gold_col`, the cluster-level complement of
    pair_metrics: pairwise F1 is dominated by the largest clusters
    (pairs grow quadratically in cluster size — one merged mega-cluster
    swamps a thousand correct small ones), while B-cubed weights every
    ITEM equally, which is what an entity-resolution audit over a
    power-law entity distribution actually needs.

    Per item i: precision_i = |C(i) & G(i)| / |C(i)|,
                recall_i    = |C(i) & G(i)| / |G(i)|,
    averaged over items. On the (pred, gold) contingency cells this is

        P = (1/N) * sum_cells cell^2 * 10^6 div |pred cluster|
        R = (1/N) * sum_cells cell^2 * 10^6 div |gold class|

    — every item in a cell shares the same ratio, so the per-item sum
    collapses to a per-cell one. Floor division applies per cell and the
    item-average floor once more (floors-of-floors, stated: the result
    is a deterministic lower bound within N/10^6 of the rational value —
    the property that matters is engine/partitioning exactness, and both
    engines run the identical floor sequence). F1 is the harmonic mean
    of the two ppm values, NULL if either is NULL. NULL labels raise
    executor-side: an unlabeled item cannot be graded, and silently
    dropping it would inflate both averages.

    Scale shape: identical to pair_metrics — cells = groupBy(pred,
    gold).count() is the only pass over the data; both marginals re-agg
    the cell table (localCheckpoint'd once); cell^2 * 10^6 runs in
    DECIMAL(38,0) (a 10^12-item cell squares to 10^24)."""
    ok = F.col("_p").isNotNull() & F.col("_g").isNotNull()
    cells = (
        df.select(
            F.col(pred_col).alias("_p"), F.col(gold_col).alias("_g")
        )
        .select(
            F.when(
                F.assert_true(
                    ok, F.lit("bcubed_metrics: labels must be non-NULL")
                ).isNull(),
                F.col("_p"),
            ).alias("_p"),
            "_g",
        )
        .groupBy("_p", "_g")
        .count()
        .localCheckpoint()
    )
    psz = cells.groupBy("_p").agg(F.sum("count").alias("_np"))
    gsz = cells.groupBy("_g").agg(F.sum("count").alias("_ng"))
    contrib = lambda sz: F.expr(  # noqa: E731
        f"CAST(count AS DECIMAL(38,0)) * count * {_PPM} DIV {sz}"
    )
    one = (
        cells.join(psz, "_p")
        .join(gsz, "_g")
        .agg(
            F.sum("count").cast("long").alias("n_items"),
            F.sum(contrib("_np")).alias("_sp"),
            F.sum(contrib("_ng")).alias("_sg"),
        )
    )
    avg = lambda s: F.expr(  # noqa: E731
        f"CAST({s} DIV n_items AS BIGINT)"
    )
    return one.select(
        "n_items",
        avg("_sp").alias("precision_ppm"),
        avg("_sg").alias("recall_ppm"),
    ).withColumn(
        "f1_ppm",
        F.when(
            F.col("precision_ppm") + F.col("recall_ppm") > 0,
            F.expr(
                f"2 * precision_ppm * recall_ppm"
                f" DIV (precision_ppm + recall_ppm)"
            ),
        ),
    )


def ranking_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    query_col: str,
    cand_col: str,
    score_cols: list[str],
    ks: tuple[int, ...] = (1, 10),
) -> DataFrame:
    """Filtered MRR / Hits@k over a scored candidate table — the
    standard KG link-prediction evaluation (Bordes et al. TransE
    protocol) and the generic IR ranking scorecard: rank every query's
    candidates by (score_cols DESC ..., candidate ASC — a total order),
    look up each truth pair's rank, and aggregate:

        (n_truth, n_found, mrr_ppm, hits_{k}_ppm ...)

    A truth pair absent from the candidates ranks 'infinity': it
    contributes 0 to MRR and every Hits@k but STAYS in the denominator
    (n_truth) — dropping unreachable positives is how link-prediction
    numbers get quietly inflated; n_found makes the gap explicit.
    MRR is the floor-mean of 10^6 div rank (per-item floor then floor
    mean — deterministic on any engine; a float mean is not). NULL
    truth keys raise executor-side (an ungradable positive silently
    shrinking the denominator corrupts the metric).

    Scale shape: one query-partitioned row_number (bounded by the
    per-query candidate count — never global), one hash left-join of
    the (distinct) truth pairs, ONE algebraic aggregation."""
    if not score_cols:
        raise ValueError("score_cols must be non-empty")
    if not ks or any(k <= 0 for k in ks):
        raise ValueError("ks must be positive")
    w = Window.partitionBy(F.col(query_col)).orderBy(
        *[F.col(c).desc() for c in score_cols], F.col(cand_col).asc()
    )
    ranked = candidates.select(
        F.col(query_col).alias("_q"),
        F.col(cand_col).alias("_c"),
        F.row_number().over(w).cast("long").alias("_rk"),
    )
    checked = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.col(c)
    ).otherwise(F.raise_error(F.lit(f"ranking_metrics: NULL truth {c}")))
    t = truth.select(
        checked(query_col).alias("_q"), checked(cand_col).alias("_c")
    ).distinct()
    j = t.join(ranked, ["_q", "_c"], "left")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_truth"),
        F.count("_rk").cast("long").alias("n_found"),
        F.expr(
            "CAST(sum(COALESCE(1000000 DIV _rk, 0)) DIV count(1) AS BIGINT)"
        ).alias("mrr_ppm"),
        *[
            F.expr(
                f"CAST(count(CASE WHEN _rk <= {int(k)} THEN 1 END) * 1000000"
                f" DIV count(1) AS BIGINT)"
            ).alias(f"hits_{int(k)}_ppm")
            for k in ks
        ],
    )


def calibration_report(
    scored: DataFrame,
    score_col: str,
    gold_col: str,
    score_max: int,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram for a scored matcher/extractor — the "is the
    confidence meaningful" audit that must run before any pipeline
    treats a score as a probability (auto-accepting links above 0.9,
    weighting triples by extractor confidence, routing low-confidence
    rows to review): bin pairs by predicted probability p = score /
    score_max, compare each bin's mean prediction against its OBSERVED
    positive rate:

        (bin, n_pairs, mean_pred_ppm, obs_rate_ppm, gap_ppm)

    gap_ppm = |mean_pred - obs_rate| is each bin's calibration error;
    sum(n_pairs * gap_ppm) / sum(n_pairs) is ECE. Empty bins are absent
    (nothing was predicted there — a report row of NULLs would read as
    data). Everything is exact integers: p_ppm = score * 10^6 div
    score_max, equal-width bin = min(bins-1, p_ppm * bins div 10^6),
    floor means with the sums in DECIMAL(38,0) (10^12 pairs x 10^6 ppm
    exceeds BIGINT) — engine/partitioning-invariant. Scores outside
    [0, score_max] and gold outside {0, 1} raise executor-side: a
    mis-scaled score silently lands every pair in the top bin and the
    report reads as catastrophic miscalibration of the wrong thing.

    Scale shape: ONE algebraic aggregation over the pair table with
    map-side partials; output is <= bins rows."""
    if score_max <= 0 or bins < 2:
        raise ValueError("score_max must be > 0 and bins >= 2")
    sc = (
        f"CASE WHEN {score_col} >= 0 AND {score_col} <= {int(score_max)} "
        f"THEN CAST({score_col} AS BIGINT) ELSE CAST(raise_error(concat("
        f"'calibration_report: score outside [0, {int(score_max)}]: ', "
        f"CAST({score_col} AS STRING))) AS BIGINT) END"
    )
    gd = (
        f"CASE WHEN {gold_col} IN (0, 1) THEN CAST({gold_col} AS BIGINT) "
        f"ELSE CAST(raise_error(concat('calibration_report: gold must be "
        f"0/1, got ', CAST({gold_col} AS STRING))) AS BIGINT) END"
    )
    p = scored.select(
        F.expr(f"CAST(({sc}) * 1000000 DIV {int(score_max)} AS BIGINT)").alias(
            "_p"
        ),
        F.expr(gd).alias("_g"),
    ).withColumn(
        "bin",
        F.expr(f"CAST(LEAST({int(bins) - 1}, _p * {int(bins)} DIV 1000000) AS BIGINT)"),
    )
    return (
        p.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.expr(
                "CAST(sum(CAST(_p AS DECIMAL(38,0))) DIV count(1) AS BIGINT)"
            ).alias("mean_pred_ppm"),
            F.expr(
                "CAST(sum(CAST(_g AS DECIMAL(38,0))) * 1000000 DIV count(1)"
                " AS BIGINT)"
            ).alias("obs_rate_ppm"),
        )
        .withColumn(
            "gap_ppm", F.expr("abs(mean_pred_ppm - obs_rate_ppm)").cast("long")
        )
    )


def confusion_matrix(
    df: DataFrame,
    truth_col: str,
    pred_col: str,
) -> DataFrame:
    """Long-form confusion matrix with exact marginal rates — the
    classifier-evaluation primitive behind the language-ID audit, domain
    classifier QA, and any truth-vs-pred comparison: one row per
    OBSERVED (truth, pred) cell with

        n            cell count
        truth_total  rows with this truth label
        pred_total   rows with this pred label
        recall_ppm   n * 1e6 div truth_total  (diagonal: class recall;
                     off-diagonal: where this class's mass LEAKS to)
        precision_ppm n * 1e6 div pred_total  (diagonal: class
                     precision; off-diagonal: what POLLUTES this
                     prediction)

    pair_metrics/bcubed (above) grade clusterings where labels have no
    identity; this grades CLASSIFIERS where they do. NULL labels raise
    executor-side (the er-audit convention — an ungradable row silently
    dropped would inflate every rate). Empty cells are absent (the
    observed matrix, not the dense one — join against a label dimension
    to densify).

    Scale shape: ONE algebraic (truth, pred) count (hot cells collapse
    map-side), two re-aggregations of that tiny cell table for the
    marginals, two broadcast joins back. The raw table is scanned
    once."""
    checked = df.select(
        F.when(F.col(truth_col).isNotNull(), F.col(truth_col))
        .otherwise(F.raise_error(F.lit("confusion_matrix: NULL truth label")))
        .alias("truth"),
        F.when(F.col(pred_col).isNotNull(), F.col(pred_col))
        .otherwise(F.raise_error(F.lit("confusion_matrix: NULL pred label")))
        .alias("pred"),
    )
    cells = checked.groupBy("truth", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tmarg = cells.groupBy("truth").agg(F.sum("n").cast("long").alias("truth_total"))
    pmarg = cells.groupBy("pred").agg(F.sum("n").cast("long").alias("pred_total"))
    return (
        cells.join(F.broadcast(tmarg), "truth")
        .join(F.broadcast(pmarg), "pred")
        .select(
            "truth", "pred", "n", "truth_total", "pred_total",
            F.expr("n * 1000000 div truth_total").cast("long").alias("recall_ppm"),
            F.expr("n * 1000000 div pred_total").cast("long").alias("precision_ppm"),
        )
    )
