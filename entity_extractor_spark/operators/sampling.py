"""Deterministic corpus sampling — the curation primitive a 100 TB
training-data pipeline needs between dedup and training.

Why not df.sample()/rand(seed): Spark's rand is seeded PER PARTITION, so
the kept set changes with partitioning, task retries and cluster size —
unacceptable for reproducible corpus curation and impossible to oracle.
Here the keep/drop decision is a pure function of (key, salt): bucket =
md5(key|salt) mod DENOM (the hashed-TF formula from disambiguate.py, which
the DuckDB oracle replays verbatim), keep iff bucket < rate*DENOM. Properties:

  * reproducible anywhere: same rows survive on 1 core or 1000 executors,
    under AQE re-planning and task retries;
  * consistent across tables: sampling two tables by the same key keeps
    JOINABLE subsets (both keep exactly the keys whose bucket qualifies) —
    how you downsample a doc corpus AND its embeddings coherently;
  * narrow: a codegen'd filter, no shuffle, pushes below wide transforms.

Stratified sampling takes a per-stratum rate map (e.g. language -> rate,
the Common-Crawl-style rebalance) via a broadcast-joined rate dimension;
strata absent from the map fall back to a default rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# denominator of the rate grid: rates are resolved to integer bucket
# thresholds so the cross-engine comparison is exact integer math
DENOM = 1_000_000


def sample_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, DENOM): md5(key|salt) first 12 hex chars
    mod DENOM — portable integer hashing (DuckDB replays it exactly)."""
    h = F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt)))
    return F.pmod(F.conv(F.substring(h, 1, 12), 16, 10).cast("long"), F.lit(DENOM))


def sample_uniform(
    df: DataFrame, key_col: str, rate: float, salt: str = "s0"
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows by key hash. Exactly the
    rows with bucket < round(rate*DENOM) survive — stable under any
    partitioning/retry, and consistent for any other table sampled with the
    same (key values, salt, rate)."""
    threshold = int(round(rate * DENOM))
    return df.where(sample_bucket(F.col(key_col), salt) < threshold)


def sample_stratified(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its key bucket is
    under its stratum's threshold (broadcast map lookup, codegen'd filter;
    no shuffle). The standard corpus-rebalance move — e.g. downsample
    over-represented languages/domains to target proportions."""
    default_thr = F.lit(int(round(default_rate * DENOM)))
    if rates:
        thresholds = F.create_map(
            *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(int(round(r * DENOM))))]
        )
        thr = F.coalesce(thresholds[F.col(strata_col)], default_thr)
    else:  # empty map literal would be VOID-typed; every stratum defaults
        thr = default_thr
    return df.where(sample_bucket(F.col(key_col), salt) < thr)


def sample_capped_per_group(
    df: DataFrame, key_col: str, group_col: str, k: int, salt: str = "s0"
) -> DataFrame:
    """Keep at most `k` rows per group, chosen deterministically by hash
    order (bucket asc, then key asc as the total-order tiebreak) — the
    contribution cap a corpus curator applies per domain/language/source so
    no single hub group dominates the training mix (the fixed-size
    counterpart of sample_stratified's fixed-RATE rebalance).

    Determinism: the kept set is a pure function of the group's key values
    and the salt — identical on any partitioning, cluster size or retry,
    and rows keep/drop consistently if the same cap is applied to a sibling
    table (same keys, same salt).

    Scale shape: rank-based filters (row_number <= k) trigger Spark's
    WindowGroupLimit rewrite — each map task pre-prunes to its local top-k
    per group BEFORE the exchange, so hub groups ship at most
    k * num_partitions rows instead of their full membership; the one
    shuffle is on the group key, which the cap makes skew-proof."""
    w = Window.partitionBy(group_col).orderBy(
        sample_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    rn = "__cap_rn"  # collision-resistant: never clobbers a caller column
    return (
        df.withColumn(rn, F.row_number().over(w))
        .where(F.col(rn) <= k)
        .drop(rn)
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "split0",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test assignment: append `split_col`
    labelling each row by carving [0, DENOM) into contiguous bucket ranges
    — one range per split name in SORTED-NAME order, widths proportional
    to the requested fractions (resolved to the integer grid; any rounding
    remainder goes to the LAST sorted split so the ranges exactly tile the
    space and every row gets a label).

    The label is a pure function of (key, salt): stable under any
    partitioning/retry, and consistent across tables — a document and its
    embeddings land in the same split, and eval rows can never leak into
    train when both tables are split by the same key+salt. Growing one
    split's fraction later only MOVES the boundary: rows keep their label
    unless the boundary crosses them (minimal churn on re-splits).

    Scale shape: a codegen'd CASE over the md5 bucket — narrow, no
    shuffle, pushes below wide transforms like every sampler here.
    """
    if not splits or any(f < 0 for f in splits.values()):
        raise ValueError("splits must be a non-empty {name: fraction>=0} map")
    total = sum(splits.values())
    if total == 0:
        raise ValueError("splits fractions must not all be zero")
    names = sorted(splits)
    # integer boundaries on the bucket grid, exactly tiling [0, DENOM)
    edges, acc = [], 0.0
    for name in names:
        acc += splits[name]
        edges.append(int(round(acc / total * DENOM)))
    edges[-1] = DENOM

    b = sample_bucket(F.col(key_col), salt)
    expr = None
    for name, hi in zip(names, edges):
        expr = F.when(b < hi, F.lit(name)) if expr is None else expr.when(b < hi, F.lit(name))
    return df.withColumn(split_col, expr)


def sample_by_plan(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    plan: DataFrame,
    rate_col: str = "rate_ppm",
    salt: str = "s0",
) -> DataFrame:
    """sample_stratified with a DATA-DERIVED rates table instead of a
    literal dict — the execution half of mixture_plan: feed the planner's
    (group, rate_ppm) rows straight back in and keep a row iff its key
    bucket is under its group's ppm threshold (both live on the same
    [0, DENOM) integer grid, so the realized token mass hits the plan's
    target exactly up to per-bucket granularity — no float rounding
    drift). Groups absent from the plan are dropped (weight 0).

    Scale shape: the plan is one row per group — broadcast join, then the
    same codegen'd bucket filter as every sampler here; no shuffle of the
    corpus side."""
    rates = plan.select(strata_col, rate_col)
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(sample_bucket(F.col(key_col), salt) < F.col(rate_col))
        .drop(rate_col)
    )


def sample_fixed_k(df: DataFrame, key_col: str, k: int, salt: str = "s0") -> DataFrame:
    """Exactly min(k, n) rows: the k hash-smallest keys (bucket asc, key
    asc total order) — the fixed-SIZE global counterpart of
    sample_uniform's fixed-rate filter, for pilot/eval subsets that must
    have an exact row budget regardless of corpus size. Same determinism
    contract as every sampler here: a pure function of (keys, salt).

    Scale shape: orderBy().limit(k) plans as a distributed
    TakeOrderedAndProject — each task keeps its local k, the driver merges
    k-sized heaps; no global sort, no single-partition window. Size k for
    a pilot/eval subset (each task allocates a k-sized heap): thousands to
    low millions. For budgets beyond task memory use sample_uniform with
    rate = k/n instead."""
    return df.orderBy(
        sample_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    ).limit(k)


def mixture_plan(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    weights: dict[str, int],
    budget_tokens: int,
) -> DataFrame:
    """Turn a target training mixture (integer weights per group) and a
    total token budget into per-group sampling rates — the planning step
    between corpus stats and sample_stratified: target share of the budget
    per group, capped by what the group actually has.

    Output (group, available, target_tokens, rate_ppm):
      available     = sum of tokens in the group;
      target_tokens = budget * w_g div sum(w)  (exact integer split);
      rate_ppm      = min(10^6, target_tokens * 10^6 div available) —
                      parts-per-million on sample_stratified's own DENOM
                      grid, so rate_ppm/1e6 feeds it without rounding
                      drift. rate_ppm == 10^6 flags an under-resourced
                      group (take everything and the mix still falls
                      short — the signal to re-weight or go collect data).

    Every WEIGHTED group gets a plan row even with zero corpus presence
    (available=0, rate_ppm=10^6 — the most under-resourced case must not
    vanish from the report); groups absent from `weights` are excluded
    (weight 0). Pure integer arithmetic throughout — bit-exact on any
    engine; the rate quotient runs in DECIMAL(38,0) so a 10^13+-token
    target (100 TB-scale budgets) cannot overflow the BIGINT product.
    Scale shape: ONE algebraic aggregation over the stats table +
    a broadcast join against the tiny literal weights table; no windows.
    """
    if (
        not weights
        # bool is an int subclass: {'en': True} must be rejected, not
        # silently planned as weight 1
        or any(type(w) is not int or w < 0 for w in weights.values())
        or sum(weights.values()) == 0
    ):
        raise ValueError(
            "weights must be a non-empty {group: int>=0} map with a positive sum"
        )
    wsum = sum(weights.values())
    wdf = df.sparkSession.createDataFrame(
        sorted(weights.items()), "grp string, _w long"
    )
    avail = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(tokens_col).alias("available")
    )
    return (
        wdf.join(avail, "grp", "left")
        .withColumn("available", F.coalesce("available", F.lit(0).cast("bigint")))
        .withColumn(
            # the product runs in DECIMAL(38,0) like the rate quotient: a
            # 10^13-token budget times a ~10^6 weight overflows BIGINT, but
            # the QUOTIENT is always <= budget (w <= wsum), so the final
            # BIGINT cast is safe by construction
            "target_tokens",
            F.expr(
                f"CAST(CAST({int(budget_tokens)} AS DECIMAL(38,0)) * _w"
                f" div {wsum} AS BIGINT)"
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "available",
            "target_tokens",
            F.when(F.col("available") == 0, F.lit(int(DENOM)).cast("bigint"))
            .otherwise(
                F.expr(
                    f"CAST(LEAST(CAST({DENOM} AS DECIMAL(38,0)),"
                    f" CAST(target_tokens AS DECIMAL(38,0)) * {DENOM} div available)"
                    " AS BIGINT)"
                )
            )
            .alias("rate_ppm"),
        )
    )


def sample_weighted(
    df: DataFrame,
    key_col: str,
    weight_ppm_col: str,
    salt: str = "s0",
) -> DataFrame:
    """Per-row weighted deterministic sampling: keep a row iff its key
    bucket < its OWN weight (an integer ppm column in [0, DENOM]) — the
    quality-proportional subsampling step (CCNet/Gopher shape: keep
    probability rises with the doc's quality score) with the module's
    determinism guarantees intact, because the threshold comes from the
    data while the coin stays the (key, salt) hash. weight <= 0 drops the
    row, weight >= DENOM always keeps it, and a NULL weight DROPS (a doc
    with no quality score must not default to always-keep — bare F.least
    would skip the null and compare against DENOM alone). A codegen'd
    filter — no shuffle, no rand(), pushes below wide transforms;
    bit-exact on any engine (integer compare of two integers)."""
    return df.where(
        sample_bucket(F.col(key_col), salt)
        < F.least(
            F.coalesce(F.col(weight_ppm_col).cast("long"), F.lit(0)), F.lit(DENOM)
        )
    )


def leakage_safe_splits(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    splits: dict[str, float],
    salt: str = "split0",
    split_col: str = "split",
) -> DataFrame:
    """Near-dup-cluster-aware train/valid/test assignment: the fix for
    exactly the leakage contamination.cross_split_leakage measures. A
    row-level split (assign_splits) can put two near-duplicate documents
    on opposite sides of the train/eval boundary — the eval set then
    scores memorization. Here the split key is the document's dup
    CLUSTER, not the document: pairs (any generator — LSH, SimHash
    radius, embedding near-dup) -> connected components -> every member
    hashes its component's canonical min-id keeper through the same
    md5-bucket ranges assign_splits uses. Same-cluster rows agree on the
    key by construction, so cross-split leakage over the pair closure is
    structurally zero — including for dup CHAINS (a~b, b~c) where (a, c)
    was never a candidate pair.

    Output: (id_col, keeper, split) for every row of `df` — singletons
    key on themselves, so non-duplicated docs split exactly as
    assign_splits(key=id) would with the same salt.

    Scale shape: dedup_canonical's adaptive CC over the PAIRS (pair
    volume, not corpus volume), one left join back to ids, then the
    codegen'd bucket CASE; no window, no driver-side data path.
    """
    from .dedupe import dedup_canonical

    canon = dedup_canonical(pairs, df.select(id_col), id_col)
    labeled = assign_splits(
        canon.select(F.col("doc_id").alias(id_col), "keeper"),
        "keeper",
        splits,
        salt=salt,
        split_col=split_col,
    )
    return labeled


_SQRT_DOMAIN = 1 << 53  # doubles represent every integer below this exactly


def temperature_plan(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    budget_tokens: int,
    alpha_quarters: int = 2,
) -> DataFrame:
    """Temperature-based mixture planning — the multilingual sampling
    standard (mT5 §3.1 / XLM-R: sample group g with probability
    proportional to mass^alpha, alpha < 1) where mixture_plan takes
    USER weights, this derives them from the data: upsample the tail
    languages/sources, damp the head, without hand-tuning a weight map.

    alpha is quarters in {1,2,3,4} (0.25/0.5/0.75/1.0) so every power is
    exact integer composition of floor'd square roots:
        r2 = floor(sqrt(m))   r4 = floor(sqrt(r2))
        s  = r4 | r2 | r2*r4 | m        (alpha_quarters = 1|2|3|4)
    sqrt is IEEE-correctly-rounded in every engine, and m is guarded
    below 2^53 (exact double domain), so s — hence every share — is
    engine/partitioning-invariant. (2^53 chars ~ 9 PB in one group;
    the guard raises loudly rather than planning off a lossy cast.)

    Output (group, available, share_raw_ppm, share_temp_ppm,
    target_tokens, rate_ppm): shares on the ppm grid (raw = mass/total,
    temp = s/total_s — the before/after view of the temperature);
    target_tokens = budget * s div sum(s) exactly; rate_ppm =
    min(10^6, target*10^6 div available) on sample_stratified's DENOM
    grid (rate_ppm == 10^6 flags a group whose target exceeds what it
    has — take everything and still fall short). Zero-mass groups plan
    to 0 (derived weight 0) — unlike mixture_plan, where a USER weight
    on an absent group must surface as under-resourced.

    Scale shape: ONE algebraic aggregation to the per-group stats table,
    two collected scalars (total mass, total s — pagerank scalar
    doctrine, never a 1-row crossJoin), then pure column arithmetic in
    DECIMAL(38,0) over the tiny plan table."""
    if alpha_quarters not in (1, 2, 3, 4):
        raise ValueError("alpha_quarters must be 1, 2, 3 or 4")
    if type(budget_tokens) is not int or budget_tokens < 0:
        raise ValueError("budget_tokens must be a non-negative int")
    avail = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(tokens_col).cast("long").alias("available")
    )
    checked = (
        f"CASE WHEN available >= {_SQRT_DOMAIN} OR available < 0 THEN "
        f"CAST(raise_error(concat('temperature_plan: group mass outside "
        f"[0, 2^53): ', CAST(available AS STRING))) AS BIGINT) "
        f"ELSE available END"
    )
    r2 = "CAST(floor(sqrt(CAST(_m AS DOUBLE))) AS BIGINT)"
    r4 = "CAST(floor(sqrt(CAST(_r2 AS DOUBLE))) AS BIGINT)"
    s_by_alpha = {1: "_r4", 2: "_r2", 3: "_r2 * _r4", 4: "_m"}
    weighted = (
        avail.withColumn("_m", F.expr(checked))
        .withColumn("_r2", F.expr(r2))
        .withColumn("_r4", F.expr(r4))
        .withColumn("_s", F.expr(s_by_alpha[alpha_quarters]))
    ).localCheckpoint()
    tot = weighted.agg(
        F.sum("_m").cast("long").alias("mt"),
        F.sum("_s").cast("long").alias("st"),
    ).collect()[0]
    m_tot, s_tot = int(tot.mt or 0), int(tot.st or 0)
    if s_tot == 0:
        raise ValueError("temperature_plan: corpus has no mass to plan over")
    return weighted.select(
        F.col("grp").alias(group_col),
        "available",
        F.expr(
            f"CAST(CAST(_m AS DECIMAL(38,0)) * {DENOM} div {m_tot} AS BIGINT)"
        ).alias("share_raw_ppm"),
        F.expr(
            f"CAST(CAST(_s AS DECIMAL(38,0)) * {DENOM} div {s_tot} AS BIGINT)"
        ).alias("share_temp_ppm"),
        F.expr(
            f"CAST(CAST({budget_tokens} AS DECIMAL(38,0)) * _s div {s_tot}"
            f" AS BIGINT)"
        ).alias("target_tokens"),
        F.when(F.col("available") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr(
                f"CAST(LEAST(CAST({DENOM} AS DECIMAL(38,0)),"
                f" CAST(CAST({budget_tokens} AS DECIMAL(38,0)) * _s div {s_tot}"
                f" AS DECIMAL(38,0)) * {DENOM} div available) AS BIGINT)"
            )
        )
        .alias("rate_ppm"),
    )


def epoch_order(
    df: DataFrame,
    id_col: str,
    epoch: int,
    salt: str = "epoch",
    microbatch_size: int = 1024,
    shards: int = 64,
) -> DataFrame:
    """Deterministic global training order for epoch `epoch`: every row
    gets a dense sequence number 0..N-1 and a microbatch id — the
    shuffled write order a training-data exporter materializes per epoch.
    The order key is the 48-bit md5 of (id, salt, epoch), so each epoch
    is an independent pseudo-random permutation, reproducible on any
    cluster size / retry / partitioning (the sampling-family doctrine:
    never rand(seed), which reshuffles with the partitioning), and the
    DuckDB oracle replays it as one row_number. Ties on the 48-bit hash
    break by id; NULL ids raise executor-side — an unnamed row cannot be
    ordered reproducibly. Output: (id, seq, microbatch).

    Scale shape: a dense global enumeration is normally Spark's worst
    primitive (row_number over an EMPTY partitionSpec = the whole corpus
    through ONE task). Here the hash is uniform on [0, 2^48), so its
    value RANGE is split into `shards` contiguous, order-aligned strips:
    shard = h div (2^48/shards) preserves global hash order BETWEEN
    strips, each strip ranks locally (per-shard window over ~N/shards
    rows), and strip offsets come from a bounded shards-row collect
    folded into a literal map (the sorted_neighborhood / star-CC
    size-probe convention — never a partitionless window). Total: one
    hash exchange on shard reused by the count probe and the ranking.
    Set shards ~ cluster cores; skew is impossible by construction
    (uniform hash strips)."""
    if epoch < 0 or microbatch_size < 1 or shards < 1:
        raise ValueError("epoch >= 0, microbatch_size >= 1, shards >= 1 required")
    checked_id = F.when(F.col("_id").isNotNull(), F.col("_id")).otherwise(
        F.raise_error(F.lit("epoch_order: NULL id cannot be ordered"))
    )
    strip = (1 << 48) // int(shards) + (1 if (1 << 48) % int(shards) else 0)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", checked_id.cast("string"), F.lit(salt), F.lit(int(epoch))
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    tagged = (
        df.select(F.col(id_col).alias("_id"))
        .withColumn("_h", h)
        .withColumn("_sh", F.expr(f"_h div {strip}L").cast("int"))
        .localCheckpoint(eager=True)  # pin for the count probe + ranking
    )
    counts = {
        r._sh: r.c
        for r in tagged.groupBy("_sh").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for sh in sorted(counts):
        offsets[sh] = acc
        acc += counts[sh]
    off_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    ) if offsets else F.create_map(F.lit(0), F.lit(0))
    wr = Window.partitionBy("_sh").orderBy("_h", "_id")
    return (
        tagged.withColumn(
            "seq",
            (off_map[F.col("_sh")] + F.row_number().over(wr) - 1).cast("long"),
        )
        .select(
            F.col("_id").alias(id_col),
            "seq",
            F.expr(f"seq div {int(microbatch_size)}L").cast("long").alias("microbatch"),
        )
    )


def coverage_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    shingle_n: int = 2,
) -> DataFrame:
    """Greedy maximum-coverage corpus selection: pick k documents that
    together cover the most distinct word `shingle_n`-grams — the
    submodular data-selection primitive (greedy is (1-1/e)-optimal,
    Nemhauser et al. 1978) behind "choose the budgeted subset with the
    broadest linguistic coverage": seed-corpus selection, eval-set
    construction, and the coverage side of any quality-vs-diversity
    curation trade-off that mixture planning (above) balances by
    GROUP — this balances by CONTENT. The reference ingests everything
    it is pointed at (file_crawler.py) and has no selection notion.

    Output: (round, id, gain, covered_total) — round r's pick, the
    count of newly covered grams it contributed, and the running
    distinct-gram total; rounds stop early once the best gain is 0
    (standard greedy termination), so the result can be shorter than
    k. Ties break (gain desc, id asc) — deterministic anywhere.

    Scale shape: the (doc, gram) membership table is built ONCE
    (distinct-collapsed, localCheckpoint'd); each round is one
    anti-join against the covered-gram set, one algebraic per-doc
    count, and a single-row global argmax (an aggregation to ONE row —
    never a global window), with the winner's grams unioned into the
    checkpointed covered set. Per-round driver traffic is exactly one
    (id, gain) row plus one count — the bounded size-probe convention.
    k is the loop bound; plan depth stays O(1) per round via the
    checkpoints (the mmr_rerank lesson)."""
    if not 1 <= int(k) <= 256:
        raise ValueError("k must be in [1, 256]")
    if not 1 <= int(shingle_n) <= 8:
        raise ValueError("shingle_n must be in [1, 8]")
    n = int(shingle_n)
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    if n == 1:
        sh = F.array_distinct(toks)
    else:
        # Docs with fewer than n tokens have no n-grams. The guard is
        # load-bearing: F.sequence defaults step to -1 when start > stop,
        # so sequence(1, size-n+1) on a short doc yields [1, 0] and
        # slice(toks, 0, n) then raises INVALID_PARAMETER_VALUE.START
        # executor-side — a job-aborting crash on ordinary input (blank
        # or single-token docs). DuckDB's generate_series(1, len-1)
        # returns empty for the same doc, so the empty array is also the
        # cross-engine-consistent answer.
        sh = F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
    gd = (
        df.select(F.col(id_col).alias("_d"), F.explode(sh).alias("gram"))
        .where(F.col("gram") != "")
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    covered = spark.createDataFrame([], "gram string").localCheckpoint(eager=True)
    picks: list[tuple[int, object, int, int]] = []
    total = 0
    for r in range(1, int(k) + 1):
        rem = gd.join(covered, "gram", "left_anti")
        best = (
            rem.groupBy("_d")
            .agg(F.count(F.lit(1)).alias("gain"))
            .agg(F.min(F.struct((-F.col("gain")).alias("ng"), F.col("_d").alias("d"))).alias("b"))
            .select(F.col("b.d").alias("d"), (-F.col("b.ng")).alias("gain"))
            .collect()
        )
        if not best or best[0].d is None or best[0].gain == 0:
            break
        d, gain = best[0].d, int(best[0].gain)
        covered = covered.unionByName(
            rem.where(F.col("_d") == F.lit(d)).select("gram")
        ).localCheckpoint(eager=True)
        total += gain
        picks.append((r, d, gain, total))
    id_type = df.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        picks, f"round long, {id_col} {id_type}, gain long, covered_total long"
    )
