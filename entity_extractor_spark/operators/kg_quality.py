"""KG quality gates and exporters that run AFTER triple materialization:
schema/constraint auditing and templated verbalization.

The reference writes triples straight to MySQL with no ontology check
(chemical_service.py upsert path trusts the extractor); at KG scale a
constraint audit is the difference between a graph and a landfill —
every CDC batch brings typo'd predicates, out-of-range literals and
double-valued functional relations, and the audit has to be a cheap
relational pass, not a validator loop.

All rules are declarative column predicates + algebraic counts, so the
audit is one scan + one (subj, pred) agg regardless of corpus size, and
every verdict is engine-exact (string/format/BIGINT comparisons, DECIMAL
range checks — no floats).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_triples(
    triples: DataFrame,
    allowed_preds: Sequence[str],
    weight_preds: Sequence[str] = (),
    functional_preds: Sequence[str] = (),
    subj_pattern: str | None = None,
) -> DataFrame:
    """Constraint audit over a (subj, pred, obj, weight_percent) triple
    table. Emits ONE ROW PER VIOLATED RULE (a triple can appear under
    several rules): columns (subj, pred, obj, rule).

    Rules:
      * unknown_pred     — pred outside the allowed vocabulary, INCLUDING
                           NULL pred (a bare ~isin() would evaluate to
                           NULL and silently drop the row — exactly the
                           junk an audit exists to catch);
      * subj_format      — subj NULL or not rlike `subj_pattern`
                           (skipped when None);
      * weight_missing   — a weight-bearing pred with NULL weight;
      * weight_range     — weight present but not parseable as a
                           DECIMAL(18,6) in [0, 100] (try_cast, so junk
                           strings land here, never a crash);
      * weight_forbidden — weight on a KNOWN pred that must not carry
                           one (unknown preds are already flagged once);
      * functional_dup   — a functional pred with >1 DISTINCT object for
                           one subject (every participating triple is
                           flagged, so the fix-up join is direct).

    Scale shape: the five row-local rules are one codegen'd pass
    (Catalyst fuses the unions of filters over one scan); functional_dup
    is one (subj, pred) distinct-count aggregation joined back to the
    offending rows only — hub subjects collapse map-side. Predicate
    vocabularies are literal IN-lists (they are schema, not data).
    """
    if not allowed_preds:
        raise ValueError("allowed_preds must be non-empty")
    t = triples.select("subj", "pred", "obj", "weight_percent")
    viol = []

    def flag(cond, rule: str):
        viol.append(
            t.where(cond).select(
                "subj", "pred", "obj", F.lit(rule).alias("rule")
            )
        )

    flag(
        F.col("pred").isNull() | ~F.col("pred").isin(*allowed_preds),
        "unknown_pred",
    )
    if subj_pattern is not None:
        flag(
            F.col("subj").isNull() | ~F.col("subj").rlike(subj_pattern),
            "subj_format",
        )
    if weight_preds:
        wp = F.col("pred").isin(*weight_preds)
        w = F.expr("try_cast(weight_percent AS DECIMAL(18,6))")
        flag(wp & F.col("weight_percent").isNull(), "weight_missing")
        flag(
            wp
            & F.col("weight_percent").isNotNull()
            & (w.isNull() | (w < 0) | (w > 100)),
            "weight_range",
        )
        flag(
            F.col("pred").isin(*allowed_preds)
            & ~wp
            & F.col("weight_percent").isNotNull(),
            "weight_forbidden",
        )
    out = viol[0]
    for v in viol[1:]:
        out = out.unionAll(v)
    if functional_preds:
        fp = t.where(F.col("pred").isin(*functional_preds))
        dups = (
            fp.groupBy("subj", "pred")
            .agg(F.countDistinct("obj").alias("_nobj"))
            .where(F.col("_nobj") > 1)
            .select("subj", "pred")
        )
        out = out.unionAll(
            fp.join(dups, ["subj", "pred"]).select(
                "subj", "pred", "obj", F.lit("functional_dup").alias("rule")
            )
        )
    return out


def verbalize_triples(
    triples: DataFrame,
    group_pred: str,
    list_pred: str,
    frame: tuple[str, str, str],
    item_template: tuple[str, str, str],
    list_sep: str = ", ",
) -> DataFrame:
    """Deterministic KG->text export: one training sentence per subject,
    assembled from a functional predicate and a list predicate —
    frame[0] + subj + frame[1] + group_obj + frame[2] + sorted item list
    + '.' — with items ordered by their NUMERIC object id (a fixed total
    order, so the string is a pure function of the graph — same doctrine
    as sampled_adjacency's sorted CSV; array cells and nondeterministic
    collect orders never survive cross-engine checks, sorted joins do).

    item_template = (pre, mid, post): each list item renders as
    pre + obj + (mid + weight + post when weight present, else '').
    Subjects missing either predicate are dropped (INNER joins) —
    verbalization is for complete facts; audit first (validate_triples).

    Scale shape: two algebraic per-subject aggregations (the list side
    collects sorted structs — bounded by the subject's fact count, the
    join-key exchange shared) and one join; string assembly is
    codegen'd concat. Output: (subj, text, n_facts).
    """
    g = (
        triples.where(F.col("pred") == group_pred)
        .groupBy("subj")
        .agg(F.min("obj").alias("_gobj"))
    )
    pre, mid, post = item_template
    phrase = F.concat(
        F.lit(pre),
        F.col("obj"),
        F.when(
            F.col("weight_percent").isNotNull(),
            F.concat(F.lit(mid), F.col("weight_percent"), F.lit(post)),
        ).otherwise(F.lit("")),
    )
    items = (
        triples.where(F.col("pred") == list_pred)
        .select(
            "subj",
            F.struct(
                F.col("obj").cast("long").alias("k"), phrase.alias("p")
            ).alias("_it"),
        )
        .groupBy("subj")
        .agg(F.array_sort(F.collect_list("_it")).alias("_arr"))
        .select(
            "subj",
            F.size("_arr").cast("long").alias("n_facts"),
            F.array_join(F.transform("_arr", lambda s: s["p"]), list_sep).alias(
                "_list"
            ),
        )
    )
    f0, f1, f2 = frame
    return g.join(items, "subj").select(
        "subj",
        F.concat(
            F.lit(f0), F.col("subj"), F.lit(f1), F.col("_gobj"),
            F.lit(f2), F.col("_list"), F.lit("."),
        ).alias("text"),
        "n_facts",
    )


def match_path(
    triples: DataFrame,
    steps: Sequence[tuple[str, str]],
    distinct_nodes: bool = False,
) -> DataFrame:
    """Directed path-motif matching over the triple table: bindings
    (v0, v1, ..., vk) such that consecutive nodes are connected by the
    given predicate sequence — steps = [(pred, 'fwd'|'rev'), ...] where
    'fwd' walks subj->obj and 'rev' walks obj->subj (so
    customer <-placedBy- order -containsPart-> part is
    [('placedBy','rev'), ('containsPart','fwd')] anchored at the
    customer). The basic graph-pattern query (one SPARQL BGP path /
    Cypher chain) a KG that only exposes DataFrames still owes its
    users; multi-hop joins are how every "who supplied the material
    containing X" question runs.

    Scale shape: each step is ONE hash equi-join on the shared variable,
    with its predicate filter pushed into the triple scan (Catalyst
    prunes to one pass over the pred-partitioned data per step); no
    driver-side expansion, no cartesian anywhere. distinct_nodes=True
    appends pairwise v_i != v_j filters (cycle exclusion) — O(k^2)
    codegen'd comparisons, k = path length. Skew note: a hub node fans
    out exactly like the underlying join; cap upstream (bipartite_
    project's capped-middle doctrine) when hubs are viral.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    for _, d in steps:
        if d not in ("fwd", "rev"):
            raise ValueError("step direction must be 'fwd' or 'rev'")

    def edge(pred: str, direction: str, i: int) -> DataFrame:
        t = triples.where(F.col("pred") == pred)
        a, b = ("subj", "obj") if direction == "fwd" else ("obj", "subj")
        return t.select(F.col(a).alias(f"v{i}"), F.col(b).alias(f"v{i + 1}"))

    cur = edge(*steps[0], 0)
    for i, (p, d) in enumerate(steps[1:], start=1):
        cur = cur.join(edge(p, d, i), f"v{i}")
    cols = [f"v{i}" for i in range(len(steps) + 1)]
    out = cur.select(*cols)
    if distinct_nodes:
        for i in range(len(cols)):
            for j in range(i + 1, len(cols)):
                out = out.where(F.col(cols[i]) != F.col(cols[j]))
    return out


def triple_evidence(
    obs: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    source_col: str = "source",
    ts_col: str = "ts",
    k: int = 2,
) -> DataFrame:
    """Provenance rollup from observation-level triples to evidence-scored
    KG facts: per distinct (subj, pred, obj) — support (observation
    count), n_sources (distinct provenances), first_seen / last_seen, and
    confidence_ppm = support * 10^6 div (support + k), the saturating
    integer score (k=2: 1 obs -> 333333, 2 -> 500000, 10 -> 833333) that
    downstream pruning thresholds without ever re-counting observations.
    The reference keeps one row per triple and OVERWRITES on re-ingest
    (artifact edge upsert, `artifact_ingestor_service.py`) — losing
    exactly the support/provenance signal that separates a fact asserted
    by 40 documents from one asserted by a parse glitch.

    Scale shape: ONE grouped aggregation; count/min/max are algebraic
    (map-side combinable, hub triples collapse before the shuffle);
    the exact distinct-source count is the only two-phase member
    (profile_columns-priced). Timestamps pass through as strings —
    callers cast dates/timestamps to the string form they want compared
    (the raw-DATE pandas-compare lesson)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    return (
        obs.groupBy(
            F.col(subj).alias("subj"),
            F.col(pred).alias("pred"),
            F.col(obj).alias("obj"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("support"),
            F.countDistinct(source_col).cast("bigint").alias("n_sources"),
            F.min(F.col(ts_col).cast("string")).alias("first_seen"),
            F.max(F.col(ts_col).cast("string")).alias("last_seen"),
        )
        .withColumn(
            "confidence_ppm",
            F.expr(f"support * 1000000 DIV (support + {int(k)})"),
        )
    )


def summarize_entities(
    triples: DataFrame,
    k: int,
    per_pred: int | None = None,
) -> DataFrame:
    """Entity summarization: the k most DISTINCTIVE facts per subject,
    RELIN/FACES-style — a fact's salience is the global rarity of its
    (pred, obj) value (fact_df = how many subjects assert it; rarer =
    more informative), and `per_pred` caps how many facts one predicate
    may contribute so a hub predicate cannot monopolize the summary
    (FACES' diversity constraint). The reference renders every entity
    page by dumping ALL edges (chemical detail endpoint,
    chemical_service.py get path); at KG scale an entity card needs the
    top-k informative facts, not ten thousand containsPart rows.

    Output: (subj, pred, obj, fact_df, fact_rank) with rank 1..k per subject,
    ordered by (fact_df ASC, pred, obj) — a fixed total order over the
    deduped fact set, so the summary is a pure function of the graph
    (engine-exact: BIGINT df + plain string tiebreaks).

    Scale shape: dedupe + ONE (pred, obj) distinct-subject count joined
    back on (pred, obj) (popular facts collapse map-side in the count;
    the join key is the fact, so hub SUBJECTS don't skew it), then two
    subject-keyed windows — partitioned by (subj, pred) for the
    diversity cap, by subj for the final top-k. Both are bounded-output
    windows over the deduped facts; neither is ever global.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if per_pred is not None and per_pred < 1:
        raise ValueError("per_pred must be >= 1 or None")
    from pyspark.sql import Window

    facts = triples.select("subj", "pred", "obj").distinct()
    df_ = facts.groupBy("pred", "obj").agg(
        F.count(F.lit(1)).cast("bigint").alias("fact_df")
    )
    scored = facts.join(df_, ["pred", "obj"])
    if per_pred is not None:
        wp = Window.partitionBy("subj", "pred").orderBy(
            F.col("fact_df").asc(), F.col("obj").asc()
        )
        scored = (
            scored.withColumn("_pr", F.row_number().over(wp))
            .where(F.col("_pr") <= per_pred)
            .drop("_pr")
        )
    ws = Window.partitionBy("subj").orderBy(
        F.col("fact_df").asc(), F.col("pred").asc(), F.col("obj").asc()
    )
    return (
        scored.withColumn("fact_rank", F.row_number().over(ws).cast("bigint"))
        .where(F.col("fact_rank") <= k)
        .select("subj", "pred", "obj", "fact_df", "fact_rank")
    )


def mine_rules(triples: DataFrame, min_support: int = 1) -> DataFrame:
    """AMIE-lite rule mining over the closed triple set: for every
    ordered predicate pair, the support and confidence of the two
    length-1 Horn rules body(x,y) => head(x,y) ('fwd' — implication /
    subsumption, body != head) and body(x,y) => head(y,x) ('inv' —
    inverse predicate; body == head allowed, which is exactly symmetry
    detection). confidence_ppm = support * 10^6 div |body| on the exact
    integer grid — AMIE's std confidence under the closed-world counts
    this table has. This is the ontology-enrichment pass a reference-fed
    KG never gets (its predicate vocabulary is hard-coded,
    relationship_service.py): mined inverse/implication rules drive
    redundancy pruning and link-prediction candidates downstream.

    Output: (body_pred, head_pred, direction, body_n, support,
    conf_ppm), support >= min_support.

    Scale shape: facts are deduped once; both rule directions are ONE
    self-equi-join each on the ENTITY-PAIR key ((subj,obj) resp. the
    swapped pair) — never a cross join over predicates; per-pair
    fan-out is bounded by the predicate vocabulary (schema-sized), so
    hub entities don't quadratically blow up the join. Counts and the
    per-predicate totals are algebraic, and the final (body, head)
    aggregate is schema-sized — the whole plan shrinks monotonically.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    facts = triples.select("subj", "pred", "obj").distinct()
    body_n = facts.groupBy(F.col("pred").alias("body_pred")).agg(
        F.count(F.lit(1)).cast("bigint").alias("body_n")
    )
    b = facts.select(
        F.col("pred").alias("body_pred"),
        F.col("subj").alias("x"),
        F.col("obj").alias("y"),
    )
    h_fwd = facts.select(
        F.col("pred").alias("head_pred"),
        F.col("subj").alias("x"),
        F.col("obj").alias("y"),
    )
    h_inv = facts.select(
        F.col("pred").alias("head_pred"),
        F.col("obj").alias("x"),
        F.col("subj").alias("y"),
    )
    fwd = (
        b.join(h_fwd, ["x", "y"])
        .where(F.col("body_pred") != F.col("head_pred"))
        .groupBy("body_pred", "head_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .withColumn("direction", F.lit("fwd"))
    )
    inv = (
        b.join(h_inv, ["x", "y"])
        .groupBy("body_pred", "head_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .withColumn("direction", F.lit("inv"))
    )
    return (
        fwd.unionAll(inv)
        .where(F.col("support") >= min_support)
        .join(body_n, "body_pred")
        .select(
            "body_pred",
            "head_pred",
            "direction",
            "body_n",
            "support",
            F.expr("support * 1000000 DIV body_n").alias("conf_ppm"),
        )
    )


def infer_edges(
    triples: DataFrame,
    rules: DataFrame,
    min_conf_ppm: int = 500_000,
) -> DataFrame:
    """KG completion by rule application: fire every mined rule at or
    above `min_conf_ppm` (rows shaped like `mine_rules` output) against
    the closed triple set and materialize the head triples that are NOT
    already asserted, each carrying full provenance — which rule
    produced it and at what confidence. This is the enrichment pass
    AMIE-style systems run after mining: the reference's KG only ever
    contains what the extractor wrote (chemical_service.py upsert
    path); rule application is how a web-scale KG fills the holes its
    crawl missed (e.g. a mined inverse predicate backfills the reverse
    direction for every one-way edge).

    When several rules derive the same (subj, pred, obj), the single
    best derivation wins: lexicographically greatest
    (conf_ppm, rule_body, rule_direction) struct — an argmax on pure
    BIGINT/ASCII fields, so provenance is engine-exact.

    Output: (subj, pred, obj, rule_body, rule_direction, conf_ppm),
    one row per NEW triple.

    Scale shape: the rule table is schema-sized (≤ |preds|² rows) and
    broadcast; candidates are one fact × rule broadcast join keyed on
    body_pred (fan-out per fact = rules matching its predicate, bounded
    by the predicate vocabulary). The argmax is one algebraic
    struct-max agg on the candidate key, and novelty is one LEFT ANTI
    join against the deduped fact set on the triple key. No self-join
    of the fact table, no window.
    """
    if min_conf_ppm < 0 or min_conf_ppm > 1_000_000:
        raise ValueError("min_conf_ppm must be in [0, 1000000]")
    fired = F.broadcast(
        rules.where(F.col("conf_ppm") >= min_conf_ppm).select(
            F.col("body_pred"),
            F.col("head_pred"),
            F.col("direction"),
            F.col("conf_ppm"),
        )
    )
    facts = triples.select("subj", "pred", "obj").distinct()
    cand = facts.join(fired, facts["pred"] == fired["body_pred"]).select(
        F.when(F.col("direction") == "fwd", F.col("subj"))
        .otherwise(F.col("obj"))
        .alias("c_subj"),
        F.col("head_pred").alias("c_pred"),
        F.when(F.col("direction") == "fwd", F.col("obj"))
        .otherwise(F.col("subj"))
        .alias("c_obj"),
        "body_pred",
        "direction",
        "conf_ppm",
    )
    best = (
        cand.groupBy(
            F.col("c_subj").alias("subj"),
            F.col("c_pred").alias("pred"),
            F.col("c_obj").alias("obj"),
        )
        .agg(
            F.max(
                F.struct(
                    F.col("conf_ppm"),
                    F.col("body_pred").alias("rule_body"),
                    F.col("direction").alias("rule_direction"),
                )
            ).alias("_w")
        )
        .select(
            "subj",
            "pred",
            "obj",
            F.col("_w.rule_body").alias("rule_body"),
            F.col("_w.rule_direction").alias("rule_direction"),
            F.col("_w.conf_ppm").alias("conf_ppm"),
        )
    )
    return best.join(facts, ["subj", "pred", "obj"], "left_anti")


def entail_types(
    triples: DataFrame,
    asserted: DataFrame,
    subclass: DataFrame,
    domains: DataFrame,
    ranges: DataFrame,
) -> DataFrame:
    """RDFS-lite type entailment: materialize every (entity, class) the
    schema implies — rdfs2 (predicate domain types the subject), rdfs3
    (range types the object), rdfs9 (types propagate up the subClassOf
    closure) — from asserted types plus the instance edges. The
    reference has no ontology at all (node labels are whatever the
    extractor wrote); a web-scale KG answers "all Agents" only if
    domain/range/subclass entailment is materialized relationally, not
    walked per node.

    Inputs: `asserted` (entity, cls); `subclass` (sub, sup) direct
    edges, schema-sized DAG; `domains`/`ranges` (pred, cls). Output:
    (entity, cls, basis) — distinct entailed types, basis = the
    alphabetically first of the contributing derivations ('asserted' <
    'domain' < 'range' < 'subclass'), which is exactly the
    most-direct-evidence priority and a plain min() on ASCII, so
    provenance is engine-exact.

    Scale shape: domain/range typing is two broadcast joins of the
    fact table against schema-sized dictionaries; the subclass closure
    is graph.transitive_closure on a schema-sized edge set (log-depth
    path doubling, trivial here); the subclass lift is one broadcast
    join of base types x closure; the final dedupe is one algebraic
    min-groupBy on (entity, cls). Nothing shuffles on more than the
    entity key.
    """
    for name, frame in (
        ("asserted", asserted), ("subclass", subclass),
        ("domains", domains), ("ranges", ranges),
    ):
        if frame is None:
            raise ValueError(f"{name} frame is required (may be empty)")
    from .graph import transitive_closure

    base = (
        asserted.select(
            F.col("entity"), F.col("cls"), F.lit("asserted").alias("basis")
        )
        .unionAll(
            triples.join(
                F.broadcast(domains.select("pred", "cls")), "pred"
            ).select(
                F.col("subj").alias("entity"), "cls",
                F.lit("domain").alias("basis"),
            )
        )
        .unionAll(
            triples.join(
                F.broadcast(ranges.select("pred", "cls")), "pred"
            ).select(
                F.col("obj").alias("entity"), "cls",
                F.lit("range").alias("basis"),
            )
        )
    )
    closure = transitive_closure(
        subclass.select(F.col("sub").alias("src"), F.col("sup").alias("dst"))
    ).select(F.col("src").alias("sub"), F.col("dst").alias("sup"))
    lifted = base.join(
        F.broadcast(closure), base["cls"] == closure["sub"]
    ).select(
        "entity", F.col("sup").alias("cls"), F.lit("subclass").alias("basis")
    )
    return (
        base.unionAll(lifted)
        .groupBy("entity", "cls")
        .agg(F.min("basis").alias("basis"))
    )


def property_closure(
    triples: DataFrame,
    symmetric: tuple[str, ...] = (),
    inverse_of: tuple[tuple[str, str], ...] = (),
    transitive: tuple[str, ...] = (),
    max_rounds: int = 20,
) -> DataFrame:
    """OWL-lite property entailment: materialize the triples implied by
    owl:SymmetricProperty, owl:inverseOf and owl:TransitiveProperty
    declarations. The reference stores edges exactly as extracted
    (global_edge_repository.py add_edge) and can answer "X relatesTo Y"
    only in the stored direction; a queryable web-scale KG materializes
    the entailed closure relationally instead of walking per node.

    Rule application order (finite, and exact for the sane declaration
    combinations — see below):
      1. symmetric + inverseOf derivations over the asserted triples;
      2. per-predicate transitive closure (graph.transitive_closure,
         log-depth path doubling) over asserted + step-1 output;
      3. symmetric + inverseOf once more over the new transitive pairs —
         closing inverse-of-transitive (the inverse of a transitive
         closure IS the closure of the inverse) and re-symmetrizing.
    A symmetric transitive predicate closes exactly (step 2 runs over the
    symmetrized edge set = undirected reachability); mutually-recursive
    exotic stacks beyond one extra round (e.g. a symmetric inverse of a
    different transitive predicate) are applied as declared, not chased
    to a joint fixpoint.

    Output: (subj, pred, obj, basis) distinct; basis is the minimum of
    the contributing derivations on ASCII order — 'asserted' < 'inverse'
    < 'symmetric' < 'transitive', which is exactly most-direct-evidence
    priority, so provenance is engine-exact (same min() trick as
    entail_types).

    Scale shape: symmetric/inverse derivations are column swaps (zero
    shuffle); each transitive predicate pays transitive_closure's one
    equi-join + algebraic min-groupBy per doubling round on ITS edge
    slice only; the final dedupe is one algebraic min-groupBy on
    (subj, pred, obj)."""
    from .graph import transitive_closure

    t = triples.select("subj", "pred", "obj").where(
        F.col("subj").isNotNull() & F.col("pred").isNotNull() & F.col("obj").isNotNull()
    )

    def derive_once(frame: DataFrame) -> DataFrame:
        """One application of the symmetric + inverseOf rules to `frame`
        (basis-tagged); returns only the derived rows."""
        outs = []
        if symmetric:
            outs.append(
                frame.where(F.col("pred").isin(*symmetric)).select(
                    F.col("obj").alias("subj"),
                    "pred",
                    F.col("subj").alias("obj"),
                    F.lit("symmetric").alias("basis"),
                )
            )
        for p, q in inverse_of:
            for a, b in ((p, q), (q, p)):
                outs.append(
                    frame.where(F.col("pred") == a).select(
                        F.col("obj").alias("subj"),
                        F.lit(b).alias("pred"),
                        F.col("subj").alias("obj"),
                        F.lit("inverse").alias("basis"),
                    )
                )
        if not outs:
            return None
        acc = outs[0]
        for o in outs[1:]:
            acc = acc.unionAll(o)
        return acc

    base = t.withColumn("basis", F.lit("asserted"))
    d1 = derive_once(base)
    pool = base if d1 is None else base.unionAll(d1)

    trans_parts = []
    for p in transitive:
        closed = transitive_closure(
            pool.where(F.col("pred") == p), src="subj", dst="obj",
            max_rounds=max_rounds,
        )
        trans_parts.append(
            closed.where(F.col("dist") >= 2).select(
                F.col("src").alias("subj"),
                F.lit(p).alias("pred"),
                F.col("dst").alias("obj"),
                F.lit("transitive").alias("basis"),
            )
        )
    for tp in trans_parts:
        pool = pool.unionAll(tp)
        d2 = derive_once(tp)
        if d2 is not None:
            pool = pool.unionAll(d2)

    return (
        pool.where(F.col("subj") != F.col("obj"))
        .groupBy("subj", "pred", "obj")
        .agg(F.min("basis").alias("basis"))
    )


def functional_violations(
    triples: DataFrame,
    functional: tuple[str, ...] = (),
    inverse_functional: tuple[str, ...] = (),
) -> DataFrame:
    """owl:FunctionalProperty / owl:InverseFunctionalProperty audit: a
    functional predicate allows ONE object per subject (a material has
    one CAS number); an inverse-functional predicate allows ONE subject
    per object (a CAS number names one material — the reference's
    match-by-CAS linking silently assumes this, entity_linker.py's
    CAS-first cascade). Emits one row per violated (pred, entity):
    (pred, entity, side 'subj'|'obj', n_values, v_min, v_max) where
    n_values is the distinct conflicting-value count and v_min/v_max
    bracket the conflict deterministically. Feed the offenders into
    truth.truth_discovery to adjudicate.

    One algebraic count-distinct/min/max groupBy per direction — no
    joins, map-side partials absorb hub entities."""
    t = triples.select("subj", "pred", "obj")
    parts = []
    if functional:
        parts.append(
            t.where(F.col("pred").isin(*functional))
            .groupBy("pred", F.col("subj").alias("entity"))
            .agg(
                F.countDistinct("obj").alias("n_values"),
                F.min("obj").alias("v_min"),
                F.max("obj").alias("v_max"),
            )
            .where(F.col("n_values") > 1)
            .select(
                "pred", "entity", F.lit("subj").alias("side"),
                "n_values", "v_min", "v_max",
            )
        )
    if inverse_functional:
        parts.append(
            t.where(F.col("pred").isin(*inverse_functional))
            .groupBy("pred", F.col("obj").alias("entity"))
            .agg(
                F.countDistinct("subj").alias("n_values"),
                F.min("subj").alias("v_min"),
                F.max("subj").alias("v_max"),
            )
            .where(F.col("n_values") > 1)
            .select(
                "pred", "entity", F.lit("obj").alias("side"),
                "n_values", "v_min", "v_max",
            )
        )
    if not parts:
        raise ValueError("declare at least one functional or inverse_functional predicate")
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionAll(p)
    return acc
