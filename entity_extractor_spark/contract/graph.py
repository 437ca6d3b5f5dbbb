"""Graph suite: components, pagerank (+personalized), triangles, k-core/truss, SCC, HITS, SSSP, modularity, label propagation, closure, temporal reachability, mutual-kNN.

Split out of the former monolithic contract.py (round-4, VERDICT ask #6);
query registration happens via the shared @query decorator into the
aggregating contract.Q / contract.SQL dicts in _shared.py.
"""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import Window  # noqa: F401

from ._shared import *  # noqa: F401,F403



# ------------------------------------------------------------------ graph --

@query(
    "graph_components_star",
    """WITH e0 AS (
  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem WHERE l_orderkey % 997 = 1
),
edges2 AS (
  SELECT a, b FROM e0 UNION SELECT b, a FROM e0
  UNION SELECT a, a FROM e0 UNION SELECT b, b FROM e0
),
closure AS (
  WITH RECURSIVE reach(src, dst) AS (
    SELECT a, b FROM edges2
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges2 e ON r.dst = e.a
  )
  SELECT src AS vertex, min(dst) AS component FROM reach GROUP BY src
)
SELECT vertex, component FROM closure""",
)
def graph_components_star(spark, sf_dir):
    """Canonicalization primitive value-checked end-to-end: connected
    components via the large-star/small-star algorithm (Kiveris et al.
    2014) over a sparse part<->supplier bipartite graph, against a DuckDB
    recursive-CTE transitive-closure oracle. algorithm='star' forces the
    distributed O(log n)-round path (the KG driver queries already gate the
    union-find and hash-min paths via their own closure oracles).
    Reference semantics: global-node cluster identity,
    artifact_ingestor_service.py:1108-1145."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 997 == 1)
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return G.connected_components(edges, algorithm="star")


@query("graph_pagerank", _pagerank_sql())
def graph_pagerank(spark, sf_dir):
    """Entity-importance ranking for the KG: deterministic 3-iteration
    PageRank (graph.pagerank) over the part<->supplier co-occurrence graph,
    value-checked against a DuckDB replay of the identical unrolled
    iterations. All iteration arithmetic is exact BIGINT fixed-point
    (1e-9 units, damping 17/20, half-up integer division) — bit-stable by
    construction under any partitioning or engine, stronger than the
    round-double-then-sum-decimal technique the kmeans/lattice folds use.
    KG use: disambiguation priors / triple ranking by node centrality
    (reference ranks nodes only by raw degree, global_node_repository.py)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 97 == 1)
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return G.pagerank(edges, iterations=3)


@query(
    "graph_triangles",
    f"""WITH {_PAIRS_CTE}
       SELECT count(*) AS triangles
       FROM pairs e1
       JOIN pairs e2 ON e2.s = e1.s AND e2.t > e1.t
       JOIN pairs e3 ON e3.s = e1.t AND e3.t = e2.t""",
)
def graph_triangles(spark, sf_dir):
    """Entity-graph cohesion diagnostic: global triangle count
    (graph.triangle_count) over the parts-co-ordered-together graph, using
    the degree-ordered orientation (each triangle counted once as a wedge
    a->b->c closed by a->c; hub fan-out capped at O(sqrt(|E|))). The DuckDB
    oracle counts the same triangles by the direct a<b<c three-way join —
    different physical strategy, same value, which is exactly the
    cross-check the orientation trick needs."""
    return G.triangle_count(_co_order_edges(spark, sf_dir))


@query(
    "graph_label_propagation",
    f"""WITH {_PAIRS_CTE},
       und AS (SELECT s, t FROM pairs UNION SELECT t AS s, s AS t FROM pairs),
       l0 AS (SELECT DISTINCT s AS v, s AS label FROM und),
       n1 AS (SELECT u.s AS v, l.label, count(*) AS cnt
              FROM und u JOIN l0 l ON l.v = u.t GROUP BY u.s, l.label),
       l1 AS (SELECT v, label FROM (
                SELECT v, label, row_number() OVER (
                  PARTITION BY v ORDER BY cnt DESC, label ASC) AS rn FROM n1)
              WHERE rn = 1),
       n2 AS (SELECT u.s AS v, l.label, count(*) AS cnt
              FROM und u JOIN l1 l ON l.v = u.t GROUP BY u.s, l.label),
       l2 AS (SELECT v, label FROM (
                SELECT v, label, row_number() OVER (
                  PARTITION BY v ORDER BY cnt DESC, label ASC) AS rn FROM n2)
              WHERE rn = 1)
       SELECT v AS vertex, label FROM l2""",
)
def graph_label_propagation(spark, sf_dir):
    """Community detection on the parts-co-ordered-together graph
    (graph.label_propagation, 2 synchronous rounds): most-frequent
    neighbor label with smallest-label tie-break — a total order, so the
    unrolled per-round DuckDB CTEs must agree bit-for-bit. Communities are
    the dense neighborhoods canonicalization review and per-neighborhood
    sampling operate on (finer than connected components, which merge
    through any single bridge)."""
    return G.label_propagation(_co_order_edges(spark, sf_dir), iterations=2)


@query(
    "graph_k_core",
    f"""WITH {_PAIRS_CTE},
       und AS (SELECT s, t FROM pairs UNION SELECT t AS s, s AS t FROM pairs),
       d0 AS (SELECT s, count(*) AS d FROM und GROUP BY s),
       v1 AS (SELECT s FROM d0 WHERE d >= 80),
       e1 AS (SELECT u.s, u.t FROM und u JOIN v1 a ON a.s = u.s
              JOIN v1 b ON b.s = u.t),
       d1 AS (SELECT s, count(*) AS d FROM e1 GROUP BY s),
       v2 AS (SELECT s FROM d1 WHERE d >= 80),
       e2 AS (SELECT u.s, u.t FROM e1 u JOIN v2 a ON a.s = u.s
              JOIN v2 b ON b.s = u.t),
       d2 AS (SELECT s, count(*) AS d FROM e2 GROUP BY s),
       v3 AS (SELECT s FROM d2 WHERE d >= 80),
       e3 AS (SELECT u.s, u.t FROM e2 u JOIN v3 a ON a.s = u.s
              JOIN v3 b ON b.s = u.t)
       SELECT s AS vertex, count(*) AS degree FROM e3 GROUP BY s""",
)
def graph_k_core(spark, sf_dir):
    """Density nucleus of the parts-co-ordered-together graph
    (graph.k_core, k=80 — prunes a real low-degree fringe while leaving a
    non-empty core at both sf0.01 and sf0.1 so the oracle checks values,
    not emptiness; k>=100 empties the sf0.01 graph — 3 synchronous
    rounds): iteratively drop vertices of degree
    < k — the low-support noise pruning run before canonicalization.
    Pure integer arithmetic per round; the DuckDB oracle unrolls the same
    three peels."""
    return G.k_core(_co_order_edges(spark, sf_dir), k=80, rounds=3)


@query(
    "graph_common_neighbors",
    f"""WITH {_Q25_PAIRS_CTE},
       midok AS (SELECT src AS m FROM und GROUP BY src HAVING count(*) <= 40),
       nb AS (SELECT und.src AS m, und.dst AS u
              FROM und JOIN midok ON und.src = midok.m),
       wed AS (SELECT n1.u AS u, n2.u AS v FROM nb n1
               JOIN nb n2 ON n1.m = n2.m AND n1.u < n2.u),
       sc AS (SELECT u, v, count(*) AS common_neighbors FROM wed GROUP BY u, v)
       SELECT sc.u, sc.v, sc.common_neighbors
       FROM sc LEFT JOIN p ON p.s = sc.u AND p.t = sc.v
       WHERE p.s IS NULL
       ORDER BY sc.common_neighbors DESC, sc.u, sc.v
       LIMIT 100""",
)
def graph_common_neighbors(spark, sf_dir):
    """Link prediction (graph.common_neighbors_topk): the 100 strongest
    NON-adjacent part pairs by shared co-order neighbors over the
    high-quantity co-order graph — the missing-KG-edge candidate generator
    the reference cannot express (it only proposes edges where a
    same-document mention pair exists, artifact_ingestor_service.py).
    Middles above degree 40 are EXCLUDED (not sampled) so the capped-wedge
    count is deterministic and both engines agree exactly; at sf0.01 the
    cap binds on ~18% of vertices and ~700k wedges survive, so the
    exclusion path is value-checked, not vacuous. Ties at the k boundary
    break by (count desc, u, v) — a total order, so LIMIT is stable.
    Spark plans the top-k as TakeOrderedAndProject, never a global sort."""
    return G.common_neighbors_topk(
        _q25_edges(spark, sf_dir), k=100, max_middle_degree=40
    ).select(F.col("u"), F.col("v"), "common_neighbors")


@query(
    "graph_link_prediction_ra",
    f"""WITH {_Q25_PAIRS_CTE},
       deg AS (SELECT src AS z, count(*) AS deg FROM und GROUP BY src),
       midok AS (SELECT z AS m, CAST(1000000000 // deg AS BIGINT) AS ra
                 FROM deg WHERE deg <= 40),
       nb AS (SELECT und.src AS m, und.dst AS u, midok.ra
              FROM und JOIN midok ON und.src = midok.m),
       wed AS (SELECT n1.u AS u, n2.u AS v, n1.ra FROM nb n1
               JOIN nb n2 ON n1.m = n2.m AND n1.u < n2.u),
       sc AS (SELECT u, v, count(*) AS cn, CAST(sum(ra) AS BIGINT) AS ra
              FROM wed GROUP BY u, v),
       top AS (SELECT sc.u, sc.v, sc.cn, sc.ra
               FROM sc LEFT JOIN p ON p.s = sc.u AND p.t = sc.v
               WHERE p.s IS NULL
               ORDER BY sc.ra DESC, sc.cn DESC, sc.u, sc.v
               LIMIT 100)
       SELECT t.u, t.v, t.cn AS common_neighbors,
              CAST(t.cn * 1000000 // (du.deg + dv.deg - t.cn) AS BIGINT)
                AS jaccard_ppm,
              t.ra AS ra_1e9
       FROM top t JOIN deg du ON du.z = t.u JOIN deg dv ON dv.z = t.v""",
)
def graph_link_prediction_ra(spark, sf_dir):
    """Weighted link prediction (graph.link_prediction_topk): the 100
    strongest non-adjacent part pairs by RESOURCE-ALLOCATION index
    (sum of 1/deg(z) over shared co-order neighbors, 1e-9 units) with the
    neighborhood-Jaccard in ppm alongside — RA down-weights promiscuous
    middles where raw common-neighbor count cannot distinguish "shares 5
    rare parts" from "shares 5 parts everyone orders". Pure BIGINT
    arithmetic end-to-end (integer div per middle, integer sum, integer
    ppm quotient) so both engines agree bit-exactly; middles above degree
    40 are excluded exactly as in graph_common_neighbors, while the
    Jaccard denominator uses TRUE degrees. Reference analog: none — it
    only proposes edges backed by a same-document mention pair
    (artifact_ingestor_service.py)."""
    return G.link_prediction_topk(
        _q25_edges(spark, sf_dir), k=100, max_middle_degree=40
    )


@query(
    "graph_k_hop",
    f"""WITH {_Q25_PAIRS_CTE},
       d0 AS (SELECT p_partkey AS vertex, CAST(0 AS BIGINT) AS dist
              FROM part WHERE p_partkey % 100 = 0),
       f1 AS (SELECT DISTINCT und.dst AS vertex
              FROM und JOIN d0 ON und.src = d0.vertex),
       d1 AS (SELECT vertex, CAST(1 AS BIGINT) AS dist FROM f1
              WHERE vertex NOT IN (SELECT vertex FROM d0)),
       f2 AS (SELECT DISTINCT und.dst AS vertex
              FROM und JOIN d1 ON und.src = d1.vertex),
       d2 AS (SELECT vertex, CAST(2 AS BIGINT) AS dist FROM f2
              WHERE vertex NOT IN (SELECT vertex FROM d0
                                   UNION ALL SELECT vertex FROM d1))
       SELECT vertex, dist FROM d0
       UNION ALL SELECT vertex, dist FROM d1
       UNION ALL SELECT vertex, dist FROM d2""",
)
def graph_k_hop(spark, sf_dir):
    """Seed expansion (graph.k_hop_neighborhood): every part within 2
    undirected hops of the round-number seed parts over the high-quantity
    co-order graph, with MINIMUM hop distance — the KG subsetting query
    ("the neighborhood of these entities") the reference answers one node
    at a time (global_edge_repository.py get_edges_for_node loops).
    Frontier BFS: per round one frontier-sized equi-join + one anti-join
    against visited, never a |V|-scan; deterministic because min-dist has
    no tie to break. The oracle unrolls the two rounds as CTE levels."""
    edges = _q25_edges(spark, sf_dir)
    seeds = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 100 == 0)
        .select(F.col("p_partkey").alias("vertex"))
    )
    return G.k_hop_neighborhood(edges, seeds, 2)


@query("graph_personalized_pagerank", _ppr_sql())
def graph_personalized_pagerank(spark, sf_dir):
    """Seed-relevance ranking (graph.personalized_pagerank): 2-iteration
    teleport-to-seeds PageRank of every part relative to the round-number
    seed parts over the high-quantity co-order graph — graded relevance
    where graph_k_hop gives only a cut, the disambiguation context prior
    the reference lacks (it ranks by raw degree only,
    global_node_repository.py). Same exact BIGINT fixed-point doctrine as
    graph_pagerank (1e-9 units, rational damping, half-up division): the
    DuckDB oracle replays the unrolled iterations bit-for-bit. One
    equi-join + one algebraic groupBy per iteration; isolated seeds keep
    their teleport mass."""
    seeds = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 100 == 0)
        .select(F.col("p_partkey").alias("vertex"))
    )
    return G.personalized_pagerank(
        _q25_edges(spark, sf_dir), seeds, iterations=2
    )


@query(
    "graph_transitive_closure",
    """WITH RECURSIVE e AS (
         SELECT c_custkey AS src, c_custkey // 10 AS dst
         FROM customer WHERE c_custkey >= 10),
       r AS (
         SELECT src, dst, CAST(1 AS BIGINT) AS dist FROM e
         UNION
         SELECT r.src, e.dst, r.dist + 1 FROM r JOIN e ON r.dst = e.src)
       SELECT src, dst, dist FROM r""",
)
def graph_transitive_closure(spark, sf_dir):
    """Ancestor closure with min hop distance (graph.transitive_closure):
    the digit-shift customer hierarchy (custkey -> custkey DIV 10) is a
    forest 4-5 levels deep, so the closure is every (node, ancestor,
    depth) triple — the subsumption/rollup primitive the reference can
    only produce by walking get_edges_for_node one Python call per level
    (global_edge_repository.py). Path doubling converges here in 3 rounds
    (log2 of the depth) where the oracle's recursive CTE — deliberately
    the opposite, one-level-per-iteration formulation — takes 5; any
    lost, duplicated, or wrong-depth pair hash-mismatches."""
    e = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") >= 10)
        .select(
            F.col("c_custkey").alias("src"),
            F.expr("c_custkey DIV 10").alias("dst"),
        )
    )
    return G.transitive_closure(e)


@query("graph_hits", _hits_sql())
def graph_hits(spark, sf_dir):
    """Hubs & authorities (graph.hits) over the DIRECTED part->supplier
    order graph: parts are pure hubs, suppliers pure authorities, and the
    scores weight each side by the quality of the other — the
    second spectral centrality next to graph_pagerank, for pointing
    structures where in-links and out-links mean different things. Exact
    BIGINT/DECIMAL(38,0) fixed-point with L-inf (max) normalization per
    half-iteration, so the replay is bit-identical by construction; the
    per-iteration max is the oracle's scalar subquery and the operator's
    one metadata agg-collect."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 97 == 1)
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return G.hits(edges, iterations=2)


@query(
    "graph_incremental_components",
    """WITH e0 AS (
  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem WHERE l_orderkey % 997 IN (1, 2)
),
edges2 AS (
  SELECT a, b FROM e0 UNION SELECT b, a FROM e0
  UNION SELECT a, a FROM e0 UNION SELECT b, b FROM e0
),
closure AS (
  WITH RECURSIVE reach(src, dst) AS (
    SELECT a, b FROM edges2
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges2 e ON r.dst = e.a
  )
  SELECT src AS vertex, min(dst) AS component FROM reach GROUP BY src
)
SELECT vertex, component FROM closure""",
)
def graph_incremental_components(spark, sf_dir):
    """Incremental CC maintenance (graph.incremental_components):
    yesterday's labels (CC over the %997==1 slice of the part<->supplier
    graph) absorb today's batch (the %997==2 slice) by contracting each
    existing component to its label and running CC only on the
    relabeled NEW edges — O(new batch + affected components), never a
    pass over historical edges. The oracle is the full-recompute
    recursive closure over the UNION, so any label the increment fails
    to merge (or merges wrongly) hash-mismatches. The daily-ingest
    canonical-entity shape; CC analog of dedup_incremental_lsh."""
    li = _t(spark, sf_dir, "lineitem")

    def slice_edges(r: int):
        return li.where(F.col("l_orderkey") % 997 == r).select(
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )

    base = G.connected_components(slice_edges(1))
    return G.incremental_components(base, slice_edges(2))


@query(
    "graph_weighted_sssp",
    """WITH RECURSIVE e AS (
         SELECT c_custkey // 10 AS src, c_custkey AS dst,
                c_custkey % 7 + 1 AS w
         FROM customer WHERE c_custkey >= 10),
       seeds AS (SELECT c_custkey AS vertex FROM customer
                 WHERE c_custkey < 10),
       d(vertex, dist) AS (
         SELECT vertex, CAST(0 AS BIGINT) FROM seeds
         UNION
         SELECT e.dst, d.dist + e.w FROM d JOIN e ON e.src = d.vertex)
       SELECT vertex, dist FROM d""",
)
def graph_weighted_sssp(spark, sf_dir):
    """Weighted shortest paths (graph.weighted_sssp): root-to-node cost
    down the digit-shift customer tree with edge weight custkey%7+1 —
    the priced version of graph_transitive_closure's hop depth
    (Bellman-Ford relaxation rounds: one edges-x-distances equi-join +
    one algebraic min per round, fingerprint-stop). The tree's unique
    paths make the recursive-CTE oracle exact without a min; the
    operator's min is exercised by the Dijkstra-replay unit tests on
    cyclic multigraphs. Negative weights fail loudly (unit-gated)."""
    cust = _t(spark, sf_dir, "customer")
    e = cust.where(F.col("c_custkey") >= 10).select(
        F.expr("c_custkey DIV 10").alias("src"),
        F.col("c_custkey").alias("dst"),
        F.expr("c_custkey % 7 + 1").alias("weight"),
    )
    seeds = cust.where(F.col("c_custkey") < 10).select(
        F.col("c_custkey").alias("vertex")
    )
    return G.weighted_sssp(e, seeds)


@query(
    "graph_bipartite_project",
    """WITH lr AS (SELECT DISTINCT l_suppkey AS l, l_orderkey AS r
                   FROM lineitem
                   WHERE l_suppkey IS NOT NULL AND l_orderkey IS NOT NULL),
       deg AS (SELECT r, count(*) AS d FROM lr GROUP BY r),
       ok AS (SELECT lr.l, lr.r FROM lr JOIN deg USING (r) WHERE d <= 5)
       SELECT a.l AS l1, b.l AS l2, CAST(count(*) AS BIGINT) AS weight
       FROM ok a JOIN ok b ON a.r = b.r AND a.l < b.l
       GROUP BY 1, 2 HAVING count(*) >= 2""",
)
def graph_bipartite_project(spark, sf_dir):
    """Weighted one-mode projection (graph.bipartite_project): suppliers
    co-appearing in the same order, orders with more than 5 distinct
    suppliers EXCLUDED by the capped-middle doctrine (the cap binds on
    ~20% of orders at both scale factors, so the exclusion branch is
    value-checked) — the first-class form of the ad-hoc co-occurrence
    CTEs every KG build writes (this repo's q25 co-order graph
    included). One distinct, one degree agg + filter reusing the same
    right-key exchange, one cap-bounded self-join, one algebraic
    count."""
    li = _t(spark, sf_dir, "lineitem")
    return G.bipartite_project(
        li, "l_suppkey", "l_orderkey", max_right_degree=5, min_weight=2
    )


@query(
    "graph_k_truss",
    f"""WITH c0 AS (
         SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey
          AND a.l_quantity >= 25 AND b.l_quantity >= 25
         WHERE a.l_partkey < b.l_partkey),
       {_truss_rounds_sql(3, 6)}
       SELECT src, dst, support FROM c3""",
)
def graph_k_truss(spark, sf_dir):
    """Edge-level cohesion filter (graph.k_truss): 6-truss of the q25
    co-order graph after 3 synchronous peel rounds — edges embedded in
    >= 4 triangles among surviving edges, the denoiser that drops weak
    bridges BEFORE canonicalization merges clusters across them (k_core
    keeps a spam hub's edges; k_truss demands the corroborating
    neighbors know each other). Fixed-round doctrine as k_core/pagerank;
    the peel converges by round 3 at both scale factors while removing
    ~85% of edges, so both branches are value-checked. The operator
    counts support via degree-ordered triangle orientation (hub fan-out
    O(sqrt E)); the oracle recounts it via the naive common-neighbor
    join — different strategy, same integers."""
    return G.k_truss(_q25_edges(spark, sf_dir), k=6, rounds=3)


@query(
    "graph_harmonic_centrality",
    f"""WITH {_Q25_PAIRS_CTE},
       seeds AS (SELECT DISTINCT l_partkey AS v FROM lineitem
                 WHERE l_partkey % 499 = 0),
       reach AS (
         SELECT seed, vertex, min(dist) AS dist FROM (
           SELECT v AS seed, v AS vertex, 0 AS dist FROM seeds
           UNION ALL
           SELECT s.v, u.dst, 1 FROM seeds s JOIN und u ON u.src = s.v
           UNION ALL
           SELECT s.v, u2.dst, 2 FROM seeds s
           JOIN und u1 ON u1.src = s.v
           JOIN und u2 ON u2.src = u1.dst
         ) q GROUP BY 1, 2)
       SELECT vertex, CAST(count(*) AS BIGINT) AS reached_seeds,
              CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_ppm
       FROM reach WHERE dist >= 1 GROUP BY vertex""",
)
def graph_harmonic_centrality(spark, sf_dir):
    """Sampled harmonic centrality (graph.harmonic_centrality): exact
    2-round multi-source BFS from the deterministic %499 part-seed
    sample over the q25 co-order graph, score = sum of 1e6 div d(s, v)
    in pure BIGINT — the Eppstein-Wang-style closeness estimate whose
    cost is |S| x |E| per round instead of the unpayable V x E, and
    which stays defined on disconnected graphs. One frontier equi-join
    + one algebraic (seed, vertex) min per round. The oracle unrolls
    both hops and takes the same min, so a frontier that double-counts
    or misses a shorter path hash-mismatches; dist 1 and 2 both carry
    mass at both scale factors."""
    li = _t(spark, sf_dir, "lineitem")
    seeds = li.where("l_partkey % 499 = 0").select(
        F.col("l_partkey").alias("v")
    ).distinct()
    return G.harmonic_centrality(_q25_edges(spark, sf_dir), seeds, rounds=2)


@query(
    "graph_edge_lift",
    """WITH pc AS (
         SELECT a.l_partkey AS src, b.l_partkey AS dst,
                CAST(count(*) AS BIGINT) AS c_ab
         FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         WHERE a.l_partkey < b.l_partkey AND a.l_orderkey % 3 = 0
         GROUP BY 1, 2),
       tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS t FROM pc),
       deg AS (
         SELECT v, CAST(sum(c_ab) AS BIGINT) AS c_v FROM (
           SELECT src AS v, c_ab FROM pc
           UNION ALL SELECT dst, c_ab FROM pc)
         GROUP BY v),
       scored AS (
         SELECT pc.src, pc.dst, pc.c_ab,
                CAST((CAST(pc.c_ab AS HUGEINT) * tot.t * 1000000)
                     // (CAST(da.c_v AS HUGEINT) * db.c_v) AS BIGINT)
                  AS lift_ppm
         FROM pc
         JOIN deg da ON da.v = pc.src
         JOIN deg db ON db.v = pc.dst
         CROSS JOIN tot
         WHERE pc.c_ab >= 2)
       SELECT src, dst, c_ab, lift_ppm FROM scored
       ORDER BY lift_ppm DESC, src, dst LIMIT 100""",
)
def graph_edge_lift(spark, sf_dir):
    """KG edge pruning by association strength (graph.edge_lift): parts
    co-ordered on every 3rd order, scored with integer-PMI lift_ppm =
    c_ab * T * 10^6 div (c_a * c_b) at min support 2, top-100 by (lift
    DESC, src, dst). Lift surfaces genuinely associated pairs where raw
    counts keep hub x hub noise; DECIMAL(38,0)/HUGEINT products so the
    triple product cannot overflow at scale."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 3 == 0)
    a, b = li.alias("a"), li.alias("b")
    pc = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return G.edge_lift(pc, top_k=100, min_support=2)


@query(
    "graph_coarsen_brands",
    """WITH e AS (
         SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
         FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         WHERE a.l_partkey < b.l_partkey AND a.l_orderkey % 3 = 0),
       le AS (
         SELECT least(pa.p_brand, pb.p_brand) AS label_a,
                greatest(pa.p_brand, pb.p_brand) AS label_b
         FROM e JOIN part pa ON pa.p_partkey = e.s
                JOIN part pb ON pb.p_partkey = e.t)
       SELECT label_a, label_b, CAST(count(*) AS BIGINT) AS n_edges
       FROM le WHERE label_a != label_b
       GROUP BY 1, 2""",
)
def graph_coarsen_brands(spark, sf_dir):
    """Graph summarization (graph.coarsen): the part co-order graph
    collapsed to the brand supergraph — (brand_a <= brand_b, n_edges)
    with intra-brand self-loops dropped — the entity-level rollup a KG
    exposes after canonicalization (here the label map is the part ->
    brand attribute; connected_components labels plug into the same
    signature). Two broadcastable label joins + one algebraic count."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 3 == 0)
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    labels = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("vertex"), F.col("p_brand").alias("label")
    )
    return G.coarsen(edges, labels)


# -------------------------------------------- modularity / vocab coverage --

@query(
    "graph_modularity",
    """WITH e AS (
         SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
         FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         WHERE a.l_partkey < b.l_partkey AND a.l_orderkey % 3 = 0),
       le AS (
         SELECT pa.p_brand AS ls, pb.p_brand AS ld
         FROM e JOIN part pa ON pa.p_partkey = e.s
                JOIN part pb ON pb.p_partkey = e.t),
       mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM le),
       deg AS (SELECT l, CAST(count(*) AS BIGINT) AS a_l
               FROM (SELECT ls AS l FROM le UNION ALL SELECT ld FROM le)
               GROUP BY l),
       intra AS (SELECT ls AS l, CAST(count(*) AS BIGINT) AS e_l
                 FROM le WHERE ls = ld GROUP BY 1),
       per AS (SELECT d.l, d.a_l, COALESCE(i.e_l, 0) AS e_l
               FROM deg d LEFT JOIN intra i USING (l)),
       agg AS (SELECT mm.m,
                      CAST(count(*) AS BIGINT) AS n_communities,
                      sum(4 * CAST(mm.m AS HUGEINT) * e_l
                          - CAST(a_l AS HUGEINT) * a_l) AS n
               FROM per CROSS JOIN mm GROUP BY mm.m)
       SELECT m AS m_edges, n_communities,
              CAST((n * 1000000
                    - ((((n * 1000000) % (4 * CAST(m AS HUGEINT) * m))
                        + (4 * CAST(m AS HUGEINT) * m))
                       % (4 * CAST(m AS HUGEINT) * m)))
                   // (4 * CAST(m AS HUGEINT) * m) AS BIGINT) AS q_ppm
       FROM agg""",
)
def graph_modularity(spark, sf_dir):
    """Labeling quality score (graph.modularity): Newman Q of the brand
    labeling over the parts-co-ordered graph, on the ppm grid via the
    single-floor rational form sum(4*m*e_l - a_l^2)*10^6 / (4m^2) with a
    sign-safe remainder-subtract floor (Q < 0 here: brands
    anti-correlate with co-ordering, which is itself the finding) —
    DECIMAL(38,0)/HUGEINT products, no windows, no iteration."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 3 == 0)
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    labels = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("vertex"), F.col("p_brand").alias("label")
    )
    return G.modularity(edges, labels)


@query(
    "graph_strongly_connected",
    """WITH RECURSIVE e AS (
         SELECT c_custkey AS src, c_custkey // 10 AS dst
         FROM customer WHERE c_custkey >= 10
         UNION
         SELECT c_custkey // 100, c_custkey
         FROM customer WHERE c_custkey >= 100 AND c_custkey % 7 = 3),
       r AS (
         SELECT src, dst FROM e
         UNION
         SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
       verts AS (
         SELECT DISTINCT v FROM (
           SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)),
       mut AS (
         SELECT a.src AS u, min(a.dst) AS mn
         FROM r a JOIN r b ON a.src = b.dst AND a.dst = b.src
         GROUP BY a.src)
       SELECT v.v AS vertex, CAST(COALESCE(m.mn, v.v) AS BIGINT) AS scc
       FROM verts v LEFT JOIN mut m ON m.u = v.v""",
)
def graph_strongly_connected(spark, sf_dir):
    """Strongly connected components (graph.strongly_connected) over the
    digit-shift customer forest with deterministic back edges: every
    custkey points at custkey DIV 10 (child -> parent), and for
    custkey % 7 = 3 the grandparent points BACK down (DIV 100 -> c),
    closing 3-cycles that MERGE wherever two cycles share a parent link
    — the cyclic same_as/subclass tangle a canonicalizer must collapse
    before any hierarchy rollup. The operator is Orzan-style coloring
    (forward min-label fixpoint -> roots -> backward confirmation ->
    peel; the closure is never materialized); the oracle is deliberately
    the opposite formulation — full recursive closure + mutual-pair min
    — so a missed merge, an unconfirmed straggler, or an over-eager
    color assignment all hash-mismatch. Tree-only vertices come out as
    singletons (scc = self), cycle members share the min id."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    fwd = c.where("c_custkey >= 10").select(
        F.col("c_custkey").alias("src"),
        F.expr("c_custkey DIV 10").alias("dst"),
    )
    back = c.where("c_custkey >= 100 AND c_custkey % 7 = 3").select(
        F.expr("c_custkey DIV 100").alias("src"),
        F.col("c_custkey").alias("dst"),
    )
    return G.strongly_connected(fwd.unionByName(back))



@query(
    "graph_mutual_knn",
    """WITH pc AS (
         SELECT a.l_partkey AS s, b.l_partkey AS t,
                CAST(count(*) AS BIGINT) AS w
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey
          AND a.l_quantity >= 25 AND b.l_quantity >= 25
         WHERE a.l_partkey < b.l_partkey
         GROUP BY 1, 2),
       sym AS (SELECT s AS a, t AS b, w FROM pc
               UNION ALL SELECT t, s, w FROM pc),
       tk AS (SELECT a, b, w,
                     CAST(row_number() OVER (PARTITION BY a
                          ORDER BY w DESC, b) AS BIGINT) AS rk
              FROM sym QUALIFY rk <= 5)
       SELECT t1.a AS u, t1.b AS v, t1.w AS weight,
              t1.rk AS rank_uv, t2.rk AS rank_vu
       FROM tk t1 JOIN tk t2 ON t2.a = t1.b AND t2.b = t1.a
       WHERE t1.a < t1.b""",
)
def graph_mutual_knn(spark, sf_dir):
    """Mutual-kNN sparsification (graph.mutual_knn_graph) of the
    weighted co-order graph (weight = shared high-quantity orders):
    an edge survives iff BOTH endpoints rank it in their top-5 — the
    densification guard run before clustering a similarity graph,
    because one hub part's weak edges otherwise glue every community
    into a blob (the same hub pathology the capped-wedge and salted-
    join operators defend against, attacked at the graph-construction
    step instead). Per-source top-k is a WindowGroupLimit-pre-pruned
    row_number (a 10^6-degree hub costs k rows, not its degree);
    mutuality is ONE self-equi-join of the two bounded top-k tables on
    the flipped key; output <= |V|*k/2 rows by construction. Both
    asymmetry directions carry mass at both scale factors (edges in
    u's top-5 but not v's, and vice versa, are the dropped majority)."""
    from ..operators.graph import mutual_knn_graph

    weighted = (
        _q25_edges(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    return mutual_knn_graph(weighted, k=5, weight_col="w")


@query("graph_temporal_reachability", _temporal_reach_oracle())
def graph_temporal_reachability(spark, sf_dir):
    """Time-respecting reachability (graph.temporal_reachability — Pan &
    Saramäki temporal BFS): on the customer-supplier contact network
    (high-quantity lineitems, both directions, dated by order), which
    vertices can information from each of three seed customers reach in
    <= 3 contacts with nondecreasing timestamps — the influence
    question static k-hop overstates, since A->B at noon cannot feed
    B->C at 9am. Earliest-arrival state is lossless (any continuation
    legal from a later arrival is legal from an earlier one), so state
    is one row per (seed, vertex): 76 rows at sf0.01 with real mass at
    every hop depth (3/40/30 at hops 1/2/3). Frontier BFS with in-join
    time predicate, algebraic min(struct) merge, per-round
    localCheckpoint."""
    from ..operators.graph import temporal_reachability

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).where("l_quantity >= 48")
    fwd = j.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        F.col("o_orderdate").alias("ts"),
    )
    edges = fwd.unionByName(
        j.select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    seeds = spark.createDataFrame([("c1",), ("c10",), ("c100",)], "vertex string")
    out = temporal_reachability(edges, seeds, max_hops=3)
    return out.withColumn(
        "arrive_ts", F.col("arrive_ts").cast("date").cast("string")
    )
