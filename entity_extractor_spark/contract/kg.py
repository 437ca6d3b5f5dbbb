"""KG construction/quality/training: driver + synthetic pipelines, linking, review repropagation, multimodal spans, rules/constraints, walks/negatives/verbalization.

Split out of the former monolithic contract.py (round-4, VERDICT ask #6);
query registration happens via the shared @query decorator into the
aggregating contract.Q / contract.SQL dicts in _shared.py.
"""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import Window  # noqa: F401

from ._shared import *  # noqa: F401,F403



@query(
    "multimodal_metadata",
    """SELECT CAST(doc_id AS VARCHAR) AS doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              sha256(text) AS sha256
       FROM documents""",
)
def multimodal_metadata(spark, sf_dir):
    """Binary-column plumbing: encode -> mapInPandas metadata extraction
    (decode itself is stubbed; byte length + sha256 are oracle-checked)."""
    d = _t(spark, sf_dir, "documents")
    binary = MM.attach_binary_payload(d, "doc_id", "text")
    return MM.extract_media_metadata(binary).select("doc_id", "n_bytes", "sha256")


@query("kg_mention_scan_driver", _KG_MENTION_SQL)
def kg_mention_scan_driver(spark, sf_dir):
    """S4/S5/F2 value-checked end-to-end: the driver documents table is
    span-ified into the input_hint shape and scanned by the REAL mention
    operator (operators/mentions.py detect_mentions); DuckDB replays the
    span synthesis + whitespace tokenization + case-insensitive substring
    gazetteer match in pure SQL. This pins the production scan (not a
    simplified stand-in) against an independent engine."""
    from ..operators.mentions import detect_mentions

    docs = spanify_driver_documents(_t(spark, sf_dir, "documents"))
    return detect_mentions(docs, _DRIVER_GAZ)


@query("kg_triples_driver", _KG_TRIPLES_SQL)
def kg_triples_driver(spark, sf_dir):
    """Flagship end-to-end, VALUE-CHECKED: the real pipeline (mentions ->
    extract -> link -> canonicalize -> propagate -> materialize,
    plans/pipeline.py) runs over the span-ified driver documents table; the
    DuckDB oracle independently replays extraction, the name<->CAS
    connected components (recursive-CTE closure), canonical-name selection
    (first observation in replay order) and edge weights, and must produce
    the identical (subj, pred, obj, weight_percent) multiset. The general
    lattice fold is pinned separately (tests/test_lattice.py, e2e oracle);
    on this corpus its closed form is what the SQL encodes."""
    import tempfile

    from ..plans.pipeline import run_pipeline

    docs = spanify_driver_documents(_t(spark, sf_dir, "documents"))
    out = tempfile.mkdtemp(prefix="kg_driver_")
    tables = run_pipeline(spark, docs, out)
    return tables["triples"].select("subj", "pred", "obj", "weight_percent")


@query("kg_nodes_driver", _KG_NODES_SQL)
def kg_nodes_driver(spark, sf_dir):
    """Node materialization + status propagation VALUE-CHECKED: the real
    pipeline's nodes table (chemical lattice fold -> A3/A4 material
    resolution) over the span-ified driver corpus vs a DuckDB replay. On
    this corpus the fold's closed form is: alpha clusters (src NONE, tag
    PFAS) resolve to (YES, NONE); beta clusters (src OECD, tag NO_PFAS) to
    (NO, OECD); every material has one YES child => (YES) with no
    preferred-source hit => NONE. canonical name = first observation,
    cas = last observation (unconditional overwrite), both in replay
    order. The general lattice is pinned by tests/test_lattice.py."""
    import tempfile

    from ..plans.pipeline import run_pipeline

    docs = spanify_driver_documents(_t(spark, sf_dir, "documents"))
    out = tempfile.mkdtemp(prefix="kg_nodes_driver_")
    tables = run_pipeline(spark, docs, out)
    return tables["nodes"].select(
        "name", "node_type", "cas_number", "pfas_status", "pfas_information_source"
    )


@query("kg_triples_synthetic", _synth_triples_sql(80))
def kg_triples_synthetic(spark, sf_dir):
    """Flagship KG pipeline on the deterministic synthetic corpus,
    VALUE-CHECKED: DuckDB replays the sequential reference ingest in the
    closed-form SQL above over a byte-identical pyarrow copy of the corpus.
    The pure-Python oracle (tests) pins the general semantics."""
    import tempfile

    from ..corpus import CorpusConfig, generate_documents_df
    from ..plans.pipeline import run_pipeline

    ensure_synth_tables()
    cfg = CorpusConfig(n_docs=80)
    docs = generate_documents_df(spark, cfg)
    out = tempfile.mkdtemp(prefix="kg_contract_")
    tables = run_pipeline(spark, docs, out)
    return tables["triples"].select("subj", "pred", "obj", "weight_percent")


@query("kg_mentions_synthetic", _synth_mentions_sql(60))
def kg_mentions_synthetic(spark, sf_dir):
    """Gazetteer mention scan on the synthetic corpus, VALUE-CHECKED vs a
    DuckDB replay (tokenize -> case-insensitive substring join) over the
    materialized corpus + gazetteer parquet."""
    from ..corpus import CorpusConfig, gazetteer_rows, generate_documents_df
    from ..operators.mentions import detect_mentions

    ensure_synth_tables()
    cfg = CorpusConfig(n_docs=60)
    docs = generate_documents_df(spark, cfg)
    return detect_mentions(docs, gazetteer_rows(cfg)).select(
        "doc_id", "span_offset", "keyword", "word", "confidence", "mtype"
    )



@query(
    "link_cosine_disambiguation",
    f"""WITH q AS (
          SELECT id, tok FROM (
            SELECT doc_id AS id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents) WHERE tok != ''
        ),
        qv AS (SELECT id, {_TFIDF_BUCKET_SQL} AS bucket, CAST(count(*) AS DOUBLE) AS tf
               FROM q GROUP BY 1, 2),
        c AS (
          SELECT id, tok FROM (
            SELECT p_partkey AS id, unnest(string_split_regex(lower(p_name), '\\s+')) AS tok
            FROM part WHERE p_partkey < 100) WHERE tok != ''
        ),
        cv AS (SELECT id, {_TFIDF_BUCKET_SQL} AS bucket, CAST(count(*) AS DOUBLE) AS tf
               FROM c GROUP BY 1, 2),
        qn AS (SELECT id, sqrt(sum(tf * tf)) AS qnorm FROM qv GROUP BY 1),
        cn AS (SELECT id, sqrt(sum(tf * tf)) AS cnorm FROM cv GROUP BY 1),
        dots AS (SELECT qv.id AS qid, cv.id AS cid, sum(qv.tf * cv.tf) AS dot
                 FROM qv JOIN cv USING (bucket) GROUP BY 1, 2),
        scores AS (SELECT qid, cid, dot / (qnorm * cnorm) AS cos
                   FROM dots JOIN qn ON qid = qn.id JOIN cn ON cid = cn.id
                   WHERE dot / (qnorm * cnorm) > 0.0),
        ranked AS (SELECT qid, cid, cos,
                          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
                   FROM scores)
        SELECT qid, cid AS best_candidate, ROUND(cos, 6) AS score FROM ranked WHERE rn = 1""",
)
def link_cosine_disambiguation(spark, sf_dir):
    """s4b — hashed-TF cosine disambiguation: every document scored against
    a candidate dictionary, top-1 above the floor (north-star 'TF-IDF
    cosine disambiguation'; reference analog utils/llm_invoker.py:106-120).
    The oracle SQL replays the identical md5-bucket formula."""
    from ..operators.disambiguate import best_candidate

    docs = _t(spark, sf_dir, "documents")
    cands = _t(spark, sf_dir, "part").where("p_partkey < 100")
    return best_candidate(docs, cands, "doc_id", "text", "p_partkey", "p_name")


@query("review_repropagate", _review_sql())
def review_repropagate(spark, sf_dir):
    """T-review — the save_msds review/update entry point
    (artifact_ingestor_service.py:559-607): reviewed analyses (synthesized
    deterministically from orders/lineitem/part) merge into chemical nodes
    via the F12 lattice, shared-child materials re-resolve, reviewed
    materials take the resolve over their review's own chemical list. The
    DuckDB oracle replays the whole path — recursive-CTE sequential fold
    included — from the same lattice constants."""
    from ..operators.review import apply_review

    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    chems = part.select(
        F.concat(F.lit("c"), F.col("p_partkey").cast("string")).alias("id"),
        F.col("p_name").alias("name"),
        F.lit("CHEMICAL").alias("node_type"),
        F.element_at(
            F.array(F.lit("YES"), F.lit("NO"), F.lit("PENDING")),
            (F.col("p_partkey") % 3 + 1).cast("int"),
        ).alias("pfas_status"),
        F.element_at(
            F.array(F.lit("MANUAL"), F.lit("OECD"), F.lit("NONE"), F.lit("OPENAI"), F.lit("VAI")),
            (F.col("p_partkey") % 5 + 1).cast("int"),
        ).alias("pfas_information_source"),
    )
    mats = orders.select(
        F.concat(F.lit("m"), F.col("o_orderkey").cast("string")).alias("id"),
        F.concat(F.lit("Mat "), F.col("o_orderkey").cast("string")).alias("name"),
        F.lit("MATERIAL").alias("node_type"),
        F.lit("PENDING").alias("pfas_status"),
        F.lit("NONE").alias("pfas_information_source"),
    )
    nodes = mats.unionByName(chems)
    edges = li.select(
        F.concat(F.lit("m"), F.col("l_orderkey").cast("string")).alias("material_id"),
        F.concat(F.lit("c"), F.col("l_partkey").cast("string")).alias("chem_id"),
    ).distinct()
    reviews = orders.where(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").cast("long").alias("review_seq"),
        F.concat(F.lit("m"), F.col("o_orderkey").cast("string")).alias("material_id"),
    )
    review_chems = (
        li.where(F.col("l_orderkey") % 7 == 0)
        .join(F.broadcast(part.select("p_partkey", "p_name")), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_orderkey").cast("long").alias("review_seq"),
            F.col("l_linenumber").cast("long").alias("chem_seq"),
            F.col("p_name").alias("chemical_name"),
            F.element_at(
                F.array(F.lit("PFAS"), F.lit("NO_PFAS"), F.lit("OTHER")),
                (F.col("l_linenumber") % 3 + 1).cast("int"),
            ).alias("tag"),
            F.element_at(
                F.array(F.lit("OPENAI"), F.lit("MANUAL"), F.lit("OECD"), F.lit("NONE")),
                (F.col("l_partkey") % 4 + 1).cast("int"),
            ).alias("source"),
        )
    )
    return apply_review(nodes, edges, reviews, review_chems).select(
        "id", "pfas_status", "pfas_information_source"
    )


@query(
    "kg_negative_sample",
    """WITH pos AS (SELECT DISTINCT l_partkey AS src, 'supplied_by' AS rel,
                           l_suppkey AS dst
                    FROM lineitem WHERE l_quantity >= 40),
       ents AS (SELECT DISTINCT s_suppkey AS ent FROM supplier),
       idx AS (SELECT ent, row_number() OVER (ORDER BY
                 CAST(concat('0x', substring(md5(concat(CAST(ent AS VARCHAR), '|', 'neg0')), 1, 12)) AS BIGINT),
                 ent) - 1 AS i
               FROM ents),
       drawn AS (SELECT src, rel, dst, j AS trial,
                 CAST(concat('0x', substring(md5(concat(
                   CAST(src AS VARCHAR), '|', rel, '|', CAST(dst AS VARCHAR),
                   '|', CAST(j AS VARCHAR), '|', 'neg0')), 1, 12)) AS BIGINT)
                 % (SELECT count(*) FROM ents) AS i
                 FROM pos CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS j)),
       neg AS (SELECT d.src, d.rel, x.ent AS dst, CAST(d.trial AS BIGINT) AS trial
               FROM drawn d JOIN idx x USING (i))
       SELECT neg.src, neg.rel, neg.dst, neg.trial
       FROM neg LEFT JOIN pos p
         ON p.src = neg.src AND p.rel = neg.rel AND p.dst = neg.dst
       WHERE p.src IS NULL""",
)
def kg_negative_sample(spark, sf_dir):
    """Filtered tail-corruption negatives (kg_training.negative_sample):
    2 corrupted tails per (part)-[supplied_by]->(supplier) positive, drawn
    by pure content hash over a deterministic entity permutation, with
    draws that hit TRUE triples dropped — the standard filtered setting of
    KG-embedding training (TransE). The graph is built and stored by the
    reference (global_edge_repository.py) but never exported as model
    food; this is that export at equi-join cost: map-side explode, one
    index join, one anti-join. Both engines replay the permutation and
    the draws bit-for-bit on the md5 grid."""
    from ..operators.kg_training import negative_sample

    li = _t(spark, sf_dir, "lineitem").where("l_quantity >= 40")
    triples = li.select(
        F.col("l_partkey").alias("src"),
        F.lit("supplied_by").alias("rel"),
        F.col("l_suppkey").alias("dst"),
    )
    ents = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("entity"))
    return negative_sample(triples, ents, 2, salt="neg0")


@query(
    "kg_random_walks",
    f"""WITH {_Q25_PAIRS_CTE},
       c0 AS (SELECT p_partkey AS start, p_partkey AS cur FROM part
              WHERE p_partkey % 10 = 0),
       n1 AS (SELECT start, dst AS cur FROM (
                SELECT c0.start, und.dst,
                       row_number() OVER (PARTITION BY c0.start ORDER BY
                         {_WALK_STEP_HASH.format(step=1)}, und.dst) AS rn
                FROM c0 JOIN und ON und.src = c0.cur) WHERE rn = 1),
       n2 AS (SELECT start, dst AS cur FROM (
                SELECT n1.start, und.dst,
                       row_number() OVER (PARTITION BY n1.start ORDER BY
                         {_WALK_STEP_HASH.format(step=2)}, und.dst) AS rn
                FROM n1 JOIN und ON und.src = n1.cur) WHERE rn = 1),
       n3 AS (SELECT start, dst AS cur FROM (
                SELECT n2.start, und.dst,
                       row_number() OVER (PARTITION BY n2.start ORDER BY
                         {_WALK_STEP_HASH.format(step=3)}, und.dst) AS rn
                FROM n2 JOIN und ON und.src = n2.cur) WHERE rn = 1)
       SELECT start, CAST(0 AS BIGINT) AS step, cur AS vertex FROM c0
       UNION ALL SELECT start, CAST(1 AS BIGINT), cur FROM n1
       UNION ALL SELECT start, CAST(2 AS BIGINT), cur FROM n2
       UNION ALL SELECT start, CAST(3 AS BIGINT), cur FROM n3""",
)
def kg_random_walks(spark, sf_dir):
    """DeepWalk-style corpus export (kg_training.random_walks): one
    deterministic 3-hop walk from every tenth part over the high-quantity
    co-order graph; the next hop from v at step t is the neighbor
    minimizing (hash48(v|t|neighbor|salt), neighbor), so the walk corpus
    is partition/retry-invariant and the oracle unrolls the three steps
    with row_number() = 1 per start. Per round: one frontier equi-join +
    one algebraic min(struct) — never per-walk Python. Multiple walks per
    vertex = multiple salts (like epochs)."""
    from ..operators.kg_training import random_walks

    starts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 10 == 0)
        .select(F.col("p_partkey").alias("vertex"))
    )
    return random_walks(_q25_edges(spark, sf_dir), starts, 3, salt="w0")


@query(
    "kg_neighborhood_features",
    f"""WITH {_Q25_PAIRS_CTE}
       SELECT und.src AS vertex, CAST(count(*) AS BIGINT) AS degree,
              CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS f_sum,
              min(p.p_retailprice) AS f_min, max(p.p_retailprice) AS f_max
       FROM und JOIN part p ON p.p_partkey = und.dst
       GROUP BY und.src""",
)
def kg_neighborhood_features(spark, sf_dir):
    """GNN feature export (kg_training.neighborhood_features): per part,
    the degree and sum/min/max of neighbor retail prices over the
    high-quantity co-order graph — the 1-hop message-passing aggregation
    (GraphSAGE-style) materialized for EVERY node in one join + one
    algebraic agg, where the reference serves neighborhoods one node at a
    time (global_edge_repository.py). Float sums run in DECIMAL(18,2)
    per repo doctrine (raw double sums are addition-order-dependent and
    can never hash-match cross-engine)."""
    from ..operators.kg_training import neighborhood_features

    attrs = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    return neighborhood_features(
        _q25_edges(spark, sf_dir), attrs, "p_partkey", "p_retailprice"
    )


@query(
    "kg_sampled_adjacency",
    """WITH raw AS (
         SELECT DISTINCT concat('p', CAST(l_partkey AS VARCHAR)) AS src,
                concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
         FROM lineitem WHERE l_orderkey % 97 = 1),
       und AS (
         SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM raw
           UNION ALL SELECT dst, src FROM raw)
         WHERE src != dst),
       r AS (
         SELECT src, dst,
                row_number() OVER (PARTITION BY src
                  ORDER BY CAST(concat('0x', substring(md5(concat(src, '|',
                           dst)), 1, 12)) AS BIGINT), dst) AS rn
         FROM und)
       SELECT src AS vertex, CAST(count(*) AS BIGINT) AS degree,
              CAST(sum(CASE WHEN rn <= 4 THEN 1 ELSE 0 END) AS BIGINT)
                AS k_sampled,
              string_agg(CASE WHEN rn <= 4 THEN dst END, ','
                         ORDER BY dst) AS neighbors_csv
       FROM r GROUP BY src""",
)
def kg_sampled_adjacency(spark, sf_dir):
    """GraphSAGE fan-out export (kg_training.sampled_adjacency): every
    vertex of the part<->supplier graph with at most 4 neighbors, chosen
    by smallest hash48(vertex, neighbor) — deterministic neighbor
    sampling, so hubs cost what leaves cost and re-exports are stable.
    Neighborhoods render as sorted CSV strings (engine-hashable where
    array cells are not). One per-vertex window that WindowGroupLimit
    would cap... here kept unfiltered through the SAME window so degree
    and the sample come from one pass — then one algebraic agg."""
    from ..operators.kg_training import sampled_adjacency

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 97 == 1)
    edges = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return sampled_adjacency(edges, fanout=4)


@query(
    "kg_constraint_audit",
    f"""WITH {_ORDER_KG_DIRTY_SQL},
       fd AS (SELECT subj, pred FROM t WHERE pred = 'placedBy'
              GROUP BY subj, pred HAVING count(DISTINCT obj) > 1)
       SELECT subj, pred, obj, 'unknown_pred' AS rule FROM t
       WHERE pred NOT IN ('containsPart', 'placedBy')
       UNION ALL
       SELECT subj, pred, obj, 'subj_format' FROM t
       WHERE NOT regexp_matches(subj, '^O[0-9]+$')
       UNION ALL
       SELECT subj, pred, obj, 'weight_missing' FROM t
       WHERE pred = 'containsPart' AND weight_percent IS NULL
       UNION ALL
       SELECT subj, pred, obj, 'weight_range' FROM t
       WHERE pred = 'containsPart' AND weight_percent IS NOT NULL
         AND (TRY_CAST(weight_percent AS DECIMAL(18,6)) IS NULL
              OR TRY_CAST(weight_percent AS DECIMAL(18,6)) < 0
              OR TRY_CAST(weight_percent AS DECIMAL(18,6)) > 100)
       UNION ALL
       SELECT subj, pred, obj, 'weight_forbidden' FROM t
       WHERE pred = 'placedBy' AND weight_percent IS NOT NULL
       UNION ALL
       SELECT t.subj, t.pred, t.obj, 'functional_dup'
       FROM t JOIN fd ON fd.subj = t.subj AND fd.pred = t.pred""",
)
def kg_constraint_audit(spark, sf_dir):
    """Ontology/constraint audit (kg_quality.validate_triples) over an
    order-KG triple table with six deterministic dirt slices — typo'd
    predicate, 10x out-of-range weight, missing weight, double-valued
    functional predicate, forbidden weight, malformed subject — the
    post-ingest gate every CDC-fed KG needs (the reference trusts its
    extractor and upserts unchecked). Every rule is a codegen'd column
    predicate fused over one scan except functional_dup: one
    (subj, pred) distinct-count agg joined back to offenders only.
    Each rule's branch carries mass at both scale factors (~1% slices);
    the %89 slice splits between legal (qty <= 10) and violating rows so
    the range boundary itself is value-checked."""
    from ..operators.kg_quality import validate_triples

    return validate_triples(
        _order_kg_triples(spark, sf_dir, dirty=True),
        allowed_preds=["containsPart", "placedBy"],
        weight_preds=["containsPart"],
        functional_preds=["placedBy"],
        subj_pattern=r"^O[0-9]+$",
    )


@query(
    "kg_verbalize_triples",
    """WITH c AS (SELECT 'O' || CAST(l_orderkey AS VARCHAR) AS subj,
                 CAST(l_partkey AS VARCHAR) AS obj,
                 CAST(l_quantity AS VARCHAR) AS w FROM lineitem),
       g AS (SELECT 'O' || CAST(o_orderkey AS VARCHAR) AS subj,
                    min(CAST(o_custkey AS VARCHAR)) AS gobj
             FROM orders GROUP BY 1),
       items AS (SELECT subj, CAST(count(*) AS BIGINT) AS n_facts,
                        string_agg('part ' || obj || ' (' || w || '%)', ', '
                          ORDER BY CAST(obj AS BIGINT),
                                   'part ' || obj || ' (' || w || '%)') AS lst
                 FROM c GROUP BY subj)
       SELECT g.subj,
              'Order ' || g.subj || ' was placed by customer ' || g.gobj
                || '. Contains ' || i.lst || '.' AS text,
              i.n_facts
       FROM g JOIN items i USING (subj)""",
)
def kg_verbalize_triples(spark, sf_dir):
    """KG->training-text export (kg_quality.verbalize_triples): one
    deterministic sentence per order from the clean order-KG — items
    sorted by numeric object id then rendered phrase, so the string is a
    pure function of the graph (sorted-CSV doctrine; unordered
    collect_list would never hash cross-engine). This is the
    verbalization step of a KG-augmented pretraining corpus; two
    algebraic per-subject aggregations + one join, string assembly
    codegen'd."""
    from ..operators.kg_quality import verbalize_triples

    return verbalize_triples(
        _order_kg_triples(spark, sf_dir, dirty=False),
        "placedBy",
        "containsPart",
        frame=("Order ", " was placed by customer ", ". Contains "),
        item_template=("part ", " (", "%)"),
    )


@query(
    "kg_match_path",
    """SELECT CAST(o.o_custkey AS VARCHAR) AS v0,
              'O' || CAST(o.o_orderkey AS VARCHAR) AS v1,
              CAST(l.l_partkey AS VARCHAR) AS v2
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey""",
)
def kg_match_path(spark, sf_dir):
    """Graph-pattern path query (kg_quality.match_path): bindings for
    customer <-placedBy- order -containsPart-> part over the clean
    order-KG — the SPARQL-BGP/Cypher-chain primitive, executed as one
    pred-filtered hash equi-join per step (filters pushed into the
    triple scan, shared-variable joins, no cartesian). The oracle is the
    DIRECT relational join over orders x lineitem — a completely
    different formulation, so a step that walks the wrong direction or
    drops/duplicates bindings hash-mismatches. Cycle exclusion
    (distinct_nodes) is unit-gated on a cyclic toy graph."""
    from ..operators.kg_quality import match_path

    return match_path(
        _order_kg_triples(spark, sf_dir, dirty=False),
        [("placedBy", "rev"), ("containsPart", "fwd")],
    )


@query(
    "kg_contrastive_pairs",
    """WITH lr AS (SELECT DISTINCT l_partkey AS l, l_orderkey AS r
                  FROM lineitem
                  WHERE l_quantity >= 25 AND l_partkey IS NOT NULL
                    AND l_orderkey IS NOT NULL),
       e0 AS (SELECT a.l AS l1, b.l AS l2, CAST(count(*) AS BIGINT) AS weight
              FROM lr a JOIN lr b ON a.r = b.r AND a.l < b.l GROUP BY 1, 2),
       sym AS (SELECT l1 AS src, l2 AS dst FROM e0
               UNION ALL SELECT l2, l1 FROM e0),
       ents AS (SELECT DISTINCT p_partkey AS ent FROM part),
       idx AS (SELECT ent, row_number() OVER (ORDER BY
                 CAST(concat('0x', substring(md5(concat(CAST(ent AS VARCHAR),
                   '|', 'ctr0')), 1, 12)) AS BIGINT), ent) - 1 AS i
               FROM ents),
       drawn AS (SELECT src, dst,
                 CAST(concat('0x', substring(md5(concat(
                   CAST(src AS VARCHAR), '|', 'cooccurs', '|',
                   CAST(dst AS VARCHAR), '|', '0', '|', 'ctr0')), 1, 12))
                   AS BIGINT) % (SELECT count(*) FROM ents) AS i
                 FROM sym),
       neg AS (SELECT d.src, x.ent AS dst FROM drawn d JOIN idx x USING (i)),
       negf AS (SELECT neg.src, neg.dst FROM neg
                LEFT JOIN sym p ON p.src = neg.src AND p.dst = neg.dst
                WHERE p.src IS NULL)
       SELECT l1 AS a, l2 AS b, CAST(1 AS BIGINT) AS label, weight FROM e0
       UNION ALL
       SELECT src, dst, 0, 0 FROM negf""",
)
def kg_contrastive_pairs(spark, sf_dir):
    """Contrastive-pair export for entity-embedding training: positives =
    weighted co-occurrence edges (graph.bipartite_project over the q25
    part<->order relation), negatives = one filtered hash-corruption per
    orientation (kg_training.negative_sample over the SYMMETRIZED edge
    set, so a corruption colliding with a co-occurrence in EITHER
    direction is dropped — the undirected form of the TransE filtered
    setting). The (anchor, other, label, weight) table is what a
    two-tower/skip-gram trainer consumes; both the projection and the
    draws replay bit-for-bit on the md5 grid. Composition of two
    value-checked operators; the filter branch carries mass both ways
    on this sparse graph (most draws survive, co-occurring draws die).
    """
    from ..operators.kg_training import negative_sample

    li = _t(spark, sf_dir, "lineitem").where("l_quantity >= 25")
    pos = G.bipartite_project(
        li, "l_partkey", "l_orderkey", max_right_degree=None, min_weight=1
    )
    sym = pos.select("l1", "l2").union(
        pos.select(F.col("l2").alias("l1"), F.col("l1").alias("l2"))
    )
    triples = sym.select(
        F.col("l1").alias("src"), F.lit("cooccurs").alias("rel"),
        F.col("l2").alias("dst"),
    )
    ents = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("entity"))
    neg = negative_sample(triples, ents, 1, salt="ctr0")
    return pos.select(
        F.col("l1").alias("a"), F.col("l2").alias("b"),
        F.lit(1).cast("long").alias("label"), F.col("weight"),
    ).unionAll(
        neg.select(
            F.col("src").alias("a"), F.col("dst").alias("b"),
            F.lit(0).cast("long").alias("label"),
            F.lit(0).cast("long").alias("weight"),
        )
    )


# ------------------------------------------------------------- fuzzy link --

@query(
    "link_fuzzy_names",
    """WITH probe AS (
         SELECT p_partkey AS probe_id,
                substring(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
                || substring(p_name, CAST(p_partkey % length(p_name) AS INT) + 2)
                  AS q
         FROM part WHERE p_partkey % 20 = 0),
       probe3 AS (
         SELECT probe_id, q, length(q) + off AS tlen
         FROM probe, (VALUES (-1), (0), (1)) v(off)),
       cand AS (
         SELECT p.probe_id, g.p_partkey AS gaz_id,
                levenshtein(p.q, g.p_name) AS d
         FROM probe3 p JOIN part g ON length(g.p_name) = p.tlen
         WHERE levenshtein(p.q, g.p_name) <= 1)
       SELECT probe_id, gaz_id AS p_partkey, CAST(d AS BIGINT) AS dist
       FROM (SELECT probe_id, gaz_id, d,
                    row_number() OVER (PARTITION BY probe_id
                                       ORDER BY d, gaz_id) AS rn
             FROM cand)
       WHERE rn = 1""",
)
def link_fuzzy_names(spark, sf_dir):
    """Typo-tolerant entity linking (fuzzy.fuzzy_link_best): part names
    corrupted by one deterministic character deletion (at position
    p_partkey % length, every 20th part) are linked back to the clean
    part gazetteer at edit distance <= 1 via the SymSpell
    deletion-neighborhood join — the exact-complete, linear-index
    replacement for the reference's per-probe substring table scan
    (global_node_repository.py:180). The DuckDB oracle is the brute
    formulation on purpose: every probe x every length-compatible
    gazetteer name through levenshtein(), argmin by (dist, key) — a
    blocked join that dropped a true candidate or scored a pair twice
    hash-mismatches."""
    from ..operators.fuzzy import fuzzy_link_best

    part = _t(spark, sf_dir, "part")
    probe = part.where(F.col("p_partkey") % 20 == 0).select(
        F.col("p_partkey").alias("probe_id"),
        F.expr(
            "concat(substring(p_name, 1, CAST(p_partkey % length(p_name) AS INT)),"
            " substring(p_name, CAST(p_partkey % length(p_name) AS INT) + 2))"
        ).alias("q"),
    )
    gaz = part.select("p_partkey", "p_name")
    return fuzzy_link_best(probe, gaz, "probe_id", "q", "p_partkey", "p_name")


# ------------------------------------------ provenance / fusion / summarize --

@query(
    "kg_triple_evidence",
    """SELECT 'O' || CAST(l_orderkey AS VARCHAR) AS subj,
              'containsPart' AS pred,
              CAST(l_partkey AS VARCHAR) AS obj,
              CAST(count(*) AS BIGINT) AS support,
              CAST(count(DISTINCT 'S' || CAST(l_suppkey AS VARCHAR)) AS BIGINT)
                AS n_sources,
              min(CAST(CAST(l_shipdate AS DATE) AS VARCHAR)) AS first_seen,
              max(CAST(CAST(l_shipdate AS DATE) AS VARCHAR)) AS last_seen,
              CAST(count(*) * 1000000 // (count(*) + 2) AS BIGINT)
                AS confidence_ppm
       FROM lineitem WHERE l_orderkey % 5 = 0
       GROUP BY 1, 2, 3""",
)
def kg_triple_evidence(spark, sf_dir):
    """Provenance-scored facts (kg_quality.triple_evidence): observation-
    level containsPart triples (one per lineitem row, source = supplier,
    ts = ship date) roll up to evidence rows with support, distinct
    sources, first/last seen, and the saturating integer confidence —
    the signal the reference's overwrite-on-reingest edge upsert throws
    away. One grouped aggregation; all members algebraic except the
    exact distinct-source count."""
    from ..operators.kg_quality import triple_evidence

    obs = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 5 == 0)
        .select(
            F.concat(F.lit("O"), F.col("l_orderkey").cast("string")).alias("subj"),
            F.lit("containsPart").alias("pred"),
            F.col("l_partkey").cast("string").alias("obj"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("source"),
            F.col("l_shipdate").cast("date").alias("ts"),
        )
    )
    return triple_evidence(obs, k=2)


# ----------------------------------------------------------- hard negatives --

@query(
    "kg_hard_negatives",
    """WITH planes AS MATERIALIZED (
         SELECT b, j, d,
                CASE WHEN strpos('0123456789abcdef',
                            substr(md5(CASE WHEN b = 0 THEN j || ':' || d
                                            ELSE 'b' || b || ':' || j || ':' || d END), 1, 1)) - 1 < 8
                     THEN -1.0 ELSE 1.0 END AS sgn
         FROM (SELECT unnest(generate_series(0, 1)) AS b)
         CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS j)
         CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d)),
       vecs AS MATERIALIZED (
         SELECT vec_id, label, d, CAST(embedding[d + 1] AS DOUBLE) AS v
         FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d)),
       bits AS (
         SELECT vec_id, b, j,
                CASE WHEN ROUND(sum(v * sgn), 5) > 0 THEN '1' ELSE '0' END AS bit
         FROM vecs JOIN planes USING (d) GROUP BY vec_id, b, j),
       sigs AS MATERIALIZED (
         SELECT vec_id, b, string_agg(bit, '' ORDER BY j) AS bkt
         FROM bits GROUP BY vec_id, b),
       lab AS (SELECT vec_id, label FROM embeddings),
       cand AS MATERIALIZED (
         SELECT DISTINCT s1.vec_id AS anchor, s2.vec_id AS negative
         FROM sigs s1 JOIN sigs s2 ON s1.b = s2.b AND s1.bkt = s2.bkt
         JOIN lab l1 ON l1.vec_id = s1.vec_id
         JOIN lab l2 ON l2.vec_id = s2.vec_id
         WHERE s1.vec_id != s2.vec_id AND l1.label != l2.label),
       m AS (SELECT max(abs(v)) AS ma FROM vecs),
       codes AS MATERIALIZED (
         SELECT vec_id, d,
                CAST(FLOOR(v * 127.0 / (SELECT ma FROM m) + 0.5) AS BIGINT) AS q
         FROM vecs),
       s AS (
         SELECT c.anchor, c.negative, CAST(sum(ca.q * cc.q) AS BIGINT) AS qscore
         FROM cand c
         JOIN codes ca ON ca.vec_id = c.anchor
         JOIN codes cc ON cc.vec_id = c.negative AND cc.d = ca.d
         GROUP BY 1, 2)
       SELECT anchor, negative, qscore, CAST(rnk AS BIGINT) AS rank
       FROM (SELECT anchor, negative, qscore,
                    row_number() OVER (PARTITION BY anchor
                                       ORDER BY qscore DESC, negative) AS rnk
             FROM s)
       WHERE rnk <= 3""",
)
def kg_hard_negatives(spark, sf_dir):
    """ANN-mined hard negatives (kg_training.hard_negatives): per anchor
    vector, the top-3 most-similar DIFFERENT-label vectors from two
    independent 6-bit hyperplane-LSH bucket self-joins, ranked by the
    exact int8 integer dot — the DPR/ANCE-style mining step that upgrades
    kg_contrastive_pairs' random corruptions with boundary-carrying
    negatives. Never an all-pairs join: candidates are hash equi-joins on
    (band, bucket); quantize-first doctrine makes every ranking
    comparison order-free integer arithmetic, replayed bit-for-bit by
    the oracle (md5 planes, ROUND(proj,5) sign, floor-half-up codes)."""
    from ..operators.kg_training import hard_negatives

    return hard_negatives(
        _t(spark, sf_dir, "embeddings"), dims=64, bits=6, bands=2, k=3
    )


@query(
    "link_prior",
    """WITH obs AS (
         SELECT string_split(lower(p_name), ' ')[1] AS mention,
                p_brand AS entity
         FROM part),
       pairs AS (
         SELECT mention, entity, CAST(count(*) AS BIGINT) AS cnt
         FROM obs GROUP BY mention, entity)
       SELECT mention, entity, cnt,
              CAST(sum(cnt) OVER (PARTITION BY mention) AS BIGINT)
                AS mention_total,
              CAST(cnt * 1000000
                   // sum(cnt) OVER (PARTITION BY mention) AS BIGINT)
                AS prior_ppm,
              CAST(row_number() OVER (PARTITION BY mention
                                      ORDER BY cnt DESC, entity) AS BIGINT)
                AS rank
       FROM pairs""",
)
def link_prior(spark, sf_dir):
    """Commonness prior P(entity | mention) (disambiguate.link_prior,
    Milne-Witten shape): each part's leading name word is an ambiguous
    surface form observed against its manufacturer — ~90 mentions x up to 25
    candidate brands each, so every mention carries a real multi-
    candidate distribution and the deterministic (cnt DESC, entity ASC)
    rank-1 is a meaningful argmax. The prior is the measured-popularity
    head of the linking cascade's no-key-matched path and the rank-1
    share is the route-to-context-model signal. One pair-keyed count +
    one mention-partitioned window over the collapsed pair table."""
    from ..operators.disambiguate import link_prior as _lp

    obs = _t(spark, sf_dir, "part").select(
        F.split(F.lower(F.col("p_name")), " ").getItem(0).alias("mention"),
        F.col("p_brand").alias("entity"),
    )
    return _lp(obs, "mention", "entity")


@query(
    "kg_mention_contexts",
    r"""WITH tk AS (
         SELECT doc_id,
                string_split_regex(trim(lower(text)), '\s+') AS toks
         FROM documents
         WHERE doc_id % 4 = 0 AND trim(lower(text)) <> ''),
       pos AS (
         SELECT doc_id, toks, i - 1 AS pos, toks[i] AS keyword
         FROM tk, unnest(generate_series(1, len(toks))) AS u(i)),
       hit AS (
         SELECT * FROM pos WHERE keyword IN ('join', 'customer', 'filter'))
       SELECT doc_id, CAST(pos AS BIGINT) AS pos, keyword,
              COALESCE(array_to_string(toks[greatest(pos - 3, 1) : pos],
                                       ' '), '') AS left_ctx,
              COALESCE(array_to_string(toks[pos + 2 : pos + 5], ' '), '')
                AS right_ctx
       FROM hit""",
)
def kg_mention_contexts(spark, sf_dir):
    """NER/EL training-sample export (kg_training.mention_contexts): a
    4-token window either side of every occurrence of three gazetteer
    words over a quarter of the corpus — one row per occurrence, window
    truncated at document edges (both truncation branches carry mass:
    hits in the first/last 4 tokens are common). Pure narrow map —
    tokenize, posexplode, broadcast-literal filter, two codegen'd array
    slices; zero shuffles at any corpus size. The oracle replays the
    identical slicing with DuckDB 1-based inclusive list bounds (its pos
    is 0-based like Spark's posexplode: left = toks[pos-3 : pos] covers
    the 4 tokens before the 1-based position pos+1, right =
    toks[pos+2 : pos+5] the 4 after)."""
    from ..operators.kg_training import mention_contexts

    d = _t(spark, sf_dir, "documents").where("doc_id % 4 = 0")
    return mention_contexts(
        d, "doc_id", "text", ["join", "customer", "filter"], k=4
    )


@query(
    "kg_entity_summary",
    """WITH t AS (SELECT 'O' || CAST(l_orderkey AS VARCHAR) AS subj,
                 'containsPart' AS pred,
                 CAST(l_partkey AS VARCHAR) AS obj FROM lineitem
       UNION
       SELECT 'O' || CAST(o_orderkey AS VARCHAR), 'placedBy',
              CAST(o_custkey AS VARCHAR) FROM orders),
       d AS (SELECT pred, obj, CAST(count(*) AS BIGINT) AS fact_df
             FROM t GROUP BY 1, 2),
       s AS (SELECT t.subj, t.pred, t.obj, d.fact_df,
                    row_number() OVER (PARTITION BY t.subj, t.pred
                                       ORDER BY d.fact_df, t.obj) AS pr
             FROM t JOIN d ON d.pred = t.pred AND d.obj = t.obj),
       r AS (SELECT subj, pred, obj, fact_df,
                    CAST(row_number() OVER (PARTITION BY subj
                        ORDER BY fact_df, pred, obj) AS BIGINT) AS fact_rank
             FROM s WHERE pr <= 2)
       SELECT subj, pred, obj, fact_df, fact_rank FROM r
       WHERE fact_rank <= 3""",
)
def kg_entity_summary(spark, sf_dir):
    """Top-3 most distinctive facts per order entity
    (kg_quality.summarize_entities, RELIN/FACES-style): salience =
    global rarity of the (pred, obj) fact (BIGINT subject count), with
    at most 2 facts per predicate so containsPart can't monopolize the
    card — the entity-page export the reference renders by dumping ALL
    edges (chemical detail endpoint). One fact-keyed count joined back
    on (pred, obj), then two bounded subject-keyed windows; every score
    and tiebreak is an integer or plain ASCII string, so the summary is
    a pure function of the graph on every engine."""
    from ..operators.kg_quality import summarize_entities

    return summarize_entities(
        _order_kg_triples(spark, sf_dir, dirty=False), k=3, per_pred=2
    )


@query(
    "kg_rule_mining",
    """WITH f AS (
         SELECT DISTINCT 'O' || CAST(l_orderkey AS VARCHAR) AS subj,
                'orderedPart' AS pred, CAST(l_partkey AS VARCHAR) AS obj
         FROM lineitem
         UNION ALL
         SELECT DISTINCT 'O' || CAST(l_orderkey AS VARCHAR), 'bulkPart',
                CAST(l_partkey AS VARCHAR)
         FROM lineitem WHERE l_quantity > 25
         UNION ALL
         SELECT DISTINCT CAST(l_partkey AS VARCHAR), 'containedIn',
                'O' || CAST(l_orderkey AS VARCHAR)
         FROM lineitem WHERE l_orderkey % 3 = 0),
       n AS (SELECT pred AS body_pred, CAST(count(*) AS BIGINT) AS body_n
             FROM f GROUP BY 1),
       fwd AS (SELECT b.pred AS body_pred, h.pred AS head_pred,
                      'fwd' AS direction, CAST(count(*) AS BIGINT) AS support
               FROM f b JOIN f h ON h.subj = b.subj AND h.obj = b.obj
                                AND h.pred <> b.pred
               GROUP BY 1, 2),
       inv AS (SELECT b.pred AS body_pred, h.pred AS head_pred,
                      'inv' AS direction, CAST(count(*) AS BIGINT) AS support
               FROM f b JOIN f h ON h.subj = b.obj AND h.obj = b.subj
               GROUP BY 1, 2),
       u AS (SELECT * FROM fwd UNION ALL SELECT * FROM inv)
       SELECT u.body_pred, u.head_pred, u.direction, n.body_n, u.support,
              CAST(u.support * 1000000 // n.body_n AS BIGINT) AS conf_ppm
       FROM u JOIN n ON n.body_pred = u.body_pred
       WHERE u.support >= 5""",
)
def kg_rule_mining(spark, sf_dir):
    """AMIE-lite length-1 rule mining (kg_quality.mine_rules) over a
    3-predicate order-KG built so every rule family carries mass:
    bulkPart (qty > 25 slice) => orderedPart holds at confidence 10^6,
    the reverse at the slice fraction; containedIn is the REVERSED
    orderedPart on the %3 order slice, so the 'inv' direction finds the
    exact inverse-predicate pair at 10^6 / ~1/3 confidences. Both
    directions are one self-equi-join on the entity-pair key (per-pair
    fan-out bounded by the schema-sized predicate vocabulary), totals
    and counts algebraic, confidence on the exact ppm grid."""
    from ..operators.kg_quality import mine_rules

    return mine_rules(_rule_kg_triples(spark, sf_dir), min_support=5)


@query(
    "kg_rule_inference",
    f"""WITH f AS ({_RULE_KG_SQL}),
       n AS (SELECT pred AS body_pred, CAST(count(*) AS BIGINT) AS body_n
             FROM f GROUP BY 1),
       fwd AS (SELECT b.pred AS body_pred, h.pred AS head_pred,
                      'fwd' AS direction, CAST(count(*) AS BIGINT) AS support
               FROM f b JOIN f h ON h.subj = b.subj AND h.obj = b.obj
                                AND h.pred <> b.pred
               GROUP BY 1, 2),
       inv AS (SELECT b.pred AS body_pred, h.pred AS head_pred,
                      'inv' AS direction, CAST(count(*) AS BIGINT) AS support
               FROM f b JOIN f h ON h.subj = b.obj AND h.obj = b.subj
               GROUP BY 1, 2),
       u AS (SELECT * FROM fwd UNION ALL SELECT * FROM inv),
       rules AS (SELECT u.body_pred, u.head_pred, u.direction,
                        CAST(u.support * 1000000 // n.body_n AS BIGINT) AS conf_ppm
                 FROM u JOIN n ON n.body_pred = u.body_pred
                 WHERE u.support >= 5),
       fired AS (SELECT * FROM rules WHERE conf_ppm >= 400000),
       cand AS (SELECT CASE WHEN r.direction = 'fwd' THEN f.subj ELSE f.obj END AS subj,
                       r.head_pred AS pred,
                       CASE WHEN r.direction = 'fwd' THEN f.obj ELSE f.subj END AS obj,
                       r.body_pred AS rule_body, r.direction AS rule_direction,
                       r.conf_ppm
                FROM f JOIN fired r ON r.body_pred = f.pred),
       best AS (SELECT subj, pred, obj, rule_body, rule_direction, conf_ppm,
                       row_number() OVER (PARTITION BY subj, pred, obj
                           ORDER BY conf_ppm DESC, rule_body DESC,
                                    rule_direction DESC) AS rn
                FROM cand)
       SELECT b.subj, b.pred, b.obj, b.rule_body, b.rule_direction, b.conf_ppm
       FROM best b
       WHERE b.rn = 1 AND NOT EXISTS (
           SELECT 1 FROM f
           WHERE f.subj = b.subj AND f.pred = b.pred AND f.obj = b.obj)""",
)
def kg_rule_inference(spark, sf_dir):
    """KG completion by applying the mined rules (kg_quality.infer_edges
    over mine_rules' output, conf >= 0.4): the >= 400k ppm rules include
    orderedPart => bulkPart (~the qty > 25 fraction) and
    containedIn => inverse bulkPart, so application backfills tens of
    thousands of genuinely missing bulkPart triples while the two exact
    10^6 rules fire and infer nothing new (everything they derive is
    anti-joined away) — both the productive and the saturated rule
    paths carry mass. Provenance argmax is a lexicographic struct-max
    on (conf_ppm, rule_body, rule_direction), replayed in SQL as a
    DESC/DESC/DESC row_number; broadcast rule join + one algebraic agg
    + one anti-join, no fact self-join."""
    from ..operators.kg_quality import infer_edges, mine_rules

    triples = _rule_kg_triples(spark, sf_dir)
    rules = mine_rules(triples, min_support=5)
    return infer_edges(triples, rules, min_conf_ppm=400_000)


@query(
    "kg_type_entailment",
    """WITH RECURSIVE
       t AS (SELECT 'O' || CAST(o_orderkey AS VARCHAR) AS subj,
                    'placedBy' AS pred,
                    'C' || CAST(o_custkey AS VARCHAR) AS obj
             FROM orders WHERE o_orderkey % 5 = 0
             UNION ALL
             SELECT 'C' || CAST(c_custkey AS VARCHAR), 'custNation',
                    'N' || CAST(c_nationkey AS VARCHAR) FROM customer
             UNION ALL
             SELECT 'S' || CAST(s_suppkey AS VARCHAR), 'suppNation',
                    'N' || CAST(s_nationkey AS VARCHAR) FROM supplier),
       a AS (SELECT 'C' || CAST(c_custkey AS VARCHAR) AS entity,
                    'PremiumBuyer' AS cls
             FROM customer WHERE c_mktsegment = 'BUILDING'
             UNION ALL
             SELECT 'N' || CAST(n_nationkey AS VARCHAR), 'Nation' FROM nation),
       sc(sub, sup) AS (
           VALUES ('PremiumBuyer', 'Customer'), ('Customer', 'Buyer'),
                  ('Buyer', 'Agent'), ('Supplier', 'Seller'),
                  ('Seller', 'Agent'), ('Order', 'Artifact'),
                  ('Nation', 'Place')),
       dm(pred, cls) AS (
           VALUES ('placedBy', 'Order'), ('custNation', 'Customer'),
                  ('suppNation', 'Supplier')),
       rg(pred, cls) AS (
           VALUES ('placedBy', 'Customer'), ('custNation', 'Nation'),
                  ('suppNation', 'Nation')),
       closure(sub, sup) AS (
           SELECT sub, sup FROM sc
           UNION
           SELECT c.sub, s.sup FROM closure c JOIN sc s ON s.sub = c.sup),
       base AS (SELECT entity, cls, 'asserted' AS basis FROM a
                UNION ALL
                SELECT t.subj, dm.cls, 'domain' FROM t JOIN dm ON dm.pred = t.pred
                UNION ALL
                SELECT t.obj, rg.cls, 'range' FROM t JOIN rg ON rg.pred = t.pred),
       lifted AS (SELECT b.entity, c.sup AS cls, 'subclass' AS basis
                  FROM base b JOIN closure c ON c.sub = b.cls)
       SELECT entity, cls, min(basis) AS basis
       FROM (SELECT * FROM base UNION ALL SELECT * FROM lifted)
       GROUP BY 1, 2""",
)
def kg_type_entailment(spark, sf_dir):
    """RDFS-lite entailment (kg_quality.entail_types) over a 3-predicate
    TPC-H instance graph: placedBy on the orderkey % 5 order slice plus
    custNation/suppNation, asserted types for BUILDING customers
    (PremiumBuyer) and all nations, and a depth-3 subclass DAG
    (PremiumBuyer < Customer < Buyer < Agent; Supplier < Seller < Agent;
    Order < Artifact; Nation < Place) so rdfs2/rdfs3/rdfs9 all fire and
    the multi-hop lift is exercised. basis = min(contributing
    derivations) — 'asserted' < 'domain' < 'range' < 'subclass' is
    exactly evidence priority on plain ASCII. Oracle replays the
    path-doubled Spark closure with a recursive CTE."""
    from ..operators.kg_quality import entail_types

    def _e(prefix, col):
        return F.concat(F.lit(prefix), F.col(col).cast("string"))

    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    triples = (
        orders.select(
            _e("O", "o_orderkey").alias("subj"),
            F.lit("placedBy").alias("pred"),
            _e("C", "o_custkey").alias("obj"),
        )
        .unionAll(
            cust.select(
                _e("C", "c_custkey").alias("subj"),
                F.lit("custNation").alias("pred"),
                _e("N", "c_nationkey").alias("obj"),
            )
        )
        .unionAll(
            supp.select(
                _e("S", "s_suppkey").alias("subj"),
                F.lit("suppNation").alias("pred"),
                _e("N", "s_nationkey").alias("obj"),
            )
        )
    )
    asserted = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        _e("C", "c_custkey").alias("entity"), F.lit("PremiumBuyer").alias("cls")
    ).unionAll(
        nation.select(
            _e("N", "n_nationkey").alias("entity"), F.lit("Nation").alias("cls")
        )
    )
    subclass = spark.createDataFrame(
        [("PremiumBuyer", "Customer"), ("Customer", "Buyer"),
         ("Buyer", "Agent"), ("Supplier", "Seller"), ("Seller", "Agent"),
         ("Order", "Artifact"), ("Nation", "Place")],
        "sub string, sup string",
    )
    domains = spark.createDataFrame(
        [("placedBy", "Order"), ("custNation", "Customer"),
         ("suppNation", "Supplier")],
        "pred string, cls string",
    )
    ranges = spark.createDataFrame(
        [("placedBy", "Customer"), ("custNation", "Nation"),
         ("suppNation", "Nation")],
        "pred string, cls string",
    )
    return entail_types(triples, asserted, subclass, domains, ranges)


@query(
    "kg_truth_discovery",
    f"""WITH {_TRUTH_ROUNDS_SQL},
       ns AS (SELECT claim_key, claim_value,
                     CAST(count(*) AS BIGINT) AS n_sources
              FROM c GROUP BY 1, 2),
       win AS (SELECT claim_key, claim_value, conf_ppm,
                      row_number() OVER (PARTITION BY claim_key
                          ORDER BY conf_ppm DESC, claim_value ASC) AS rn
               FROM conf2)
       SELECT w.claim_key, w.claim_value, w.conf_ppm, ns.n_sources
       FROM win w JOIN ns USING (claim_key, claim_value)
       WHERE w.rn = 1""",
)
def kg_truth_discovery(spark, sf_dir):
    """Truth discovery (truth.truth_discovery, 2 fixed-point rounds):
    suppliers claim each part's return flag (lineitem rows collide per part
    with conflicting flags — the multi-source fact-conflict shape the
    reference resolves by lattice precedence); iterative source-
    reliability voting resolves each part to its most-believed flag with
    a ppm confidence and the asserting-source count. Pure BIGINT fixed
    point — bit-identical cross-engine; trust table is per-source =>
    broadcast; belief/total sums are algebraic (map-side skew
    absorption)."""
    from ..operators.truth import truth_discovery

    li = _t(spark, sf_dir, "lineitem")
    claims = li.select(
        F.col("l_suppkey").cast("long").alias("source"),
        F.col("l_partkey").cast("long").alias("claim_key"),
        F.col("l_returnflag").alias("claim_value"),
    )
    return truth_discovery(claims, rounds=2)


@query(
    "kg_source_trust",
    f"""WITH {_TRUTH_ROUNDS_SQL}
       SELECT source, trust_ppm, n_claims FROM t2""",
)
def kg_source_trust(spark, sf_dir):
    """Per-source reliability (truth.source_trust, same 2-round loop):
    each supplier's converged trust ppm and claim count — the data-driven
    prior for ingest scorecards / lattice precedence. Same claims table
    and arithmetic as kg_truth_discovery, reported per SOURCE instead of
    per fact key."""
    from ..operators.truth import source_trust

    li = _t(spark, sf_dir, "lineitem")
    claims = li.select(
        F.col("l_suppkey").cast("long").alias("source"),
        F.col("l_partkey").cast("long").alias("claim_key"),
        F.col("l_returnflag").alias("claim_value"),
    )
    return source_trust(claims, rounds=2)


@query(
    "kg_property_closure",
    f"""WITH RECURSIVE base AS ({_ONTO_KG_SQL}),
       f AS (SELECT subj AS src, obj AS dst FROM base WHERE pred = 'follows'),
       tc(src, dst) AS (
           SELECT src, dst FROM f
           UNION
           SELECT f.src, tc.dst FROM f JOIN tc ON tc.src = f.dst),
       tagged AS (
           SELECT subj, pred, obj, 'asserted' AS basis FROM base
           UNION ALL
           SELECT obj, pred, subj, 'symmetric' FROM base WHERE pred = 'adjacentTo'
           UNION ALL
           SELECT obj, 'hasOrder', subj, 'inverse' FROM base WHERE pred = 'placedBy'
           UNION ALL
           SELECT src, 'follows', dst, 'transitive' FROM tc)
       SELECT subj, pred, obj, min(basis) AS basis
       FROM tagged WHERE subj <> obj
       GROUP BY subj, pred, obj""",
)
def kg_property_closure(spark, sf_dir):
    """OWL-lite property entailment (kg_quality.property_closure):
    owl:TransitiveProperty 'follows' (every order -> order k//2, a dense
    ~log2(N)-deep ancestor chain: 179k closure rows at sf0.01, 2.29M at
    sf0.1 — path doubling pays ~14 doubling rounds where per-level
    iteration would pay ~14 too, but each round is ONE equi-join +
    algebraic min-groupBy), owl:inverseOf placedBy/hasOrder, and
    owl:SymmetricProperty 'adjacentTo'. basis = min contributing
    derivation on ASCII ('asserted' < 'inverse' < 'symmetric' <
    'transitive'), engine-exact; oracle replays transitivity as a
    recursive CTE and the dedupe as the same min()."""
    from ..operators.kg_quality import property_closure

    return property_closure(
        _onto_kg_triples(spark, sf_dir),
        symmetric=("adjacentTo",),
        inverse_of=(("placedBy", "hasOrder"),),
        transitive=("follows",),
    )


@query(
    "kg_functional_audit",
    """WITH t AS (
         SELECT 'P' || CAST(l_partkey AS VARCHAR) AS subj,
                'returnFlag' AS pred,
                CAST(l_returnflag AS VARCHAR) AS obj
         FROM lineitem
         UNION ALL
         SELECT 'O' || CAST(o_orderkey AS VARCHAR), 'placedBy',
                'C' || CAST(o_custkey AS VARCHAR)
         FROM orders),
       fv AS (SELECT pred, subj AS entity, 'subj' AS side,
                     CAST(count(DISTINCT obj) AS BIGINT) AS n_values,
                     min(obj) AS v_min, max(obj) AS v_max
              FROM t WHERE pred = 'returnFlag'
              GROUP BY pred, subj HAVING count(DISTINCT obj) > 1),
       ifv AS (SELECT pred, obj AS entity, 'obj' AS side,
                      CAST(count(DISTINCT subj) AS BIGINT) AS n_values,
                      min(subj) AS v_min, max(subj) AS v_max
               FROM t WHERE pred = 'placedBy'
               GROUP BY pred, obj HAVING count(DISTINCT subj) > 1)
       SELECT * FROM fv UNION ALL SELECT * FROM ifv""",
)
def kg_functional_audit(spark, sf_dir):
    """owl:FunctionalProperty / owl:InverseFunctionalProperty audit
    (kg_quality.functional_violations): 'returnFlag' declared functional
    over parts (lineitem asserts conflicting flags per part — real
    violation mass), 'placedBy' declared inverse-functional over orders
    (customers with several orders violate it — the CAS-collision shape
    the reference's match-by-CAS cascade assumes away). One algebraic
    count-distinct/min/max groupBy per direction, no joins; offenders
    feed truth.truth_discovery for adjudication."""
    from ..operators.kg_quality import functional_violations

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    t = (
        li.select(
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("subj"),
            F.lit("returnFlag").alias("pred"),
            F.col("l_returnflag").alias("obj"),
        )
        .unionAll(
            o.select(
                F.concat(F.lit("O"), F.col("o_orderkey").cast("string")).alias("subj"),
                F.lit("placedBy").alias("pred"),
                F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("obj"),
            )
        )
    )
    return functional_violations(
        t, functional=("returnFlag",), inverse_functional=("placedBy",)
    )



@query(
    "kg_lp_eval",
    """WITH p_all AS (
         SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey
          AND a.l_quantity >= 25 AND b.l_quantity >= 25
         WHERE a.l_partkey < b.l_partkey),
       hold AS (SELECT s, t FROM p_all WHERE (s + t) % 11 = 0),
       keep AS (SELECT s, t FROM p_all WHERE (s + t) % 11 <> 0),
       und AS (SELECT s AS src, t AS dst FROM keep
               UNION ALL SELECT t, s FROM keep),
       q AS (SELECT DISTINCT s AS u FROM hold),
       deg AS (SELECT src AS z, count(*) AS deg FROM und GROUP BY src),
       midok AS (SELECT z AS m, CAST(1000000000 // deg AS BIGINT) AS ra
                 FROM deg WHERE deg <= 40),
       nbu AS (SELECT und.src AS m, und.dst AS u, midok.ra
               FROM und JOIN midok ON und.src = midok.m
               JOIN q ON und.dst = q.u),
       nbv AS (SELECT und.src AS m, und.dst AS v
               FROM und JOIN midok ON und.src = midok.m),
       wed AS (SELECT nbu.u, nbv.v, nbu.ra FROM nbu
               JOIN nbv ON nbu.m = nbv.m AND nbu.u <> nbv.v),
       sc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
                     CAST(sum(ra) AS BIGINT) AS ra
              FROM wed GROUP BY u, v),
       cand AS (SELECT sc.* FROM sc
                LEFT JOIN und ON und.src = sc.u AND und.dst = sc.v
                WHERE und.src IS NULL),
       rk AS (SELECT u, v,
                     CAST(row_number() OVER (PARTITION BY u
                          ORDER BY ra DESC, cn DESC, v) AS BIGINT) AS _rk
              FROM cand),
       j AS (SELECT h.s, h.t, rk._rk FROM hold h
             LEFT JOIN rk ON rk.u = h.s AND rk.v = h.t)
       SELECT CAST(count(*) AS BIGINT) AS n_truth,
              CAST(count(_rk) AS BIGINT) AS n_found,
              CAST(sum(COALESCE(1000000 // _rk, 0)) // count(*) AS BIGINT)
                AS mrr_ppm,
              CAST(count(CASE WHEN _rk <= 1 THEN 1 END) * 1000000 // count(*)
                AS BIGINT) AS hits_1_ppm,
              CAST(count(CASE WHEN _rk <= 10 THEN 1 END) * 1000000 // count(*)
                AS BIGINT) AS hits_10_ppm
       FROM j""",
)
def kg_lp_eval(spark, sf_dir):
    """Link-prediction evaluation harness (graph.lp_candidate_scores +
    er_metrics.ranking_metrics): hold out every co-order edge with
    (s+t) % 11 == 0, score query-centric candidates for the held-out
    sources over the REMAINING graph (capped-middle RA/CN wedges, the
    filtered setting — observed edges anti-joined away), and report
    filtered MRR + Hits@1/10 with unreachable positives kept in the
    denominator (n_found shows the gap — dropping them is how LP
    numbers get quietly inflated). This is the TransE-protocol
    evaluation loop the KG-completion stack (negative_sample,
    contrastive_pairs, rule_inference) was missing: the predictor and
    its scorecard in one value-checked plan. Pure integer ranks/ppm —
    floor-mean MRR, never a float mean."""
    from ..operators.er_metrics import ranking_metrics
    from ..operators.graph import lp_candidate_scores

    pairs = _q25_edges(spark, sf_dir).distinct().localCheckpoint()
    hold = pairs.where("(src + dst) % 11 = 0")
    keep = pairs.where("(src + dst) % 11 <> 0")
    cand = lp_candidate_scores(
        keep, hold.select("src"), "src", max_middle_degree=40
    )
    return ranking_metrics(
        cand,
        hold.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        "u", "v", ["ra_1e9", "common_neighbors"], ks=(1, 10),
    )



@query(
    "multimodal_media_context",
    """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS d, doc_id AS did,
              'H ' || CAST(doc_id AS VARCHAR) AS h, text AS b FROM documents),
       sp AS (
         SELECT d, 'image' AS kind, '' AS text,
                'blob://' || d || '/img_0.png' AS mr, 0 AS o
         FROM base WHERE did % 5 = 0
         UNION ALL SELECT d, 'text', h, '', 1 FROM base WHERE did % 5 = 0
         UNION ALL SELECT d, 'text', b, '', 2 FROM base WHERE did % 5 = 0
         UNION ALL SELECT d, 'text', h, '', 0 FROM base WHERE did % 5 = 1
         UNION ALL SELECT d, 'text', b, '', 1 FROM base WHERE did % 5 = 1
         UNION ALL SELECT d, 'image', '', 'blob://' || d || '/img_0.png', 2
         FROM base WHERE did % 5 = 1
         UNION ALL SELECT d, 'text', h, '', 0 FROM base WHERE did % 5 = 2
         UNION ALL SELECT d, 'image', '', 'blob://' || d || '/img_0.png', 1
         FROM base WHERE did % 5 = 2
         UNION ALL SELECT d, 'image', '', 'blob://' || d || '/img_1.png', 2
         FROM base WHERE did % 5 = 2
         UNION ALL SELECT d, 'text', b, '', 3 FROM base WHERE did % 5 = 2
         UNION ALL SELECT d, 'text', h, '', 0 FROM base WHERE did % 5 > 2
         UNION ALL SELECT d, 'image', '', 'blob://' || d || '/img_0.png', 1
         FROM base WHERE did % 5 > 2
         UNION ALL SELECT d, 'text', b, '', 2 FROM base WHERE did % 5 > 2),
       imgs AS (SELECT d, mr, o FROM sp WHERE kind = 'image'),
       txts AS (SELECT d, text, o FROM sp WHERE kind = 'text'),
       pv AS (SELECT i.d, i.mr, i.o, max(t.o) AS po FROM imgs i
              LEFT JOIN txts t ON t.d = i.d AND t.o < i.o GROUP BY 1, 2, 3),
       nx AS (SELECT i.d, i.mr, i.o, min(t.o) AS no FROM imgs i
              LEFT JOIN txts t ON t.d = i.d AND t.o > i.o GROUP BY 1, 2, 3)
       SELECT pv.d AS doc_id, pv.mr AS media_ref, CAST(pv.o AS INT) AS media_offset,
              tp.text AS prev_text, CAST(pv.po AS INT) AS prev_offset,
              tn.text AS next_text, CAST(nx.no AS INT) AS next_offset
       FROM pv JOIN nx ON nx.d = pv.d AND nx.mr = pv.mr AND nx.o = pv.o
       LEFT JOIN txts tp ON tp.d = pv.d AND tp.o = pv.po
       LEFT JOIN txts tn ON tn.d = pv.d AND tn.o = nx.no""",
)
def multimodal_media_context(spark, sf_dir):
    """Figure-caption association over interleaved spans (multimodal.
    media_context): for every media span, the nearest text span before
    and after in span order — the grounding step a multimodal KG needs
    before an image can evidence a triple, and an operator over the
    north rule's OWN span shape (kind/text/media_ref/offset). The gate
    interleaves four layouts so every branch carries mass: a leading
    figure (no prev — absence is the signal), a trailing figure (no
    next), TWO consecutive images (both must share the same neighbours
    — lag/lead would wrongly return the other image; last/first IGNORE
    NULLS is the point), and the plain sandwiched case. One explode +
    ONE doc-partitioned window on the pipeline's own doc_id
    partitioning; no joins."""
    from ..operators.multimodal import media_context

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    h = F.concat(F.lit("H "), ds)
    b = F.col("text")
    t = lambda txt, o: F.struct(  # noqa: E731
        F.lit("text").alias("kind"), txt.alias("text"),
        F.lit("").alias("media_ref"), F.lit(o).cast("int").alias("offset"),
    )
    img = lambda k, o: F.struct(  # noqa: E731
        F.lit("image").alias("kind"), F.lit("").alias("text"),
        F.concat(F.lit("blob://"), ds, F.lit(f"/img_{k}.png")).alias("media_ref"),
        F.lit(o).cast("int").alias("offset"),
    )
    spans = (
        F.when(did % 5 == 0, F.array(img(0, 0), t(h, 1), t(b, 2)))
        .when(did % 5 == 1, F.array(t(h, 0), t(b, 1), img(0, 2)))
        .when(did % 5 == 2, F.array(t(h, 0), img(0, 1), img(1, 2), t(b, 3)))
        .otherwise(F.array(t(h, 0), img(0, 1), t(b, 2)))
    )
    docs = d.select(ds.alias("doc_id"), spans.alias("spans"))
    return media_context(docs)



@query(
    "multimodal_span_reuse",
    """WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS d, doc_id AS did,
                            text AS b FROM documents),
       sp AS (
         SELECT d, 'text' AS kind, b AS key FROM base
         UNION ALL
         SELECT d, 'text', 'CONFIDENTIAL - INTERNAL USE ONLY'
         FROM base WHERE did % 3 = 0
         UNION ALL
         SELECT d, 'text', 'CONFIDENTIAL - INTERNAL USE ONLY'
         FROM base WHERE did % 9 = 0
         UNION ALL
         SELECT d, 'image', 'blob://shared/logo.png' FROM base WHERE did % 4 = 0
         UNION ALL
         SELECT d, 'image', 'blob://' || d || '/img_0.png' FROM base)
       SELECT kind, key AS span_key,
              CAST(count(DISTINCT d) AS BIGINT) AS n_docs,
              CAST(count(*) AS BIGINT) AS n_spans
       FROM sp GROUP BY 1, 2 HAVING count(DISTINCT d) >= 2""",
)
def multimodal_span_reuse(spark, sf_dir):
    """Cross-document span reuse (multimodal.span_reuse): C4's
    boilerplate rule lifted to the interleaved span shape — verbatim-
    repeated text spans are boilerplate (the banner here additionally
    repeats TWICE inside every 9th doc, so n_docs counts distinct docs
    while n_spans prices total occurrences), and a media_ref shared
    across docs is a shared asset to decode once and exclude from
    content dedup (the logo hits every 4th doc; per-doc image refs stay
    under the n_docs >= 2 floor and are correctly absent — the filter
    carries real dropped mass at both scale factors; duplicate body
    TEXT across docs also surfaces at sf0.1 where the corpus genuinely
    repeats). One explode + ONE (kind, key) aggregation; the distinct-
    doc count is the only non-algebraic piece, bounded per key by the
    reuse itself."""
    from ..operators.multimodal import span_reuse

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    t = lambda txt: F.struct(  # noqa: E731
        F.lit("text").alias("kind"), txt.alias("text"),
        F.lit("").alias("media_ref"), F.lit(0).cast("int").alias("offset"),
    )
    img = lambda ref: F.struct(  # noqa: E731
        F.lit("image").alias("kind"), F.lit("").alias("text"),
        ref.alias("media_ref"), F.lit(0).cast("int").alias("offset"),
    )
    banner = F.lit("CONFIDENTIAL - INTERNAL USE ONLY")
    shared = F.lit("blob://shared/logo.png")
    own = F.concat(F.lit("blob://"), ds, F.lit("/img_0.png"))
    spans = F.concat(
        F.array(t(F.col("text")), img(own)),
        F.when(did % 3 == 0, F.array(t(banner))).otherwise(
            F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>")
        ),
        F.when(did % 9 == 0, F.array(t(banner))).otherwise(
            F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>")
        ),
        F.when(did % 4 == 0, F.array(img(shared))).otherwise(
            F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>")
        ),
    )
    docs = d.select(ds.alias("doc_id"), spans.alias("spans"))
    return span_reuse(docs, min_docs=2)


@query(
    "kg_temporal_conflicts",
    """WITH iv AS (
         SELECT o_custkey AS k, o_orderkey AS id, o_orderpriority AS v,
                o_orderdate AS s,
                CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS e
         FROM orders)
       SELECT a.k, a.id AS id1, b.id AS id2, a.v AS val1, b.v AS val2,
              CAST(greatest(a.s, b.s) AS VARCHAR) AS overlap_start,
              CAST(least(a.e, b.e) AS VARCHAR) AS overlap_end,
              a.v != b.v AS is_conflict
       FROM iv a JOIN iv b
         ON a.k = b.k AND a.id < b.id AND a.s < b.e AND b.s < a.e""",
)
def kg_temporal_conflicts(spark, sf_dir):
    """Temporal functional-property audit (temporal.interval_conflicts):
    each order asserts its customer's active priority for 30 days;
    overlapping assertions with different priorities are the conflicts a
    one-value-AT-A-TIME invariant flags (1461 conflicting vs 372
    agreeing pairs at sf0.01, 15053/3653 at sf0.1 — both branches carry
    mass via the is_conflict flag, so an operator that drops agreeing
    overlaps or miscounts either side hash-mismatches). The oracle is
    the naive per-key range self-join that goes quadratic on a hub key
    at scale; the operator quantizes time into 30-day buckets, explodes
    ONE side to its covered buckets, equi-joins on (key, bucket), and
    each pair is found exactly once in the bucket owning the later start
    — no distinct pass, shuffle time-local by bucket."""
    from ..operators.temporal import interval_conflicts

    iv = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("id"),
        F.col("o_orderpriority").alias("v"),
        F.col("o_orderdate").alias("s"),
        F.date_add(F.col("o_orderdate"), 30).alias("e"),
    )
    out = interval_conflicts(
        iv, ["k"], "id", "v", "s", "e",
        bucket_width=30 * 86400.0, conflicts_only=False,
    )
    return out.withColumn(
        "overlap_start", F.col("overlap_start").cast("string")
    ).withColumn("overlap_end", F.col("overlap_end").cast("string"))


@query(
    "kg_entity_salience",
    r"""WITH tt AS (
         SELECT doc_id,
                list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '') AS parts
         FROM documents),
       ix AS (SELECT doc_id, len(parts) AS L,
                     unnest(generate_series(1, len(parts))) AS i, parts
              FROM tt),
       tok AS (SELECT doc_id, L, CAST(i - 1 AS BIGINT) AS pos,
                      parts[i] AS t
               FROM ix),
       hits AS (SELECT * FROM tok
                WHERE t IN ('customer', 'join', 'spark', 'table', 'window')),
       agg AS (
         SELECT doc_id, t AS keyword, CAST(max(L) AS BIGINT) AS L,
                CAST(count(*) AS BIGINT) AS n_mentions,
                CAST(min(pos) AS BIGINT) AS first_pos,
                CAST(max(pos) AS BIGINT) AS last_pos
         FROM hits GROUP BY 1, 2)
       SELECT doc_id, keyword, n_mentions, first_pos, last_pos,
              last_pos - first_pos AS spread,
              CAST((7 * ((L - first_pos) * 1000000 // L)
                    + 3 * (n_mentions * 1000000 // L)) // 10 AS BIGINT)
                AS salience_ppm
       FROM agg""",
)
def kg_entity_salience(spark, sf_dir):
    """Positional entity salience (kg_training.mention_salience —
    Dunietz & Gillick features): per (doc, keyword), first/last mention
    position, frequency and the 7:3 early-vs-frequency ppm fold over
    five corpus-native gazetteer terms (~900 occurrences each at
    sf0.01) — prominence, not mere presence; a footer mention stops
    outweighing a title one. Pure algebraic (doc, keyword) aggregation
    + a broadcast token-count join; the literal keyword filter prunes
    the exploded tokens before any shuffle."""
    from ..operators.kg_training import mention_salience

    d = _t(spark, sf_dir, "documents")
    return mention_salience(
        d, "doc_id", "text",
        ["customer", "join", "spark", "table", "window"],
    )
