"""Relational core: filters/projections (P), joins (J), aggregations (A), windows/sort/union (W/U), scalar functions (F).

Split out of the former monolithic contract.py (round-4, VERDICT ask #6);
query registration happens via the shared @query decorator into the
aggregating contract.Q / contract.SQL dicts in _shared.py.
"""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import Window  # noqa: F401

from ._shared import *  # noqa: F401,F403



# ---------------------------------------------------------------- filters --

@query(
    "p1_filter_projection",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_returnflag = 'R' AND l_quantity BETWEEN 30 AND 40
         AND l_linestatus IN ('F', 'O')""",
)
def p1_filter_projection(spark, sf_dir):
    """P1/P2/P7 — conjunctive filter + projection; predicate and column
    pruning must reach the parquet scan (asserted in tests)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_returnflag") == "R")
        & F.col("l_quantity").between(30, 40)
        & F.col("l_linestatus").isin("F", "O")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "p3_norm_name_key",
    """SELECT replace(lower(c_name), ' ', '') AS norm_key, c_custkey
       FROM customer WHERE trim(c_name) != ''""",
)
def p3_norm_name_key(spark, sf_dir):
    """F1/P3 — the reference's canonical entity key
    (global_node_repository.py:25-34)."""
    c = _t(spark, sf_dir, "customer")
    return c.where(F.trim("c_name") != "").select(
        norm_name(F.col("c_name")).alias("norm_key"), "c_custkey"
    )


@query(
    "p4_substring_predicate",
    """SELECT p_partkey, p_name, p_type FROM part
       WHERE contains(lower(p_name), 'widget')""",
)
def p4_substring_predicate(spark, sf_dir):
    """P4 — case-insensitive LIKE '%x%'
    (global_node_repository.py:172-183)."""
    p = _t(spark, sf_dir, "part")
    return p.where(F.lower(F.col("p_name")).contains("widget")).select(
        "p_partkey", "p_name", "p_type"
    )


@query(
    "p6_notin_count",
    """SELECT count(*) AS cnt FROM supplier
       WHERE s_nationkey NOT IN (1, 2, 3)""",
)
def p6_notin_count(spark, sf_dir):
    """P6 — NOT-IN anti-predicate count
    (global_node_repository.py:125-137)."""
    s = _t(spark, sf_dir, "supplier")
    return s.where(~F.col("s_nationkey").isin(1, 2, 3)).agg(F.count("*").alias("cnt"))


# ------------------------------------------------------------------ joins --

@query(
    "j1_multiway_join_agg",
    """SELECT r_name, n_name, count(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
       FROM orders JOIN customer ON o_custkey = c_custkey
                   JOIN nation ON c_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name""",
)
def j1_multiway_join_agg(spark, sf_dir):
    """J1/J3 — multi-hop equi join chain + aggregate; nation/region are
    broadcast (Catalyst auto / explicit hint)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_orders"), _sum2("o_totalprice", "total_price"))
    )


@query(
    "j2_broadcast_dim",
    """SELECT n_name, count(*) AS n_suppliers,
              CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       GROUP BY n_name""",
)
def j2_broadcast_dim(spark, sf_dir):
    """J2 — node x small dimension (manufacturer analog) broadcast join."""
    s, n = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_suppliers"), _sum2("s_acctbal", "total_bal"))
    )


@query(
    "j3_distinct_report",
    """SELECT DISTINCT c_mktsegment, n_name, r_name
       FROM customer JOIN nation ON c_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey""",
)
def j3_distinct_report(spark, sf_dir):
    """J3 — 3-way reporting join + DISTINCT
    (global_node_repository.py:160-183)."""
    c, n, r = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_mktsegment", "n_name", "r_name")
        .distinct()
    )


@query(
    "j5_link_cascade",
    """SELECT l_orderkey, l_linenumber,
              COALESCE(p.p_name, 'SUPP-' || s.s_name, 'NONE') AS resolved,
              CASE WHEN p.p_name IS NOT NULL THEN 'primary'
                   WHEN s.s_name IS NOT NULL THEN 'fallback'
                   ELSE 'new' END AS match_kind
       FROM lineitem l
       LEFT JOIN (SELECT p_partkey, p_name FROM part WHERE p_size > 40) p
              ON l.l_partkey = p.p_partkey
       LEFT JOIN (SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal > 9000) s
              ON l.l_suppkey = s.s_suppkey""",
)
def j5_link_cascade(spark, sf_dir):
    """J5/W3/J6 — the priority-ordered linking cascade: primary key match
    first, fallback key second, else 'new' (CAS-first/name-second,
    artifact_ingestor_service.py:1027-1084)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where("p_size > 40").select("p_partkey", "p_name")
    s = _t(spark, sf_dir, "supplier").where("s_acctbal > 9000").select("s_suppkey", "s_name")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.coalesce(F.col("p_name"), F.concat(F.lit("SUPP-"), F.col("s_name")), F.lit("NONE")).alias("resolved"),
            F.when(F.col("p_name").isNotNull(), "primary")
            .when(F.col("s_name").isNotNull(), "fallback")
            .otherwise("new")
            .alias("match_kind"),
        )
    )


@query(
    "j7_anti_join",
    """SELECT c_mktsegment, count(*) AS n_customers
       FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
       GROUP BY c_mktsegment""",
)
def j7_anti_join(spark, sf_dir):
    """J7 — identity anti-join (first-wins dedupe probe,
    artifact_ingestor_service.py:979-989)."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# ------------------------------------------------------------- aggregates --

@query(
    "a1_group_counts",
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
              count(DISTINCT l_partkey) AS n_parts,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def a1_group_counts(spark, sf_dir):
    """A1/A2/A7 — count / countDistinct / sum rollup
    (file_analysis_service.py:75-121,775-789)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("l_partkey").alias("n_parts"),
        _sum2("l_quantity", "sum_qty"),
    )


@query(
    "a3_status_fold",
    """SELECT user_id,
              CASE max(CASE event_type WHEN 'error' THEN 2 WHEN 'signup' THEN 1 ELSE 0 END)
                   WHEN 2 THEN 'YES' WHEN 1 THEN 'PENDING' ELSE 'NO' END AS status
       FROM events GROUP BY user_id""",
)
def a3_status_fold(spark, sf_dir):
    """A3 — the ordered-domain ANY/ALL status lattice as max-over-rank
    (artifact_ingestor_service.py:819-845)."""
    e = _t(spark, sf_dir, "events")
    rank = (
        F.when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 1)
        .otherwise(0)
    )
    return (
        e.withColumn("r", rank)
        .groupBy("user_id")
        .agg(F.max("r").alias("mr"))
        .select(
            "user_id",
            F.when(F.col("mr") == 2, "YES")
            .when(F.col("mr") == 1, "PENDING")
            .otherwise("NO")
            .alias("status"),
        )
    )


@query(
    "a4_preference_mode",
    """SELECT user_id,
              CASE min(CASE event_type WHEN 'purchase' THEN 0 WHEN 'click' THEN 1
                       WHEN 'signup' THEN 2 WHEN 'error' THEN 3 ELSE 4 END)
                   WHEN 0 THEN 'purchase' WHEN 1 THEN 'click' WHEN 2 THEN 'signup'
                   WHEN 3 THEN 'error' ELSE 'other' END AS preferred_event
       FROM events GROUP BY user_id""",
)
def a4_preference_mode(spark, sf_dir):
    """A4 — preference-ordered source pick: first entry of a fixed
    preference list with count > 0 (artifact_ingestor_service.py:846-879)."""
    e = _t(spark, sf_dir, "events")
    pref = (
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "signup", 2)
        .when(F.col("event_type") == "error", 3)
        .otherwise(4)
    )
    return (
        e.withColumn("pr", pref)
        .groupBy("user_id")
        .agg(F.min("pr").alias("mp"))
        .select(
            "user_id",
            F.when(F.col("mp") == 0, "purchase")
            .when(F.col("mp") == 1, "click")
            .when(F.col("mp") == 2, "signup")
            .when(F.col("mp") == 3, "error")
            .otherwise("other")
            .alias("preferred_event"),
        )
    )


@query(
    "a5_last_wins",
    """SELECT user_id, event_type AS last_event_type, value AS last_value
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1""",
)
def a5_last_wins(spark, sf_dir):
    """A5 — last-occurrence-wins dedupe per key
    (artifact_ingestor_service.py:788-791)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", F.col("event_type").alias("last_event_type"), F.col("value").alias("last_value"))
    )


# ------------------------------------------------- windows / sort / union --

@query(
    "w1_topk_per_group",
    """SELECT o_custkey, o_orderkey, CAST(rnk AS BIGINT) AS rnk
       FROM (SELECT o_custkey, o_orderkey,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
             FROM orders) WHERE rnk <= 3""",
)
def w1_topk_per_group(spark, sf_dir):
    """W1 — top-k per group (pgvector top-5 analog,
    vector_repository.py:56-67)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where("rnk <= 3")
        .select("o_custkey", "o_orderkey", "rnk")
    )


@query(
    "w3_first_match",
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_date
       FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS rn
             FROM orders) WHERE rn = 1""",
)
def w3_first_match(spark, sf_dir):
    """W3 — first-match-wins (result[0] linking semantics,
    artifact_ingestor_service.py:1050-1060)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("o_custkey", "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_date"))
    )


@query(
    "u1_union_all",
    """SELECT l_returnflag, count(*) AS cnt FROM (
         SELECT l_returnflag FROM lineitem WHERE l_quantity > 45
         UNION ALL
         SELECT l_returnflag FROM lineitem WHERE l_returnflag = 'R'
       ) GROUP BY l_returnflag""",
)
def u1_union_all(spark, sf_dir):
    """U1 — duplicate-preserving union (keyword scope union,
    file_analysis_service.py:467-489)."""
    li = _t(spark, sf_dir, "lineitem")
    u = li.where("l_quantity > 45").select("l_returnflag").unionAll(
        li.where("l_returnflag = 'R'").select("l_returnflag")
    )
    return u.groupBy("l_returnflag").agg(F.count("*").alias("cnt"))


# ------------------------------------------------------- scalar functions --

@query(
    "f_scalar_bundle",
    """SELECT c_custkey,
              replace(lower(c_name), ' ', '') AS norm_key,
              base64(encode(c_name)) AS b64_name,
              lpad(CAST(c_nationkey AS VARCHAR), 3, '0') AS padded_nation,
              nullif(trim(c_mktsegment), '') AS seg_or_null,
              c_name || CASE WHEN trim(c_mktsegment) != ''
                             THEN ' (' || c_mktsegment || ')' ELSE '' END AS display
       FROM customer""",
)
def f_scalar_bundle(spark, sf_dir):
    """F1 norm / F7 base64 identity / F13 zero-pad / F6 trim-or-null /
    F5 display-name compose — one row-parallel scalar pipeline."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        norm_name(F.col("c_name")).alias("norm_key"),
        b64_id(F.col("c_name")).alias("b64_name"),
        F.lpad(F.col("c_nationkey").cast("string"), 3, "0").alias("padded_nation"),
        F.nullif(F.trim(F.col("c_mktsegment")), F.lit("")).alias("seg_or_null"),
        display_name(F.col("c_name"), F.col("c_mktsegment"), F.lit("")).alias("display"),
    )


@query(
    "f2_keyword_match",
    """SELECT kw, count(*) AS n_docs
       FROM documents CROSS JOIN (VALUES ('scan'), ('merge'), ('window'), ('vector')) k(kw)
       WHERE regexp_matches(lower(text), '\\b' || kw || '\\b')
          OR contains(lower(text), kw)
       GROUP BY kw""",
)
def f2_keyword_match(spark, sf_dir):
    """F2 — the word-boundary-OR-substring keyword predicate
    (file_analysis_service.py:83-87) at document granularity."""
    d = _t(spark, sf_dir, "documents")
    kws = spark.createDataFrame([("scan",), ("merge",), ("window",), ("vector",)], ["kw"])
    # regex-branch-implies-substring-branch (see operators/mentions.py):
    # the Spark side runs only the substring test; the DuckDB oracle keeps
    # BOTH branches, so the contract comparison pins the equivalence.
    joined = d.crossJoin(F.broadcast(kws)).where(F.expr("contains(lower(text), kw)"))
    return joined.groupBy("kw").agg(F.count("*").alias("n_docs"))


@query(
    "f9_json_parse",
    r"""WITH raw AS (
         SELECT p_partkey,
                '```json' || chr(10) || '{"material_name": "' || p_name ||
                '", "product_number": "' || CAST(p_partkey AS VARCHAR) ||
                '", "manufacturer_name": "' || p_brand ||
                '", "chemicals": [{"chemical_name": "' || p_type ||
                '", "cas_no": "' || CAST(p_size AS VARCHAR) ||
                '-00-1", "weight": ' || CAST(p_size AS VARCHAR) || '}]}' ||
                chr(10) || '```' AS payload
         FROM part),
       stripped AS (
         SELECT p_partkey,
                regexp_replace(regexp_replace(payload, '^\s*```(json)?\s*', ''),
                               '\s*```\s*$', '') AS j
         FROM raw)
       SELECT p_partkey,
              json_extract_string(j, '$.material_name') AS material_name,
              json_extract_string(j, '$.manufacturer_name') AS manufacturer_name,
              json_extract_string(j, '$.chemicals[0].chemical_name') AS chem_name,
              json_extract_string(j, '$.chemicals[0].cas_no') AS cas_no,
              CAST(json_extract(j, '$.chemicals[0].weight') AS BIGINT) AS weight
       FROM stripped""",
)
def f9_json_parse(spark, sf_dir):
    """F9 — fence-strip + schema-on-read JSON parse of an MSDSAnalysis-shaped
    extraction payload (artifact_ingestor_service.py:770-777,
    dto/msds_openai_response.py:7-25). The payload is synthesized
    deterministically from the part table so DuckDB can replay the identical
    strip + json_extract; the Spark side runs the real F9 operator
    (functions/core.py strip_json_fences + parse_msds_json)."""
    from ..functions.core import parse_msds_json

    p = _t(spark, sf_dir, "part")
    payload = F.concat(
        F.lit('```json\n{"material_name": "'), F.col("p_name"),
        F.lit('", "product_number": "'), F.col("p_partkey").cast("string"),
        F.lit('", "manufacturer_name": "'), F.col("p_brand"),
        F.lit('", "chemicals": [{"chemical_name": "'), F.col("p_type"),
        F.lit('", "cas_no": "'), F.col("p_size").cast("string"),
        F.lit('-00-1", "weight": '), F.col("p_size").cast("string"),
        F.lit("}]}\n```"),
    )
    doc = parse_msds_json(payload)
    chem = F.element_at(doc["chemicals"], 1)
    return p.select(
        "p_partkey",
        doc["material_name"].alias("material_name"),
        doc["manufacturer_name"].alias("manufacturer_name"),
        chem["chemical_name"].alias("chem_name"),
        chem["cas_no"].alias("cas_no"),
        chem["weight"].alias("weight"),
    )


@query(
    "f8_url_parse",
    r"""WITH u AS (
         SELECT doc_id,
                'https://acct.blob.example.com/container-a/docs/' ||
                CAST(doc_id AS VARCHAR) || '/page_001.png' ||
                CASE WHEN doc_id % 3 <> 0
                     THEN '?sig=' || lang || '&ts=' || CAST(doc_id AS VARCHAR)
                     ELSE '' END ||
                CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
         FROM documents)
       SELECT doc_id,
              regexp_extract(url, '^https?://([^/]+)', 1) AS blob_host,
              regexp_extract(url, '^https?://[^/]+/container-a/([^?#]*)', 1)
              || CASE WHEN contains(url, '?')
                      THEN '?' || regexp_extract(url, '\?([^#]*)', 1) ELSE '' END
              || CASE WHEN contains(url, '#')
                      THEN '#' || regexp_extract(url, '#(.*)$', 1) ELSE '' END AS rel_path
       FROM u""",
)
def f8_url_parse(spark, sf_dir):
    """F8 — URL parse/split: host + container-relative path with
    query/fragment re-attach (file_analysis_service.py:255-266,
    utils/azure_blob_storage.py:69-79). URLs are synthesized from the
    documents table (some rows without query, some with fragment) so both
    engines parse the identical strings; the Spark side uses the real F8
    operator (functions/core.py container_relative_path via parse_url)."""
    from ..functions.core import container_relative_path

    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://acct.blob.example.com/container-a/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("/page_001.png"),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(F.lit("?sig="), F.col("lang"), F.lit("&ts="), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return d.select("doc_id", url.alias("url")).select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("blob_host"),
        container_relative_path(F.col("url"), "container-a").alias("rel_path"),
    )


@query(
    "f4_flatten_polygon",
    """SELECT p_partkey,
              CAST(p_partkey AS VARCHAR) || ',' || CAST(p_size AS VARCHAR) || ',' ||
              CAST(p_partkey + 10 AS VARCHAR) || ',' || CAST(p_size AS VARCHAR) || ',' ||
              CAST(p_partkey + 10 AS VARCHAR) || ',' || CAST(p_size + 20 AS VARCHAR) || ',' ||
              CAST(p_partkey AS VARCHAR) || ',' || CAST(p_size + 20 AS VARCHAR) AS flat_coords,
              CAST(8 AS BIGINT) AS n_coords
       FROM part""",
)
def f4_flatten_polygon(spark, sf_dir):
    """F4 — boundingPolygon flatten: [{x,y},...] -> [x1,y1,x2,y2,...]
    (file_analysis_service.py:96-101). A 4-point OCR-style polygon is built
    from each part row, flattened by the real F4 operator
    (functions/core.py flatten_polygon), and serialized for the value
    check; DuckDB replays the flat coordinate order arithmetically."""
    from ..functions.core import flatten_polygon

    p = _t(spark, sf_dir, "part")
    pt = lambda x, y: F.struct(x.alias("x"), y.alias("y"))  # noqa: E731
    x0, y0 = F.col("p_partkey"), F.col("p_size").cast("long")
    poly = F.array(pt(x0, y0), pt(x0 + 10, y0), pt(x0 + 10, y0 + 20), pt(x0, y0 + 20))
    flat = flatten_polygon(poly)
    return p.select(
        "p_partkey",
        F.array_join(F.transform(flat, lambda v: v.cast("string")), ",").alias("flat_coords"),
        F.size(flat).cast("long").alias("n_coords"),
    )


# ------------------------------------------- §2 rows added in round 1 (b) --

@query(
    "j4_edge_child_lookup",
    """SELECT l.l_orderkey, p.p_partkey, p.p_name, p.p_type
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE l.l_orderkey < 100""",
)
def j4_edge_child_lookup(spark, sf_dir):
    """J4 — children-of-parent edge lookup
    (global_node_repository.py:197-219: edge table filtered on parent id,
    joined to the child node table)."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    return (
        li.where(F.col("l_orderkey") < 100)
        .join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_partkey", "p_name", "p_type")
    )


@query(
    "j6_exact_name_link",
    """SELECT p.p_partkey,
              COALESCE(d.dim_id, 'new:' || md5(p.p_brand)) AS linked_id,
              d.dim_id IS NULL AS is_new
       FROM part p
       LEFT JOIN (SELECT DISTINCT p_brand AS brand, 'dim:' || md5(p_brand) AS dim_id
                  FROM part WHERE p_size > 25) d
              ON p.p_brand = d.brand""",
)
def j6_exact_name_link(spark, sf_dir):
    """J6 — exact-name dimension link: reuse the existing id else mint a
    deterministic new one (save_manufacturer,
    artifact_ingestor_service.py:991-1008)."""
    p = _t(spark, sf_dir, "part")
    dim = (
        p.where("p_size > 25")
        .select(F.col("p_brand").alias("brand"))
        .distinct()
        .withColumn("dim_id", F.concat(F.lit("dim:"), F.md5(F.col("brand"))))
    )
    return p.join(F.broadcast(dim), p.p_brand == dim.brand, "left").select(
        "p_partkey",
        F.coalesce(F.col("dim_id"), F.concat(F.lit("new:"), F.md5(F.col("p_brand")))).alias("linked_id"),
        F.col("dim_id").isNull().alias("is_new"),
    )


@query(
    "j8_edge_upsert_merge",
    """SELECT COALESCE(n.l_orderkey, o.l_orderkey) AS parent_id,
              COALESCE(n.l_partkey, o.l_partkey) AS child_id,
              CAST(COALESCE(n.l_quantity, o.l_quantity) AS DOUBLE) AS weight,
              CASE WHEN n.l_orderkey IS NULL THEN 'kept'
                   WHEN o.l_orderkey IS NULL THEN 'inserted'
                   ELSE 'updated' END AS merge_action
       FROM (SELECT * FROM lineitem WHERE l_linenumber = 1) o
       FULL OUTER JOIN (SELECT * FROM lineitem WHERE l_linenumber = 2) n
         ON o.l_orderkey = n.l_orderkey AND o.l_partkey = n.l_partkey""",
)
def j8_edge_upsert_merge(spark, sf_dir):
    """J8 — edge upsert: MERGE INTO edges USING new ON (parent, child)
    WHEN MATCHED UPDATE weight WHEN NOT MATCHED INSERT
    (artifact_ingestor_service.py:1086-1106), expressed as a full-outer
    merge join (Iceberg MERGE INTO compiles to the same plan)."""
    li = _t(spark, sf_dir, "lineitem")
    old = li.where("l_linenumber = 1").alias("o")
    new = li.where("l_linenumber = 2").alias("n")
    return old.join(
        new,
        (F.col("o.l_orderkey") == F.col("n.l_orderkey"))
        & (F.col("o.l_partkey") == F.col("n.l_partkey")),
        "full_outer",
    ).select(
        F.coalesce(F.col("n.l_orderkey"), F.col("o.l_orderkey")).alias("parent_id"),
        F.coalesce(F.col("n.l_partkey"), F.col("o.l_partkey")).alias("child_id"),
        F.coalesce(F.col("n.l_quantity"), F.col("o.l_quantity")).cast("double").alias("weight"),
        F.when(F.col("n.l_orderkey").isNull(), "kept")
        .when(F.col("o.l_orderkey").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


@query(
    "j9_hierarchy_norm_name",
    """SELECT l.l_orderkey, l.l_linenumber, p.p_name, s.s_name
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       WHERE contains(replace(lower(p.p_name), ' ', ''), 'redwidget')""",
)
def j9_hierarchy_norm_name(spark, sf_dir):
    """J9 — hierarchy 3-way join with normalized-name predicate
    (global_node_hierarchy_repository.py:42-50)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(norm_name(F.col("p_name")).contains("redwidget"))
        .select("l_orderkey", "l_linenumber", "p_name", "s_name")
    )


@query(
    "a2_ordered_rollup",
    """SELECT l_orderkey,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
              string_agg(CAST(l_linenumber AS VARCHAR) || ':' ||
                         CAST(CAST(l_quantity AS INT) AS VARCHAR), ','
                         ORDER BY l_linenumber, l_quantity) AS pagewise
       FROM lineitem GROUP BY l_orderkey""",
)
def a2_ordered_rollup(spark, sf_dir):
    """A2 — file-level rollup: running sum + ORDERED per-page breakdown
    (file_analysis_service.py:775-789). Order is made deterministic by
    sorting the collected struct list (W2 invariant)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        _sum2("l_quantity", "total_qty"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber", "l_quantity"))),
                lambda s: F.concat_ws(
                    ":",
                    s["l_linenumber"].cast("string"),
                    s["l_quantity"].cast("int").cast("string"),
                ),
            ),
            ",",
        ).alias("pagewise"),
    )


@query(
    "a6_distinct_dims",
    """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders""",
)
def a6_distinct_dims(spark, sf_dir):
    """A6 — DISTINCT dimension projections (artifact_repository.py:97-133)."""
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderpriority", "o_orderstatus").distinct()


@query(
    "a7_degree_count",
    """SELECT nodekey, count(*) AS degree FROM (
         SELECT l_partkey AS nodekey FROM lineitem
         UNION ALL SELECT l_suppkey AS nodekey FROM lineitem
       ) GROUP BY nodekey HAVING count(*) > 50""",
)
def a7_degree_count(spark, sf_dir):
    """A7 — edge-degree count with OR predicate (parent=:id OR child=:id,
    node_hierarchy_repository.py:32-40) = union both endpoints, count."""
    li = _t(spark, sf_dir, "lineitem")
    deg = (
        li.select(F.col("l_partkey").alias("nodekey"))
        .unionAll(li.select(F.col("l_suppkey").alias("nodekey")))
        .groupBy("nodekey")
        .agg(F.count("*").alias("degree"))
        .where("degree > 50")
    )
    return deg


@query(
    "w2_ordered_sequence",
    """SELECT user_id,
              string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
       FROM events GROUP BY user_id""",
)
def w2_ordered_sequence(spark, sf_dir):
    """W2 — ordered-sequence preservation: per-key event journey in strict
    (ts, id) order; the span-sequence invariant re-expressed relationally
    (file_analysis_service.py:604,760-773)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("journey")
    )


@query(
    "j10_salted_skew_join",
    """WITH dim AS (SELECT l_returnflag, count(*) AS rf_total
                    FROM lineitem GROUP BY l_returnflag)
       SELECT l.l_returnflag, d.rf_total, count(*) AS n,
              CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
       FROM lineitem l JOIN dim d ON l.l_returnflag = d.l_returnflag
       GROUP BY l.l_returnflag, d.rf_total""",
)
def j10_salted_skew_join(spark, sf_dir):
    """Skew-salted equi-join on a 3-value hot key (l_returnflag carries
    ~33% of the fact table each — the 'Water' hub shape from SURVEY §4):
    big side salted 8 ways by payload xxhash64, small side replicated per
    salt, join key becomes (key, salt) so no task owns a hot key's full
    mass. The oracle is the PLAIN join — value-proof that salting is pure
    plan shaping. qty_sum over BIGINT-cast integral quantities (doubles
    holding exact integers; never a float SUM cross-engine)."""
    from ..operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_quantity"
    )
    dim = li.groupBy("l_returnflag").agg(F.count("*").alias("rf_total"))
    return (
        salted_join(li, dim, "l_returnflag", salts=8)
        .groupBy("l_returnflag", "rf_total")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        )
    )


@query(
    "j11_bucketed_colocated_join",
    """SELECT c.c_mktsegment, count(*) AS n_orders,
              CAST(sum(o.o_orderkey) AS BIGINT) AS key_sum,
              count(DISTINCT o.o_custkey) AS n_custs
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment""",
)
def j11_bucketed_colocated_join(spark, sf_dir):
    """Co-located join through bucketed storage: both sides written
    bucketed by the join key (sources/bucketed.py — the parquet-native
    analog of Iceberg's bucket(doc_id) transform SURVEY §2.1/S6 names),
    then equi-joined with ZERO Exchange on either side (plan-gated by
    tests/test_bucketed.py; this row value-checks the storage round-trip
    against the plain DuckDB join). At 100 TB this converts the
    every-ingest shuffle of the stable side into a one-time write cost."""
    import tempfile

    from ..sources.bucketed import bucketed_join, write_bucketed

    # FIXED table names + mode(overwrite): repeated invocations (driver
    # correctness rounds, local sweeps, plan audits) replace the catalog
    # entries instead of accumulating two new permanent tables per run;
    # the external data path is still a fresh tmp dir per call so a lazy
    # consumer of the previous call's DataFrame keeps readable files.
    base = tempfile.mkdtemp(prefix="bucketed_q_")
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    write_bucketed(o, "orders_b_contract", "custkey", 8, path=f"{base}/orders")
    write_bucketed(c, "customer_b_contract", "custkey", 8, path=f"{base}/customer")
    j = bucketed_join(spark, "orders_b_contract", "customer_b_contract", "custkey")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").alias("key_sum"),
        F.countDistinct("custkey").alias("n_custs"),
    )


@query(
    "w8_range_join",
    """SELECT w.event_id AS win_id, w.user_id AS win_user, w.ts AS win_start,
              c.event_id AS click_id, c.user_id AS click_user, c.ts AS click_ts
       FROM events w JOIN events c
         ON w.event_type = 'purchase' AND c.event_type = 'click'
        AND c.ts >= w.ts AND c.ts < w.ts + INTERVAL 1800 SECONDS""",
)
def w8_range_join(spark, sf_dir):
    """KEYLESS range join (temporal.range_join): every click inside any
    purchase's 30-minute attribution window, across all users — the shape
    Spark plans as a BroadcastNestedLoopJoin when written naively (no
    equi-key at all). The operator quantizes time into 600 s buckets,
    explodes each window over the <=4 buckets it overlaps, equi-joins on
    the bucket, and re-filters exactly — so the oracle is the PLAIN
    inequality join (bucketing is physical, not semantic) and any
    lost/duplicated pair hash-mismatches. Shuffle is by time bucket:
    time-local, even under uniform load, no key skew possible."""
    from ..operators.temporal import range_join

    e = _t(spark, sf_dir, "events")
    wins = e.where("event_type = 'purchase'").select(
        F.col("event_id").alias("win_id"),
        F.col("user_id").alias("win_user"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1800 SECONDS")).alias("win_end"),
    )
    clicks = e.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    return range_join(
        clicks, wins, "click_ts", "win_start", "win_end", bucket_width=600.0
    ).select("win_id", "win_user", "win_start", "click_id", "click_user", "click_ts")


@query(
    "w10_interval_coalesce",
    """WITH iv AS (
         SELECT event_type, ts AS s, ts + INTERVAL 15 MINUTE AS e
         FROM events
         WHERE event_type IS NOT NULL AND ts IS NOT NULL),
       sw AS (
         SELECT event_type, s, e,
                CASE WHEN max(e) OVER (
                       PARTITION BY event_type ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     IS NULL
                     OR s > max(e) OVER (
                       PARTITION BY event_type ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS opens
         FROM iv),
       sp AS (
         SELECT event_type, s, e,
                sum(opens) OVER (
                  PARTITION BY event_type ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
         FROM sw)
       SELECT event_type, min(s) AS span_start, max(e) AS span_end,
              CAST(count(*) AS BIGINT) AS n_merged
       FROM sp GROUP BY event_type, span""",
)
def w10_interval_coalesce(spark, sf_dir):
    """Sweep-line interval coalescing (temporal.interval_coalesce): every
    event opens a 15-minute activity window per event_type; overlapping-
    or-touching windows merge into maximal disjoint busy spans with a
    merge count. At sf0.01 the ~21-minute median inter-event gap per type
    leaves a mix of merged runs and singletons, so the gate checks both
    branches of the open/extend decision; at sf0.1 the same query is
    merge-heavy. ONE hash exchange on the key feeds both windows and the
    final groupBy."""
    from ..operators.temporal import interval_coalesce

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
    )
    return interval_coalesce(ev, "event_type", "s", "e")


@query(
    "a9_rollup_report",
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_qty,
              CAST(count(*) AS BIGINT) AS n_rows
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def a9_rollup_report(spark, sf_dir):
    """Hierarchical rollup (A-family): flag x status subtotals, per-flag
    subtotals, and the grand total in ONE pass — Spark's native
    rollup()/grouping_id() (Expand + one algebraic agg, partials combine
    map-side so the exchange carries group rows only; never one scan per
    level). gid disambiguates a real NULL dimension value from a
    rolled-up one — both engines put the first rollup column in the high
    bit. Double sums route through DECIMAL(18,2) per repo doctrine."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        _sum2("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "a10_pivot_report",
    """SELECT l_returnflag,
              CAST(sum(CASE WHEN l_linestatus = 'F'
                       THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                   AS DOUBLE) AS qty_f,
              CAST(sum(CASE WHEN l_linestatus = 'O'
                       THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                   AS DOUBLE) AS qty_o
       FROM lineitem GROUP BY l_returnflag""",
)
def a10_pivot_report(spark, sf_dir):
    """Long-to-wide pivot (A-family): quantity by return flag with one
    column per line status — Spark's groupBy().pivot() with the value
    list PINNED (["F", "O"]): an unpinned pivot runs a hidden distinct
    collect over the pivot column to discover headers, a driver
    round-trip and a nondeterministic column order a 100 TB job should
    never pay. With pinned values the plan is one algebraic agg, exactly
    the oracle's conditional-sum form."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(_sum2("l_quantity", "q"))
    )
    return out.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


@query(
    "w11_sessionize",
    """WITH e AS (
         SELECT user_id, ts, event_id,
                lag(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
         FROM events
         WHERE user_id IS NOT NULL AND ts IS NOT NULL
           AND event_id IS NOT NULL),
       o AS (
         SELECT user_id, ts, event_id,
                CASE WHEN prev IS NULL
                       OR date_diff('microsecond', prev, ts) > 25200000000
                     THEN 1 ELSE 0 END AS opens
         FROM e)
       SELECT user_id, ts, event_id,
              CAST(sum(opens) OVER (PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
       FROM o""",
)
def w11_sessionize(spark, sf_dir):
    """Batch sessionization (temporal.sessionize): gap > 7h opens a new
    per-user session — 7h sits at the median inter-event gap of the
    synthetic log, so roughly half the rows take each branch of the
    open/extend decision. Pure integer microsecond arithmetic
    (unix_micros / date_diff), event_id breaks timestamp ties; ONE hash
    exchange on the key feeds the lag window and the cumulative sum in
    a single per-partition sort — the per-event twin of the streaming
    session_window aggregate (w5)."""
    from ..operators.temporal import sessionize

    return sessionize(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_id", 25200
    )


@query(
    "a11_decayed_agg",
    """WITH b AS (SELECT event_type AS key, epoch_us(ts) AS us, value AS v
                  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
       a AS (SELECT max(us) AS anchor FROM b)
       SELECT key, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(1000000 >> CAST(least((a.anchor - b.us) // 86400000000 // 4,
                                             62) AS INT)) AS BIGINT) AS decayed_count_ppm,
              CAST(sum(CAST(CAST(b.v AS DECIMAL(18,2)) * 100 AS BIGINT)
                       * (1000000 >> CAST(least((a.anchor - b.us) // 86400000000 // 4,
                                                62) AS INT))) AS BIGINT)
                AS decayed_value_cents_ppm
       FROM b, a GROUP BY key""",
)
def a11_decayed_agg(spark, sf_dir):
    """Half-life recency weighting (stats.half_life_decayed): per
    event-type decayed counts and decayed value mass, weight halving
    every 4 days of age before the corpus's newest event — trending
    scores / source-reputation decay in EXACT integer arithmetic
    (weight = 1e6 >> (age_days div 4); value on the cents*ppm BIGINT
    grid), so the sums are order/partitioning/engine-invariant where
    float exponential decay would not be. One scalar anchor job + ONE
    algebraic aggregation; the 30-day event span crosses ~7 halving
    boundaries so every weight branch carries mass."""
    from ..operators.stats import half_life_decayed

    return half_life_decayed(
        _t(spark, sf_dir, "events"), "event_type", "ts", 4, value_col="value"
    )


@query(
    "w12_gap_fill",
    """WITH b AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS bucket,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events
           WHERE event_id % 37 = 0 AND event_type IS NOT NULL AND ts IS NOT NULL),
       bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b),
       keys AS (SELECT DISTINCT key FROM b),
       spine AS (SELECT key, unnest(generate_series(bounds.lo, bounds.hi)) AS bucket
                 FROM keys, bounds),
       agg AS (SELECT key, bucket, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(cents) AS BIGINT) AS vc
               FROM b GROUP BY 1, 2)
       SELECT s.key, s.bucket, COALESCE(a.n, 0) AS n,
              COALESCE(a.vc, 0) AS value_cents
       FROM spine s LEFT JOIN agg a ON a.key = s.key AND a.bucket = s.bucket""",
)
def w12_gap_fill(spark, sf_dir):
    """Time-series gap-fill (temporal.gap_fill): a dense hourly spine per
    event type over a sparse event slice (event_id % 37), zero-filled
    where nothing happened — the resample every rolling-window/drift/
    anomaly consumer needs, because a MISSING hour is a signal a sparse
    frame hides. Bucket arithmetic in exact integer µs (NTZ-safe
    timestampdiff), value mass on the BIGINT cents grid; the spine is a
    per-key sequence explode (narrow — never a crossJoin/BNLJ). The
    slice leaves ~92% of spine cells empty at sf0.01 and ~44% at sf0.1,
    so the zero-fill and aggregate branches both carry mass at both
    scale factors."""
    from ..operators.temporal import gap_fill

    return gap_fill(
        _t(spark, sf_dir, "events").where("event_id % 37 = 0"),
        "event_type", "ts", 3_600_000_000, value_col="value",
    )


@query(
    "w13_rolling_window",
    """WITH b AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS bucket,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events
           WHERE event_id % 37 = 0 AND event_type IS NOT NULL AND ts IS NOT NULL),
       bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b),
       keys AS (SELECT DISTINCT key FROM b),
       spine AS (SELECT key, unnest(generate_series(bounds.lo, bounds.hi)) AS bucket
                 FROM keys, bounds),
       agg AS (SELECT key, bucket, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(cents) AS BIGINT) AS vc
               FROM b GROUP BY 1, 2),
       filled AS (SELECT s.key, s.bucket, COALESCE(a.n, 0) AS n,
                         COALESCE(a.vc, 0) AS value_cents
                  FROM spine s LEFT JOIN agg a
                    ON a.key = s.key AND a.bucket = s.bucket)
       SELECT key, bucket, n, value_cents,
              CAST(sum(n) OVER w AS BIGINT) AS n_roll,
              CAST(sum(value_cents) OVER w AS BIGINT) AS value_cents_roll
       FROM filled
       WINDOW w AS (PARTITION BY key ORDER BY bucket
                    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""",
)
def w13_rolling_window(spark, sf_dir):
    """Trailing 24-hour rolling sums (temporal.rolling_window) over the
    gap-filled hourly spine of w12 — the composition that makes ROWS
    frames MEAN time windows: on the dense spine, 24 rows == 24 hours,
    including the zero-filled gaps a sparse frame would silently skip.
    One key-partitioned window (never global) computes every rolling
    column on one exchange; all sums on the exact BIGINT cents grid."""
    from ..operators.temporal import gap_fill, rolling_window

    filled = gap_fill(
        _t(spark, sf_dir, "events").where("event_id % 37 = 0"),
        "event_type", "ts", 3_600_000_000, value_col="value",
    )
    return rolling_window(filled, "key", "bucket", ["n", "value_cents"], 23)
