"""Review/update path — the reference's `save_msds` else-branch
(artifact_ingestor_service.py:559-607): a human-reviewed analysis is applied
back onto an existing graph.

Reference control flow, per review (sequential, in queue order):
  1. for every hierarchy CHILD chemical of the reviewed material, the first
     review chemical with the same lowercase name merges into the node via
     the F12 source lattice (determine_and_set_the_chemical_pfas_info_
     source_and_status, :1237-1257);
  2. after EVERY child (matched or not), every material containing that
     child is re-resolved from its children's current states
     (update_the_material_based_on_chemical_status_and_source, :1259-1282);
  3. finally the reviewed material's own status/source is overwritten with
     the resolve over the review's chemical list itself
     (determine_and_update_material_pfas_status, :901-913) — this runs last
     in the request, so it wins over step 2 for the reviewed material.

Batch fixpoint (what one Spark pass computes): because a re-resolve depends
only on CURRENT chemical states and fires again on every later change to
any child, the sequential loop's final state is
  * chemicals: lattice fold of their matched review observations in
    review_seq order over their prior state (invalid transitions drop and
    are counted, same policy as fold_chemical_nodes — the reference aborts
    the whole request instead, :1244-1249);
  * a material whose LAST touching event is its own review: resolve over
    that review's chemical list (step 3);
  * a material whose last touching event is a shared-child trigger from a
    later review: resolve over its children's FINAL states;
  * untouched materials: unchanged.

Everything is joins + grouped algebraic aggregates + one JVM aggregate()
fold over per-chemical observation arrays (reviews per chemical are few —
human review volume — so the array fold never sees hub skew). The only
shuffles are keyed on chem_id / material_id. Sequential-equivalence is
pinned by tests/test_review.py against oracle.replay_reviews.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .link import _PAIRS_SQL, _TAG_STATUS, _TRANS_SQL
from .propagate import resolve_children, resolve_materials

# one-state-in, one-state-out lattice fold over review observations
# (same transition map / status-replacing pairs as the ingest fold)
_REVIEW_FOLD = f"""
aggregate(
  obs,
  named_struct('status', init_status, 'source', init_source, 'dropped', 0),
  (acc, o) -> CASE
    WHEN coalesce(element_at({_TRANS_SQL}, concat(acc.source, '_', coalesce(o.source, 'NONE'))), '') = ''
      THEN named_struct('status', acc.status, 'source', acc.source, 'dropped', acc.dropped + 1)
    ELSE named_struct(
      'status', CASE WHEN concat(acc.source, '_', coalesce(o.source, 'NONE')) IN ({_PAIRS_SQL})
                     THEN {_TAG_STATUS.format(o='o')} ELSE acc.status END,
      'source', element_at({_TRANS_SQL}, concat(acc.source, '_', coalesce(o.source, 'NONE'))),
      'dropped', acc.dropped)
  END
)
"""

_TAG_TO_STATUS = (
    lambda c: F.when(c == "PFAS", "YES").when(c == "NO_PFAS", "NO").otherwise("PENDING")
)


def apply_review(
    nodes: DataFrame,
    edges: DataFrame,
    reviews: DataFrame,
    review_chems: DataFrame,
) -> DataFrame:
    """Apply reviewed analyses to the node table; returns the updated table
    (same columns, new pfas_status / pfas_information_source).

    nodes: (id, name, node_type in MATERIAL|CHEMICAL, pfas_status,
           pfas_information_source, ...passthrough)
    edges: hasChemical hierarchy (material_id, chem_id)
    reviews: (review_seq long — queue/arrival order, material_id); reviews
             of unknown materials are skipped (reference :562-566)
    review_chems: (review_seq, chem_seq — position in the review's list,
                   chemical_name, tag, source)
    """
    mats = nodes.where(F.col("node_type") == "MATERIAL")
    chems = nodes.where(F.col("node_type") == "CHEMICAL")

    valid = reviews.join(
        mats.select(F.col("id").alias("material_id")), "material_id"
    ).select("review_seq", "material_id")

    # children of each reviewed material
    rchildren = valid.join(edges, "material_id").select(
        "review_seq", "material_id", "chem_id"
    )

    # lowercase-name match; the FIRST review row in list order wins per
    # (review, chemical) — reference next(...) over the chemicals list
    matched = (
        rchildren.join(
            chems.select(F.col("id").alias("chem_id"), F.lower("name").alias("_lname")),
            "chem_id",
        )
        .join(
            review_chems.withColumn("_lname", F.lower("chemical_name")),
            ["review_seq", "_lname"],
        )
        .groupBy("review_seq", "chem_id")
        # (tag, source) break chem_seq ties deterministically — positions
        # can't tie in a real review list, but synthesized inputs may
        .agg(F.min(F.struct("chem_seq", "tag", "source")).alias("o"))
        .select("review_seq", "chem_id", F.col("o.tag").alias("tag"), F.col("o.source").alias("source"))
    )

    # per-chemical ordered fold from the node's current state
    folded = (
        matched.select(
            "chem_id",
            F.struct(
                F.col("review_seq").alias("review_seq"),
                F.col("tag").alias("tag"),
                F.col("source").alias("source"),
            ).alias("o"),
        )
        .groupBy("chem_id")
        .agg(F.array_sort(F.collect_list("o")).alias("obs"))
        .join(
            chems.select(
                F.col("id").alias("chem_id"),
                F.col("pfas_status").alias("init_status"),
                F.col("pfas_information_source").alias("init_source"),
            ),
            "chem_id",
        )
        .select("chem_id", F.expr(_REVIEW_FOLD).alias("st"))
        .select(
            "chem_id",
            F.col("st.status").alias("_new_status"),
            F.col("st.source").alias("_new_source"),
        )
    )

    # final chemical states (updated or unchanged)
    chem_states = (
        chems.select(F.col("id").alias("cluster"), "pfas_status", "pfas_information_source")
        .join(folded.withColumnRenamed("chem_id", "cluster"), "cluster", "left")
        .select(
            "cluster",
            F.coalesce("_new_status", "pfas_status").alias("pfas_status"),
            F.coalesce("_new_source", "pfas_information_source").alias("pfas_information_source"),
        )
    )

    # shared-child triggers: every material containing ANY child of a
    # reviewed material is re-resolved (matched or not, reference :594-601)
    trig = (
        rchildren.select("review_seq", "chem_id")
        .join(edges, "chem_id")
        .groupBy("material_id")
        .agg(F.max("review_seq").alias("_last_trigger"))
    )
    last_rev = valid.groupBy("material_id").agg(F.max("review_seq").alias("_last_review"))

    # step-3 override value: resolve over the review's OWN chemical list
    per_review = resolve_children(
        review_chems.select(
            F.col("review_seq").alias("material_id"),
            _TAG_TO_STATUS(F.col("tag")).alias("pfas_status"),
            F.col("source").alias("pfas_information_source"),
        )
    ).select(
        F.col("material_id").alias("_rseq"),
        F.col("pfas_status").alias("_ov_status"),
        F.col("pfas_information_source").alias("_ov_source"),
    )
    override = last_rev.join(
        per_review, last_rev["_last_review"] == per_review["_rseq"], "left"
    ).select(
        "material_id",
        "_last_review",
        # review with an empty chemical list resolves to (NO, NONE)
        F.coalesce("_ov_status", F.lit("NO")).alias("_ov_status"),
        F.coalesce("_ov_source", F.lit("NONE")).alias("_ov_source"),
    )

    # graph re-resolve from FINAL chemical states, affected materials only
    affected_edges = edges.join(trig.select("material_id"), "material_id").select(
        "material_id", F.col("chem_id").alias("cluster")
    )
    re_res = resolve_materials(affected_edges, chem_states).select(
        "material_id",
        F.col("pfas_status").alias("_rr_status"),
        F.col("pfas_information_source").alias("_rr_source"),
    )

    mat_updates = (
        trig.join(override, "material_id", "outer")
        .join(re_res, "material_id", "left")
        .select(
            F.col("material_id").alias("id"),
            F.when(
                F.col("_last_review").isNotNull()
                & (F.col("_last_trigger").isNull() | (F.col("_last_review") >= F.col("_last_trigger"))),
                F.col("_ov_status"),
            ).otherwise(F.col("_rr_status")).alias("_new_status"),
            F.when(
                F.col("_last_review").isNotNull()
                & (F.col("_last_trigger").isNull() | (F.col("_last_review") >= F.col("_last_trigger"))),
                F.col("_ov_source"),
            ).otherwise(F.col("_rr_source")).alias("_new_source"),
        )
    )

    updates = folded.select(
        F.col("chem_id").alias("id"), "_new_status", "_new_source"
    ).unionByName(mat_updates)

    out_cols = nodes.columns
    return (
        nodes.join(updates, "id", "left")
        .withColumn("pfas_status", F.coalesce("_new_status", "pfas_status"))
        .withColumn(
            "pfas_information_source", F.coalesce("_new_source", "pfas_information_source")
        )
        .select(*out_cols)
    )
