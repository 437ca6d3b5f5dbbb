"""Stage s6 — PFAS status/source propagation from chemicals to materials.

reference: after every chemical save the service re-resolves every material
containing that chemical (artifact_ingestor_service.py:1108-1145,
:1259-1282); since a material's resolution depends only on the CURRENT
states of its chemicals, the final fixpoint equals ONE fold over final
chemical states — a single groupBy, no iteration needed (SURVEY.md §7.6).

A3 (status): YES if any child YES; NO if no YES and no PENDING; else
PENDING (:827-845) — expressed as max over the rank NO=0 < PENDING=1 <
YES=2, decoded back. A4 (source): first source with count>0 in the
status-dependent preference order, counted over children whose status
equals the resolved status (:846-879) — expressed as a min over preference
ranks. Both are algebraic aggregates: map-side combine absorbs hub-material
skew; everything stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def resolve_materials(edges: DataFrame, chem_nodes: DataFrame) -> DataFrame:
    """edges(material_id, cluster, weight) x chem_nodes(cluster, status,
    source) -> (material_id, pfas_status, pfas_information_source)."""
    status_rank = (
        F.when(F.col("pfas_status") == "YES", 2)
        .when(F.col("pfas_status") == "PENDING", 1)
        .otherwise(0)
    )
    child = edges.join(
        chem_nodes.select("cluster", "pfas_status", "pfas_information_source"), "cluster"
    ).withColumn("status_rank", status_rank)

    resolved = child.groupBy("material_id").agg(
        F.max("status_rank").alias("max_rank")
    ).withColumn(
        "pfas_status",
        F.when(F.col("max_rank") == 2, "YES")
        .when(F.col("max_rank") == 1, "PENDING")
        .otherwise("NO"),
    )

    # A4: preference rank depends on the resolved status
    joined = child.join(resolved.select("material_id", "pfas_status").withColumnRenamed(
        "pfas_status", "resolved_status"
    ), "material_id").where(F.col("pfas_status") == F.col("resolved_status"))

    pref_pending = (
        F.when(F.col("pfas_information_source") == "OECD", 0)
        .when(F.col("pfas_information_source") == "VAI", 1)
        .when(F.col("pfas_information_source") == "MANUAL", 2)
    )
    pref_other = (
        F.when(F.col("pfas_information_source") == "VAI", 0)
        .when(F.col("pfas_information_source") == "OECD", 1)
        .when(F.col("pfas_information_source") == "MANUAL", 2)
    )
    joined = joined.withColumn(
        "pref_rank",
        F.when(F.col("resolved_status") == "PENDING", pref_pending).otherwise(pref_other),
    )
    best = joined.where(F.col("pref_rank").isNotNull()).groupBy("material_id").agg(
        F.min("pref_rank").alias("best_rank"),
        F.first("resolved_status").alias("resolved_status"),
    ).withColumn(
        "pfas_information_source",
        F.when(F.col("resolved_status") == "PENDING",
               F.when(F.col("best_rank") == 0, "OECD").when(F.col("best_rank") == 1, "VAI").otherwise("MANUAL"))
        .otherwise(
            F.when(F.col("best_rank") == 0, "VAI").when(F.col("best_rank") == 1, "OECD").otherwise("MANUAL")
        ),
    )

    return resolved.select("material_id", "pfas_status").join(
        best.select("material_id", "pfas_information_source"), "material_id", "left"
    ).fillna({"pfas_information_source": "NONE"})
