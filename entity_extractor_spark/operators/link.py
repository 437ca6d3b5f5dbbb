"""Stages s4 (entity linking) + s5 (canonicalization) for chemicals.

The reference links each chemical observation sequentially: by
(cas_number, manufacturer_id) first, else (exact name, manufacturer_id),
else creates a node; on a match it merges PFAS status/source through the
transition lattice and unconditionally overwrites cas_number
(artifact_ingestor_service.py:1027-1084). Replayed set-at-a-time:

  1. atoms: per manufacturer, a name-atom per surface name and a cas-atom
     per CAS; each observation carrying a CAS contributes one
     name-atom <-> cas-atom equivalence edge;
  2. connected components over those edges = chemical entities (the
     fixpoint of the reference's dynamic CAS/name linking — see
     tests/test_oracle_equivalence for where sequential order could
     diverge and why the corpus constraints make the fixpoint exact);
  3. each observation resolves to the component of its cas-atom when
     present else its name-atom (J5 priority), else stays its own
     singleton — W3 first-match-wins is subsumed by component identity;
  4. per-component ordered lattice fold (applyInPandas) reproduces the
     sequential status/source merge; canonical name = first observation's
     name (node-creation semantics), final cas = last observation's cas
     (unconditional overwrite, :1083).

Scale: the fold state domain is 3 statuses x 5 sources = 15 states, so a
hub component's fold is parallelizable by composing per-chunk state
transition tables associatively (tree reduction); the grouped fold below is
the simple form — swap point documented for when single components exceed
one task's memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.lattice import TransitionError, fold_observation
from .graph import connected_components

_SEP = "\x1f"


def _atom_cols(obs: DataFrame) -> DataFrame:
    return obs.withColumn(
        "name_atom", F.concat_ws(_SEP, F.lit("N"), F.col("manufacturer_id"), F.col("chemical_name"))
    ).withColumn(
        "cas_atom",
        F.when(
            F.col("cas_number").isNotNull(),
            F.concat_ws(_SEP, F.lit("C"), F.col("manufacturer_id"), F.col("cas_number")),
        ),
    )


def assign_clusters(obs: DataFrame, existing_nodes: DataFrame | None = None) -> DataFrame:
    """observations -> observations + cluster column (canonical entity key).

    existing_nodes (prior ingest) contribute their own name/cas atoms and
    equivalence edges so re-ingest MERGEs into existing identities."""
    obs = _atom_cols(obs)
    edges = obs.where(F.col("cas_atom").isNotNull()).select(
        F.col("name_atom").alias("src"), F.col("cas_atom").alias("dst")
    )
    if existing_nodes is not None:
        en = existing_nodes.where(F.col("node_type") == "CHEMICAL").select(
            F.concat_ws(_SEP, F.lit("N"), F.col("manufacturer_id"), F.col("name")).alias("src"),
            F.when(
                F.col("cas_number").isNotNull(),
                F.concat_ws(_SEP, F.lit("C"), F.col("manufacturer_id"), F.col("cas_number")),
            ).alias("dst"),
        ).where(F.col("dst").isNotNull())
        edges = edges.union(en)
    comp = connected_components(edges.distinct())

    cas_comp = comp.withColumnRenamed("vertex", "cas_atom").withColumnRenamed("component", "cas_cluster")
    name_comp = comp.withColumnRenamed("vertex", "name_atom").withColumnRenamed("component", "name_cluster")
    return (
        obs.join(cas_comp, "cas_atom", "left")
        .join(name_comp, "name_atom", "left")
        .withColumn(
            "cluster",
            F.coalesce(
                F.when(F.col("cas_atom").isNotNull(), F.col("cas_cluster")),
                F.col("name_cluster"),
                F.col("name_atom"),
            ),
        )
        .drop("cas_cluster", "name_cluster")
    )


_FOLD_SCHEMA = StructType(
    [
        StructField("cluster", StringType(), False),
        StructField("name", StringType(), False),
        StructField("cas_number", StringType(), True),
        StructField("manufacturer_id", StringType(), False),
        StructField("pfas_status", StringType(), False),
        StructField("pfas_information_source", StringType(), False),
        StructField("n_dropped", StringType(), True),
    ]
)


def fold_chemical_nodes(clustered: DataFrame) -> DataFrame:
    """Per-cluster ordered lattice fold -> one chemical node per cluster.

    Observations are replayed in (doc_id, seq) order — the reference's queue
    order. A TransitionError drops the observation (the reference rolls back
    the whole doc, :609-612; the corpus generator keeps error transitions
    out of e2e data, and `n_dropped` surfaces any occurrence)."""

    def fold(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "seq"], kind="mergesort")
        state = None
        name = None
        cas = None
        dropped = 0
        for row in pdf.itertuples(index=False):
            try:
                new_state = fold_observation(state, row.tag, row.source)
            except TransitionError:
                dropped += 1
                continue
            if state is None:
                name = row.chemical_name
            state = new_state
            cas = row.cas_number if pd.notna(row.cas_number) else None
        if state is None:  # every observation dropped
            return pd.DataFrame(columns=[f.name for f in _FOLD_SCHEMA.fields])
        return pd.DataFrame(
            {
                "cluster": [key[0]],
                "name": [name],
                "cas_number": [cas],
                "manufacturer_id": [pdf["manufacturer_id"].iloc[0]],
                "pfas_status": [state[0]],
                "pfas_information_source": [state[1]],
                "n_dropped": [str(dropped)],
            }
        )

    return clustered.select(
        "cluster", "doc_id", "seq", "chemical_name", "cas_number",
        "tag", "source", "manufacturer_id",
    ).groupBy("cluster").applyInPandas(fold, schema=_FOLD_SCHEMA)


def chemical_edges(clustered: DataFrame) -> DataFrame:
    """J8 — hasChemical edge per (material, chemical cluster); weight is the
    last observation's composition in replay order (edge upsert semantics,
    artifact_ingestor_service.py:1086-1106). max_by over a (doc_id, seq)
    struct = one shuffle, map-side combinable."""
    return clustered.groupBy("material_id", "cluster").agg(
        F.max_by(
            "weight_percent", F.struct(F.col("doc_id"), F.col("seq"))
        ).alias("chemical_weight_percent")
    )
