"""Structured-Streaming ingest — the reference's queue-consumer path
(S2: utils/azure_queue.py:18-21 + 20 polling daemon threads run.py:67-72,
dispatch processors/queue.py:157-201) re-expressed as a file-source stream
of document batches processed with foreachBatch.

Semantics reproduced:
  * at-least-once delivery + idempotent processing (T5): the streaming
    checkpoint gives deterministic batch ids; each batch runs the batch
    pipeline into its own lineage dir with resume=True, so a redelivered /
    restarted batch skips every stage it already committed;
  * sequential coupling (the reference processes files one-by-one against
    the graph built so far): each batch passes the ACCUMULATED node table
    as `existing_nodes`, so material identities are first-batch-wins (J7)
    and chemical nodes are adopted + lattice-folded from their prior state
    (exact DFA sequence split — see operators/link.py assign_clusters);
  * visibility-timeout lease (T1) needs no analog: Spark task retry +
    idempotent stage commits cover redelivery.

Scale notes: one micro-batch = one run of the batch DAG (all-stage
parallelism applies within a batch); the accumulator is a parquet dir
partitioned by batch (each batch overwrites only its own subdir =>
idempotent under reprocessing). On Iceberg the accumulator is a MERGE INTO
per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import run_pipeline
from ..schemas import DOCUMENTS_SCHEMA
from .stateio import compact_batches, read_glob, read_state

ACC_SCHEMA = (
    "id string, name string, node_type string, cas_number string, "
    "manufacturer_id string, manufacturer_name string, "
    "pfas_status string, pfas_information_source string"
)


def queue_stream(spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of documents parquet: every new file under
    input_dir is an arriving queue message batch."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def _acc_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "nodes_acc")


def read_accumulated_nodes(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Current accumulated node state of a streaming ingest dir (newest
    compaction + live batch tail), or None before the first batch."""
    # Probes go through the Spark reader (not driver-local os.path) so the
    # accumulator works on any Hadoop URI; reads see the newest compaction
    # plus the live batch tail (stateio.read_state).
    df = read_state(spark, ACC_SCHEMA, _acc_dir(out_dir))
    return None if df is None else df.drop("_batch")


def compact_nodes(spark: SparkSession, out_dir: str) -> None:
    """Compact the node accumulator's batch subdirs into one dir so the
    per-batch glob read stays O(1) in stream lifetime (the last-wins batch
    order survives as the materialized _batch column)."""
    compact_batches(spark, ACC_SCHEMA, _acc_dir(out_dir))


def process_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    gazetteer: list[dict] | None = None,
) -> dict[str, DataFrame]:
    """One micro-batch through the batch DAG, merging into prior state."""
    bdir = os.path.join(out_dir, f"batch_{batch_id:06d}")
    existing = read_accumulated_nodes(spark, out_dir)
    tables = run_pipeline(
        spark, batch_df, bdir, gazetteer=gazetteer, existing_nodes=existing
    )
    # accumulate this batch's node identities (material rows keep their
    # manufacturer_name: the J7 identity probe needs it); overwrite-by-batch
    # subdir => reprocessing the same batch id is a no-op
    mats = tables["materials"].select(
        "id", "name", "node_type", "cas_number", "manufacturer_id",
        "manufacturer_name", "pfas_status", "pfas_information_source",
    )
    chems = tables["chem_nodes"].select(
        F.col("chem_id").alias("id"),
        "name",
        F.lit("CHEMICAL").alias("node_type"),
        "cas_number",
        "manufacturer_id",
        F.lit(None).cast("string").alias("manufacturer_name"),
        "pfas_status",
        "pfas_information_source",
    )
    mats.unionByName(chems).write.mode("overwrite").parquet(
        os.path.join(_acc_dir(out_dir), f"batch_{batch_id:06d}")
    )
    return tables


def streaming_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    gazetteer: list[dict] | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    compact_every: int | None = None,
):
    """Start the ingest stream; with available_now=True processes the
    backlog then stops (the batch-test trigger). Returns the StreamingQuery.
    compact_every=K folds the node accumulator's batch subdirs into one
    compact dir every K batches (stateio commit protocol — crash-safe)."""
    stream = queue_stream(spark, input_dir, max_files_per_trigger)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        process_batch(spark, batch_df, int(batch_id), out_dir, gazetteer)
        if compact_every and (int(batch_id) + 1) % compact_every == 0:
            compact_nodes(spark, out_dir)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def consolidated(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Cross-batch consolidated graph tables.

    nodes: chemical rows keep only their LATEST batch state (each batch
    re-folded from the prior state, so the last write per id is the total
    fold); material rows are unique by construction (first-batch-wins).
    triples: union of per-batch triples; hasChemical edges deduped to the
    latest batch's weight (J8 upsert), evidencedBy/manufacturedBy are
    append-only and unique."""
    nodes = read_state(spark, ACC_SCHEMA, _acc_dir(out_dir))
    if nodes is None:
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    nodes = nodes.withColumnRenamed("_batch", "_b")
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("_b"))
    nodes = (
        nodes.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn", "_b")
    )

    # ONE glob scan over every committed batch's triples (a per-batch union
    # loop grows the plan linearly with batch count — at thousands of
    # micro-batches that is a driver/lineage bottleneck); the batch id is
    # derived from the file path, exactly as the nodes read above.
    from ..schemas import TRIPLES_SCHEMA

    triples = read_glob(
        spark, TRIPLES_SCHEMA, os.path.join(out_dir, "batch_*", "triples")
    )
    if triples is not None:
        triples = triples.withColumn(
            # INT batch id (a string compare mis-orders once ids reach 7
            # digits: 'batch_1000000' < 'batch_999999' lexicographically),
            # anchored to the parquet file's own parent chain so an out_dir
            # containing /batch_NNN/ can't hijack the id
            "_b",
            F.regexp_extract(
                F.input_file_name(), r"/batch_(\d+)/triples/[^/]*$", 1
            ).cast("int"),
        )
    if triples is not None:
        wt = Window.partitionBy("subj_id", "pred", "obj_id").orderBy(F.desc("_b"))
        triples = (
            triples.withColumn("_rn", F.row_number().over(wt))
            .where("_rn = 1")
            .drop("_rn", "_b")
        )

    # Material statuses depend on the CURRENT states of their chemicals
    # (the reference re-resolves affected materials after every chemical
    # update, artifact_ingestor_service.py:1108-1145); recompute the A3/A4
    # fold globally over consolidated edges + final chemical states.
    if triples is not None:
        from ..operators.propagate import resolve_materials

        chem_states = nodes.where("node_type = 'CHEMICAL'").select(
            F.col("id").alias("cluster"), "pfas_status", "pfas_information_source"
        )
        edges = triples.where("pred = 'hasChemical'").select(
            F.col("subj_id").alias("material_id"), F.col("obj_id").alias("cluster")
        )
        resolved = resolve_materials(edges, chem_states)
        mats = (
            nodes.where("node_type = 'MATERIAL'")
            .drop("pfas_status", "pfas_information_source")
            .join(resolved, F.col("id") == resolved["material_id"], "left")
            .drop("material_id")
            .fillna({"pfas_status": "PENDING", "pfas_information_source": "NONE"})
        )
        nodes = mats.select(*[c for c in nodes.columns]).unionByName(
            nodes.where("node_type = 'CHEMICAL'")
        )
    return {"nodes": nodes, "triples": triples}
