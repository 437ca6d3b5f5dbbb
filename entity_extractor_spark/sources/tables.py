"""Table sources/sinks (SURVEY.md §2.1 S1-S8) behind one thin interface.

The pipeline targets Iceberg on a real deployment (atomic snapshot commits,
partition transforms like bucket(N, doc_id), MERGE INTO); this sandbox has
no Iceberg runtime JAR, so the same contract is implemented over parquet
directories with tmp-dir-rename commits (plans/lineage.py). Everything
Iceberg-specific is isolated HERE so swapping the backend touches one file
(SURVEY.md §7 risk (b)).

S1 folder-crawl source  -> read_documents (catalog scan; resume = partition
                           predicate instead of next_page_link)
S3 blob/PDF reader      -> read_binary_documents (binaryFile source; the
                           OCR/decode step is environment-gated)
S5 gazetteer source     -> read_gazetteer (tiny dimension, broadcast side)
S6/S7/S8 sinks          -> write_table (atomic overwrite; MERGE semantics
                           live in the stage logic, see operators/link.py)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..schemas import DOCUMENTS_SCHEMA, GAZETTEER_SCHEMA


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """S1 — the interleaved documents table (input_hint shape). Schema is
    pinned, not inferred: predicate pushdown + column pruning reach the
    parquet/Iceberg scan (reference analog: folder_reader_service.py:93-160).
    For the paginated-crawl resume itself (T3, next_page_link) see
    sources/crawl.py: deterministic file-listing cursor with per-page
    atomic commits."""
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)


def read_binary_documents(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S3 — raw binary ingestion (file_analysis_service.py:268-358). Returns
    (path, modificationTime, length, content:binary); the PDF->page-image->
    OCR step (S4) requires external services/libs not present in this
    environment — decode via mapInPandas is stubbed at the operator layer
    (operators/multimodal.py)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_gazetteer(spark: SparkSession, path: str | None, rows: list[dict] | None = None) -> DataFrame:
    """S5 — keyword dictionary (keywords_service.py:35-47): tiny dimension,
    always the broadcast side of the mention join."""
    if rows is not None:
        return spark.createDataFrame(
            [(r["keyword"], r["mtype"]) for r in rows], schema=GAZETTEER_SCHEMA
        )
    return spark.read.schema(GAZETTEER_SCHEMA).json(path)


def write_table(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """S6/S7 — atomic table write: stage to _tmp, rename into place (the
    parquet stand-in for an Iceberg snapshot commit)."""
    tmp = path + "._tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    w = df.repartition(partitions) if partitions else df
    w.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
