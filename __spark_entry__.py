"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship KG-construction run — span-ifies the sf0.001
  documents table into the interleaved (doc_id, spans) shape fixed by
  BASELINE.json input_hint, runs the full pipeline (extract -> link ->
  canonicalize -> propagate), returns the triples DataFrame.
- queries(): one entry per implemented operator (SURVEY.md §2 + the
  training-data operators), each (spark, sf_dir) -> DataFrame.
- oracle_sql(): DuckDB-runnable ANSI SQL equivalents (identical column
  names/types); genuinely non-SQL ops (LSH band hashing, hyperplane
  probing, the KG pipeline itself) are omitted => rows-only check, with
  exact-match correctness enforced against the pure-Python reference
  oracle in tests/ instead.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_extractor_spark import contract
from entity_extractor_spark.plans.pipeline import run_pipeline

SF0001 = "/root/testdata/sf0.001"


def _spanify(docs: DataFrame) -> DataFrame:
    """Deterministically reshape the driver documents table
    (doc_id,text,lang,source,...) into the interleaved-span input shape:
    header + composition lines derived from the row, body text chunk,
    image span — all built-in column ops."""
    word = lambda i: F.split(F.trim(F.col("text")), r"\s+")[i]  # noqa: E731
    header = F.concat(
        F.lit("Mat "), F.col("doc_id").cast("string"),
        F.lit(" manufactured by "), F.col("source"), F.lit(" Works, City-"),
        F.col("lang"), F.lit(", Country-"), F.col("lang"),
    )
    comp1 = F.concat(
        word(0), F.lit(" alpha CAS 10"), F.pmod(F.col("doc_id"), 90).cast("string"),
        F.lit("-11-1 12.5% PFAS src=NONE"),
    )
    comp2 = F.concat(
        word(1), F.lit(" beta CAS 20"), F.pmod(F.col("doc_id"), 70).cast("string"),
        F.lit("-22-2 3.4% NO_PFAS src=OECD"),
    )
    span = lambda k, t, m, o: F.struct(  # noqa: E731
        F.lit(k).alias("kind"), t.alias("text"), F.lit(m).alias("media_ref"),
        F.lit(o).cast("int").alias("offset"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            span("text", header, "", 0),
            span("text", comp1, "", 1),
            F.struct(
                F.lit("image").alias("kind"), F.lit("").alias("text"),
                F.concat(F.lit("blob://"), F.col("doc_id").cast("string"), F.lit("/img_0.png")).alias("media_ref"),
                F.lit(2).cast("int").alias("offset"),
            ),
            span("text", comp2, "", 3),
            span("text", F.col("text"), "", 4),
        ).alias("spans"),
    )


def entry(spark: SparkSession) -> DataFrame:
    docs = _spanify(spark.read.parquet(f"{SF0001}/documents.parquet"))
    out = tempfile.mkdtemp(prefix="kg_entry_")
    tables = run_pipeline(spark, docs, out)
    return tables["triples"].select("subj", "pred", "obj", "weight_percent")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.Q)


def oracle_sql() -> dict[str, str]:
    return dict(contract.SQL)
