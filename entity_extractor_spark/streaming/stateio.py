"""Shared state-dir IO for the streaming accumulators (ingest + dedup).

All probes for "does accumulated state exist yet?" go through the Spark
reader, never driver-local os.path — the state dirs stay portable to any
Hadoop URI (hdfs://, s3a://), which is the deployment the streaming
modules pitch. Reference analog: the accumulating graph DB the queue
consumer merges into (processors/queue.py:157-201)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_glob(spark: SparkSession, schema, pattern: str) -> DataFrame | None:
    """Glob read that returns None when no matching dir/file exists yet
    (instead of raising PATH_NOT_FOUND)."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.schema(schema).parquet(pattern)
        df.schema  # force path resolution so a missing glob raises here
        return df
    except AnalysisException:
        return None
