"""Table-format (Iceberg) integration behind the lineage interface.

SURVEY §8 maps the reference's upsert sinks (S7/J8: per-doc
`session.commit()` in utils/mysql.py:12-41) to MERGE INTO on an Iceberg
table; the offline fallback — parquet stage dirs with tmp-rename commits
(plans/lineage.py) — is what ships in this container, which carries no
Iceberg runtime jar. This module is the seam between the two:

  * `iceberg_available(spark)` detects the runtime (JVM class probe +
    a configured Spark catalog whose implementation is Iceberg's);
  * `commit_stage_table(...)` atomically replaces a stage output as an
    Iceberg table (snapshot commit == the tmp-rename of lineage.py);
  * `merge_upsert(...)` runs the J8 edge upsert as a real MERGE INTO —
    matched rows update their payload columns, unmatched insert — and
    `merge_upsert_sql(...)` builds that statement (unit-tested always,
    executed only where the runtime exists).

Nothing in the batch/streaming pipeline calls Iceberg unconditionally:
callers pick the path via `iceberg_available` (see
tests/test_tableio.py, skipped without the jar), so the parquet
lineage behavior is byte-identical when the jar is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """True iff the Iceberg runtime is loadable on the JVM AND the given
    Spark catalog is configured with Iceberg's SparkCatalog. The class
    probe goes through Spark's Utils.classForName — which consults the
    session's mutable URL classloader — so jars added at runtime via
    --packages / spark.jars.packages are seen; a bare
    java.lang.Class.forName would resolve against py4j's system loader and
    false-negative exactly those deployments."""
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.iceberg.catalog.Catalog", False, False
        )
    except Exception:
        try:
            spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        except Exception:
            return False
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return impl is not None and "iceberg" in impl.lower()


def commit_stage_table(
    spark: SparkSession, df: DataFrame, table: str
) -> DataFrame:
    """Atomic stage commit as an Iceberg table: createOrReplace is ONE
    snapshot swap (readers never see a partial stage), the table-format
    twin of lineage.commit_stage's tmp-dir rename. Returns the committed
    table read back so downstream consumes the snapshot, not the plan."""
    df.writeTo(table).using("iceberg").createOrReplace()
    return spark.read.table(table)


def merge_upsert_sql(
    target: str, source_view: str, keys: list[str], payload_cols: list[str]
) -> str:
    """MERGE INTO statement for the J8 edge-upsert semantics: the (subj,
    pred, obj) identity matches -> payload (weight etc.) takes the source
    value (last-write-wins, reference KgEdgeService update path);
    no match -> insert. Pure string builder so the statement shape is
    testable without the runtime."""
    if not keys or not payload_cols:
        raise ValueError("keys and payload_cols must be non-empty")
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in payload_cols)
    cols = ", ".join(keys + payload_cols)
    vals = ", ".join(f"s.{c}" for c in keys + payload_cols)
    return (
        f"MERGE INTO {target} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def merge_upsert(
    spark: SparkSession,
    target: str,
    source: DataFrame,
    keys: list[str],
    payload_cols: list[str],
) -> None:
    """Execute the J8 upsert as a real Iceberg MERGE (row-level ACID
    commit). The source registers as a temp view; Iceberg turns the MERGE
    into a copy-on-write/merge-on-read snapshot — the scale path for
    continuously-upserted edge tables (no read-modify-write of the whole
    table like the parquet fallback's unionByName+window dedupe). The
    source view name is unique per call so two concurrent upserts in one
    SparkSession (two streams' foreachBatch) cannot clobber each other's
    source between registration and MERGE execution."""
    import uuid

    view = f"_merge_src_{uuid.uuid4().hex}"
    source.createOrReplaceTempView(view)
    try:
        spark.sql(merge_upsert_sql(target, view, keys, payload_cols))
    finally:
        spark.catalog.dropTempView(view)
