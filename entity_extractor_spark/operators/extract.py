"""Stage s3 — deterministic triple extraction (the reference's LLM
extraction replaced by pattern rules, SURVEY.md §2.8 X1/X2; payload schema =
dto/msds_openai_response.py:7-25 + dto/chemical_dto.py:21-29).

Everything here is built-in column functions (regexp_extract over exploded
text spans) — JVM-side, codegen'd, filter-pushdown friendly. Semantics
reproduced:
  * first header span (lowest offset) per doc wins; docs without a header
    or with zero chemical lines are dropped (validation,
    artifact_ingestor_service.py:793-803);
  * display-name compose F5 (:725-742);
  * last-wins same-name chemical dedupe within a doc, but with the FIRST
    occurrence's position (python dict update keeps insertion order —
    :788-791 `{chem.chemical_name: chem}`);
  * first-document-wins material identity (J7, :979-989) — the probe key is
    (normalized display name, exact manufacturer name); losing docs are
    skipped entirely (exception => per-doc rollback, :609-612).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import cas_trim_or_null, display_name, entity_id, norm_name

# ~2M 60-byte keys ~ 120 MB broadcast — comfortably inside executor/driver
# budgets; past this the anti-join falls back to a shuffle (AQE may still
# pick broadcast while the actual build side stays small).
EXISTING_KEYS_BROADCAST_MAX = 2_000_000

HEADER_RE = (
    r"^(.*?)(?: \(P/N ([^)]*)\))?(?: \(UPC ([^)]*)\))?"
    r" manufactured by ([^,]*), ([^,]*), ([^,]*)$"
)
COMP_RE = r"^(.*?) CAS ([0-9\-]+|-) ([0-9.]+)% (PFAS|NO_PFAS|PENDING) src=([A-Z]+)$"


def text_spans(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.explode("spans").alias("span")
    ).where(F.col("span.kind") == "text").select(
        "doc_id",
        F.col("span.offset").alias("offset"),
        F.col("span.text").alias("text"),
    )


def parse_headers(spans: DataFrame) -> DataFrame:
    """One material header per doc: first matching span by offset."""
    # cheap substring prefilter first: the lazy-quantifier header regex
    # backtracks on long non-matching noise lines, so only run it on spans
    # that can possibly match (predicate order is preserved by codegen).
    h = spans.where(F.col("text").contains(" manufactured by ") & F.col("text").rlike(HEADER_RE))
    w = Window.partitionBy("doc_id").orderBy("offset")
    h = h.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")
    ex = lambda i: F.regexp_extract("text", HEADER_RE, i)  # noqa: E731
    return h.select(
        "doc_id",
        ex(1).alias("material_name"),
        ex(2).alias("product_number"),
        ex(3).alias("upc_number"),
        ex(4).alias("manufacturer_name"),
        ex(5).alias("manufacturer_city"),
        ex(6).alias("manufacturer_country"),
    ).withColumn(
        "display_name",
        display_name(F.col("material_name"), F.col("product_number"), F.col("upc_number")),
    )


def parse_chemicals(spans: DataFrame, headers: DataFrame) -> DataFrame:
    """Chemical observation lines, deduped last-wins per (doc, name) with
    first-occurrence ordering (A5). Header spans are excluded from the
    chemical scan by construction (a header line can't match COMP_RE)."""
    c = spans.where(F.col("text").contains(" CAS ") & F.col("text").rlike(COMP_RE))
    ex = lambda i: F.regexp_extract("text", COMP_RE, i)  # noqa: E731
    obs = c.select(
        "doc_id",
        F.col("offset").alias("seq"),
        ex(1).alias("chemical_name"),
        cas_trim_or_null(ex(2)).alias("cas_number"),
        ex(3).alias("weight_percent"),
        ex(4).alias("tag"),
        ex(5).alias("source"),
    )
    # A5: values from the LAST occurrence, position of the FIRST occurrence
    w = Window.partitionBy("doc_id", "chemical_name")
    obs = (
        obs.withColumn("first_seq", F.min("seq").over(w))
        .withColumn("last_seq", F.max("seq").over(w))
        .where(F.col("seq") == F.col("last_seq"))
        .select(
            "doc_id",
            F.col("first_seq").alias("seq"),
            "chemical_name",
            "cas_number",
            "weight_percent",
            "tag",
            "source",
        )
    )
    return obs.join(headers.select("doc_id"), "doc_id", "left_semi")


def winner_docs(headers: DataFrame, chem_counts: DataFrame, existing_material_keys: DataFrame | None = None) -> DataFrame:
    """Validation + J7 first-document-wins.

    headers plus at-least-one-chemical docs compete per material key
    (norm(display_name), manufacturer_name); the minimum doc_id wins, every
    other doc is dropped whole. Docs whose key already exists in
    `existing_material_keys(mat_key)` (prior ingest / MERGE) all lose."""
    valid = headers.join(chem_counts, "doc_id", "left_semi").withColumn(
        "mat_key", F.concat_ws("\x1f", norm_name(F.col("display_name")), F.col("manufacturer_name"))
    )
    if existing_material_keys is not None:
        # The accumulated key set grows monotonically under streaming
        # re-ingest (every batch adds materials), so an UNCONDITIONAL
        # broadcast would eventually hit the driver/broadcast ceiling and
        # fail every later batch. Probe the size once (the graph.py /
        # mentions.py adaptive-cutoff convention) and fall back to a plain
        # shuffled anti-join — AQE still broadcasts it while it is small.
        keys = existing_material_keys.select("mat_key")
        if keys.count() <= EXISTING_KEYS_BROADCAST_MAX:
            keys = F.broadcast(keys)
        valid = valid.join(keys, "mat_key", "left_anti")
    w = Window.partitionBy("mat_key").orderBy("doc_id")
    return valid.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")


def manufacturers_table(winners: DataFrame) -> DataFrame:
    """J6 — exact-name manufacturer dedupe; attributes from the first
    (lowest doc_id) winner doc naming it (save_manufacturer,
    artifact_ingestor_service.py:991-1008). Deterministic id from the name."""
    w = Window.partitionBy("manufacturer_name").orderBy("doc_id")
    return (
        winners.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            entity_id(F.lit("manu"), F.col("manufacturer_name"), F.lit("")).alias("id"),
            F.col("manufacturer_name").alias("name"),
            F.col("manufacturer_city").alias("city"),
            F.col("manufacturer_country").alias("country"),
        )
    )


def materials_table(winners: DataFrame) -> DataFrame:
    """Material nodes (one per winner doc) with deterministic ids from the
    identity key (reference mints uuid4, :1010-1025; see functions.core
    entity_id). Status starts PENDING/NONE and is overwritten by s6."""
    return winners.select(
        entity_id(F.lit("mat"), F.col("mat_key"), F.lit("")).alias("id"),
        F.col("display_name").alias("name"),
        F.lit("MATERIAL").alias("node_type"),
        F.lit(None).cast("string").alias("cas_number"),
        entity_id(F.lit("manu"), F.col("manufacturer_name"), F.lit("")).alias("manufacturer_id"),
        F.lit("PENDING").alias("pfas_status"),
        F.lit("NONE").alias("pfas_information_source"),
        "doc_id",
        "mat_key",
        "manufacturer_name",
    )


def observations(winners: DataFrame, chems: DataFrame) -> DataFrame:
    """Chemical observations of winner docs, with material/manufacturer ids
    attached — the input to linking (s4/s5)."""
    return chems.join(
        winners.select(
            "doc_id",
            entity_id(F.lit("mat"), F.col("mat_key"), F.lit("")).alias("material_id"),
            entity_id(F.lit("manu"), F.col("manufacturer_name"), F.lit("")).alias("manufacturer_id"),
        ),
        "doc_id",
    )
