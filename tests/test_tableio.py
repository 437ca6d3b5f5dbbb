"""Table-format seam: MERGE statement generation is always tested; the
execution paths run only where an Iceberg runtime jar + catalog exist
(this container ships neither, so they skip — the parquet lineage path
stays the tested default, byte-identical with the jar absent)."""

from __future__ import annotations

import pytest

from entity_extractor_spark.plans import tableio as T


def test_merge_sql_shape():
    sql = T.merge_upsert_sql(
        "cat.db.edges", "src", ["subj_id", "pred", "obj_id"], ["weight_percent"]
    )
    assert sql == (
        "MERGE INTO cat.db.edges t USING src s "
        "ON t.subj_id = s.subj_id AND t.pred = s.pred AND t.obj_id = s.obj_id "
        "WHEN MATCHED THEN UPDATE SET t.weight_percent = s.weight_percent "
        "WHEN NOT MATCHED THEN INSERT (subj_id, pred, obj_id, weight_percent) "
        "VALUES (s.subj_id, s.pred, s.obj_id, s.weight_percent)"
    )
    with pytest.raises(ValueError):
        T.merge_upsert_sql("t", "s", [], ["w"])


def test_iceberg_absent_is_detected(spark):
    # this container has no Iceberg jar: the seam must report that and the
    # pipeline must keep using the parquet lineage path
    assert T.iceberg_available(spark) is False


def test_iceberg_roundtrip_when_available(spark, tmp_path):
    if not T.iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar/catalog in this environment")
    import pyspark.sql.functions as F  # noqa: F401

    t = "local.db.edges_test"
    base = spark.createDataFrame(
        [("a", "hasChemical", "c1", 10)],
        "subj_id string, pred string, obj_id string, weight_percent int",
    )
    T.commit_stage_table(spark, base, t)
    upd = spark.createDataFrame(
        [("a", "hasChemical", "c1", 25), ("b", "hasChemical", "c2", 5)],
        "subj_id string, pred string, obj_id string, weight_percent int",
    )
    T.merge_upsert(spark, t, upd, ["subj_id", "pred", "obj_id"], ["weight_percent"])
    rows = sorted(
        (r.subj_id, r.weight_percent) for r in spark.read.table(t).collect()
    )
    assert rows == [("a", 25), ("b", 5)]  # matched updated, unmatched inserted
