"""constraint_audit gates: exact violation counts, strict NULL-counts-as-
violation semantics, one-pass plan shape (no joins, single exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.audit import constraint_audit


def test_counts_and_ppm(spark):
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "id long, v long"
    )
    out = constraint_audit(
        df,
        {
            "v_below_3": F.col("v") < 3,
            "id_nonneg": F.col("id") >= 0,
            "never": F.lit(False),
        },
    ).collect()
    by = {r["rule"]: r for r in out}
    assert by["v_below_3"]["violations"] == 25
    assert by["v_below_3"]["violation_ppm"] == 250_000
    assert by["id_nonneg"]["violations"] == 0
    assert by["never"]["violations"] == 100
    assert all(r["total_rows"] == 100 for r in out)


def test_null_counts_as_violation(spark):
    df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
    out = constraint_audit(df, {"v_pos": F.col("v") > 0}).head()
    assert out["violations"] == 1  # the NULL row


def test_rejects_empty_rules(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError):
        constraint_audit(df, {})


def test_single_pass_plan(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    plan = constraint_audit(
        df, {"a": F.col("v") > 0, "b": F.col("v") < 5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1
