"""validate_triples / verbalize_triples: rule-by-rule known answers."""

from __future__ import annotations

import pytest

from entity_extractor_spark.operators.kg_quality import (
    validate_triples,
    verbalize_triples,
)

TRIPLES = [
    # subj, pred, obj, weight
    ("O1", "containsPart", "7", "12.5"),
    ("O1", "containsPart", "9", None),        # weight_missing
    ("O1", "placedBy", "3", None),
    ("O2", "containsPrt", "7", "1.0"),        # unknown_pred
    ("O2", "placedBy", "4", "5"),             # weight_forbidden
    ("O2", "placedBy", "5", None),            # functional_dup (with ^)
    ("O3", "containsPart", "7", "150"),       # weight_range (>100)
    ("O3", "containsPart", "8", "junk"),      # weight_range (unparseable)
    ("X4", "placedBy", "1", None),            # subj_format
]
SCHEMA = "subj string, pred string, obj string, weight_percent string"


def test_validate_triples_every_rule(spark):
    df = spark.createDataFrame(TRIPLES, SCHEMA)
    out = {(r.subj, r.pred, r.obj, r.rule) for r in validate_triples(
        df,
        allowed_preds=["containsPart", "placedBy"],
        weight_preds=["containsPart"],
        functional_preds=["placedBy"],
        subj_pattern=r"^O[0-9]+$",
    ).collect()}
    assert out == {
        ("O1", "containsPart", "9", "weight_missing"),
        ("O2", "containsPrt", "7", "unknown_pred"),
        ("O2", "placedBy", "4", "weight_forbidden"),
        ("O2", "placedBy", "4", "functional_dup"),
        ("O2", "placedBy", "5", "functional_dup"),
        ("O3", "containsPart", "7", "weight_range"),
        ("O3", "containsPart", "8", "weight_range"),
        ("X4", "placedBy", "1", "subj_format"),
    }


def test_validate_triples_clean_table_is_empty(spark):
    df = spark.createDataFrame(
        [("O1", "containsPart", "7", "12.5"), ("O1", "placedBy", "3", None)], SCHEMA
    )
    assert validate_triples(
        df, ["containsPart", "placedBy"], ["containsPart"], ["placedBy"], r"^O[0-9]+$"
    ).count() == 0


def test_validate_triples_requires_preds(spark):
    with pytest.raises(ValueError):
        validate_triples(None, [])


def test_verbalize_triples_sorted_and_complete(spark):
    df = spark.createDataFrame(
        [
            ("O1", "containsPart", "10", "2.0"),
            ("O1", "containsPart", "9", "1.5"),
            ("O1", "containsPart", "9", None),
            ("O1", "placedBy", "3", None),
            ("O2", "containsPart", "1", "7.0"),  # no placedBy -> dropped
            ("O3", "placedBy", "5", None),       # no items -> dropped
        ],
        SCHEMA,
    )
    rows = {r.subj: (r.text, r.n_facts) for r in verbalize_triples(
        df, "placedBy", "containsPart",
        frame=("Order ", " was placed by customer ", ". Contains "),
        item_template=("part ", " (", "%)"),
    ).collect()}
    # numeric item order: 9 before 10; same part sorted by rendered phrase
    assert rows == {
        "O1": (
            "Order O1 was placed by customer 3. Contains part 9, "
            "part 9 (1.5%), part 10 (2.0%).",
            3,
        )
    }


def test_match_path_directions_and_bindings(spark):
    from entity_extractor_spark.operators.kg_quality import match_path

    t = spark.createDataFrame(
        [
            ("O1", "placedBy", "C1", None),
            ("O1", "containsPart", "P1", "1"),
            ("O1", "containsPart", "P2", "2"),
            ("O2", "placedBy", "C1", None),
            ("O2", "containsPart", "P2", "3"),
            ("O3", "containsPart", "P9", None),  # no placedBy -> no binding
        ],
        SCHEMA,
    )
    # customer <-placedBy- order -containsPart-> part
    got = {(r.v0, r.v1, r.v2) for r in match_path(
        t, [("placedBy", "rev"), ("containsPart", "fwd")]).collect()}
    assert got == {
        ("C1", "O1", "P1"), ("C1", "O1", "P2"), ("C1", "O2", "P2"),
    }


def test_match_path_distinct_nodes_excludes_cycles(spark):
    from entity_extractor_spark.operators.kg_quality import match_path

    t = spark.createDataFrame(
        [("a", "knows", "b", None), ("b", "knows", "a", None),
         ("b", "knows", "c", None)],
        SCHEMA,
    )
    steps = [("knows", "fwd"), ("knows", "fwd")]
    allp = {(r.v0, r.v1, r.v2) for r in match_path(t, steps).collect()}
    assert allp == {("a", "b", "a"), ("a", "b", "c"), ("b", "a", "b")}
    nocyc = {(r.v0, r.v1, r.v2) for r in match_path(
        t, steps, distinct_nodes=True).collect()}
    assert nocyc == {("a", "b", "c")}


def test_match_path_validates(spark):
    from entity_extractor_spark.operators.kg_quality import match_path

    with pytest.raises(ValueError):
        match_path(None, [])
    with pytest.raises(ValueError):
        match_path(None, [("p", "sideways")])


def test_validate_triples_null_pred_and_subj_are_flagged(spark):
    from entity_extractor_spark.operators.kg_quality import validate_triples

    df = spark.createDataFrame(
        [("O1", None, "5", None), (None, "placedBy", "3", None)], SCHEMA
    )
    out = {(r.subj, r.pred, r.rule) for r in validate_triples(
        df, ["containsPart", "placedBy"], ["containsPart"], ["placedBy"],
        r"^O[0-9]+$",
    ).collect()}
    assert ("O1", None, "unknown_pred") in out
    assert (None, "placedBy", "subj_format") in out
