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


# ----------------------------------------------------- entity summarization --

SUMMARY_SCHEMA = "subj string, pred string, obj string"


def test_summarize_entities_rarity_rank_and_per_pred_cap(spark):
    from entity_extractor_spark.operators.kg_quality import summarize_entities

    t = spark.createDataFrame(
        [
            # (p, common) asserted by 3 subjects -> fact_df = 3
            ("A", "p", "common"), ("B", "p", "common"), ("C", "p", "common"),
            # A-only facts -> fact_df = 1
            ("A", "p", "rare1"), ("A", "p", "rare2"), ("A", "q", "x"),
            ("A", "p", "rare1"),  # duplicate row: fact_df must stay 1
        ],
        SUMMARY_SCHEMA,
    )
    out = {
        (r.subj, r.fact_rank): (r.pred, r.obj, r.fact_df)
        for r in summarize_entities(t, k=2, per_pred=1).collect()
        if r.subj == "A"
    }
    # per_pred=1 keeps only p's rarest fact (rare1 < rare2 lexically),
    # so rank 2 goes to (q, x) and (p, common) never makes the card.
    assert out == {("A", 1): ("p", "rare1", 1), ("A", 2): ("q", "x", 1)}


def test_summarize_entities_no_cap_orders_by_df_then_pred_obj(spark):
    from entity_extractor_spark.operators.kg_quality import summarize_entities

    t = spark.createDataFrame(
        [("A", "p", "common"), ("B", "p", "common"), ("C", "p", "common"),
         ("A", "p", "rare1"), ("A", "p", "rare2"), ("A", "q", "x")],
        SUMMARY_SCHEMA,
    )
    got = [
        (r.pred, r.obj, r.fact_df)
        for r in sorted(
            summarize_entities(t, k=4).collect(),
            key=lambda r: (r.subj, r.fact_rank),
        )
        if r.subj == "A"
    ]
    assert got == [
        ("p", "rare1", 1), ("p", "rare2", 1), ("q", "x", 1),
        ("p", "common", 3),
    ]


def test_summarize_entities_validates(spark):
    from entity_extractor_spark.operators.kg_quality import summarize_entities

    with pytest.raises(ValueError):
        summarize_entities(None, k=0)
    with pytest.raises(ValueError):
        summarize_entities(None, k=3, per_pred=0)


# ------------------------------------------------------------- rule mining --


def _rule_fixture(spark):
    rows = [
        # p: 3 pairs
        ("a", "p", "b"), ("c", "p", "d"), ("e", "p", "f"),
        ("a", "p", "b"),  # duplicate: must not inflate any count
        # q: subset of p (1 pair)
        ("a", "q", "b"),
        # r: inverse of p on 2 pairs
        ("b", "r", "a"), ("d", "r", "c"),
        # s: symmetric predicate
        ("m", "s", "n"), ("n", "s", "m"),
    ]
    return spark.createDataFrame(rows, SUMMARY_SCHEMA)


def test_mine_rules_known_answers(spark):
    from entity_extractor_spark.operators.kg_quality import mine_rules

    got = {
        (r.body_pred, r.head_pred, r.direction): (r.body_n, r.support, r.conf_ppm)
        for r in mine_rules(_rule_fixture(spark)).collect()
    }
    assert got == {
        ("q", "p", "fwd"): (1, 1, 1_000_000),   # q => p always holds
        ("p", "q", "fwd"): (3, 1, 333_333),     # p => q on 1/3 pairs
        ("p", "r", "inv"): (3, 2, 666_666),     # p(x,y) => r(y,x) on 2/3
        ("r", "p", "inv"): (2, 2, 1_000_000),   # r is exactly inverse-p
        ("q", "r", "inv"): (1, 1, 1_000_000),
        ("r", "q", "inv"): (2, 1, 500_000),
        ("s", "s", "inv"): (2, 2, 1_000_000),   # symmetry detection
    }


def test_mine_rules_min_support_filters(spark):
    from entity_extractor_spark.operators.kg_quality import mine_rules

    got = {
        (r.body_pred, r.head_pred, r.direction)
        for r in mine_rules(_rule_fixture(spark), min_support=2).collect()
    }
    assert got == {("p", "r", "inv"), ("r", "p", "inv"), ("s", "s", "inv")}


def test_mine_rules_validates(spark):
    from entity_extractor_spark.operators.kg_quality import mine_rules

    with pytest.raises(ValueError):
        mine_rules(None, min_support=0)


# --------------------------------------------------------- rule application --


def test_infer_edges_fires_rules_and_skips_existing(spark):
    from entity_extractor_spark.operators.kg_quality import infer_edges

    facts = spark.createDataFrame(
        [("a", "p", "b"), ("c", "p", "d"), ("b", "r", "a"),
         ("a", "p", "b")],  # duplicate row must not matter
        SUMMARY_SCHEMA,
    )
    rules = spark.createDataFrame(
        [("p", "r", "inv", 500_000), ("p", "q", "fwd", 700_000),
         ("r", "p", "inv", 1_000_000), ("p", "w", "fwd", 100_000)],
        "body_pred string, head_pred string, direction string, conf_ppm bigint",
    )
    got = {
        (r.subj, r.pred, r.obj): (r.rule_body, r.rule_direction, r.conf_ppm)
        for r in infer_edges(facts, rules, min_conf_ppm=500_000).collect()
    }
    # r(b,a) and p(a,b) already exist -> anti-joined away; the 100k-ppm
    # rule is below threshold so no w triples appear.
    assert got == {
        ("a", "q", "b"): ("p", "fwd", 700_000),
        ("c", "q", "d"): ("p", "fwd", 700_000),
        ("d", "r", "c"): ("p", "inv", 500_000),
    }


def test_infer_edges_provenance_argmax_tiebreak(spark):
    from entity_extractor_spark.operators.kg_quality import infer_edges

    facts = spark.createDataFrame(
        [("a", "p", "b"), ("a", "w", "b")], SUMMARY_SCHEMA
    )
    rules = spark.createDataFrame(
        [("p", "z", "fwd", 600_000), ("w", "z", "fwd", 600_000),
         ("p", "y", "fwd", 900_000), ("w", "y", "fwd", 300_000)],
        "body_pred string, head_pred string, direction string, conf_ppm bigint",
    )
    got = {
        (r.subj, r.pred, r.obj): (r.rule_body, r.conf_ppm)
        for r in infer_edges(facts, rules, min_conf_ppm=0).collect()
    }
    # equal confidence -> lexicographically greatest rule_body wins ('w');
    # unequal -> the higher-confidence derivation wins regardless of body.
    assert got == {
        ("a", "z", "b"): ("w", 600_000),
        ("a", "y", "b"): ("p", 900_000),
    }


def test_infer_edges_validates(spark):
    from entity_extractor_spark.operators.kg_quality import infer_edges

    with pytest.raises(ValueError):
        infer_edges(None, None, min_conf_ppm=-1)
    with pytest.raises(ValueError):
        infer_edges(None, None, min_conf_ppm=1_000_001)


# --------------------------------------------------------- type entailment --


def test_entail_types_rdfs_rules_and_basis_priority(spark):
    from entity_extractor_spark.operators.kg_quality import entail_types

    triples = spark.createDataFrame(
        [("e1", "p", "e2"), ("e3", "p", "e1")], SUMMARY_SCHEMA
    )
    asserted = spark.createDataFrame([("e1", "B")], "entity string, cls string")
    subclass = spark.createDataFrame(
        [("A", "B"), ("B", "C")], "sub string, sup string"
    )
    domains = spark.createDataFrame([("p", "A")], "pred string, cls string")
    ranges = spark.createDataFrame([("p", "X")], "pred string, cls string")
    got = {
        (r.entity, r.cls): r.basis
        for r in entail_types(triples, asserted, subclass, domains, ranges).collect()
    }
    # e1 reaches B both asserted and via subclass-of-A: 'asserted' wins;
    # C arrives only through the 2-hop closure lift.
    assert got == {
        ("e1", "A"): "domain", ("e1", "B"): "asserted",
        ("e1", "C"): "subclass", ("e1", "X"): "range",
        ("e2", "X"): "range",
        ("e3", "A"): "domain", ("e3", "B"): "subclass",
        ("e3", "C"): "subclass",
    }


def test_entail_types_validates(spark):
    from entity_extractor_spark.operators.kg_quality import entail_types

    with pytest.raises(ValueError):
        entail_types(None, None, None, None, None)
