from __future__ import annotations

import pytest

from entity_extractor_spark.operators.kg_quality import (
    functional_violations,
    property_closure,
)

T = [
    ("a", "adj", "b"),
    ("b", "adj", "a"),  # also symmetric-derivable: asserted must win
    ("x", "anc", "y"),
    ("y", "anc", "z"),
    ("o1", "placedBy", "c1"),
    ("s", "adj", "s"),  # self-loop: dropped from the closure
]


def test_property_closure_known_answer(spark):
    df = spark.createDataFrame(T, ["subj", "pred", "obj"])
    out = property_closure(
        df,
        symmetric=("adj",),
        inverse_of=(("placedBy", "hasOrder"), ("anc", "desc")),
        transitive=("anc",),
    )
    got = {(r.subj, r.pred, r.obj): r.basis for r in out.collect()}
    assert got == {
        ("a", "adj", "b"): "asserted",
        ("b", "adj", "a"): "asserted",
        ("x", "anc", "y"): "asserted",
        ("y", "anc", "z"): "asserted",
        ("x", "anc", "z"): "transitive",
        ("o1", "placedBy", "c1"): "asserted",
        ("c1", "hasOrder", "o1"): "inverse",
        # inverse of the base anc edges...
        ("y", "desc", "x"): "inverse",
        ("z", "desc", "y"): "inverse",
        # ...and of the TRANSITIVE pair (inverse-of-transitive closes)
        ("z", "desc", "x"): "inverse",
    }


def test_property_closure_symmetric_transitive_is_undirected_reachability(spark):
    # chain u-v-w under a symmetric transitive predicate: every ordered
    # pair of distinct vertices must appear.
    df = spark.createDataFrame(
        [("u", "same", "v"), ("v", "same", "w")], ["subj", "pred", "obj"]
    )
    out = property_closure(df, symmetric=("same",), transitive=("same",))
    pairs = {(r.subj, r.obj) for r in out.collect()}
    assert pairs == {
        ("u", "v"), ("v", "u"), ("v", "w"), ("w", "v"), ("u", "w"), ("w", "u")
    }


def test_functional_violations(spark):
    df = spark.createDataFrame(
        [
            ("m1", "cas", "111"),
            ("m1", "cas", "222"),
            ("m2", "cas", "333"),
            ("p1", "madeOf", "m1"),
            ("p2", "madeOf", "m1"),
            ("p3", "madeOf", "m2"),
        ],
        ["subj", "pred", "obj"],
    )
    out = functional_violations(
        df, functional=("cas",), inverse_functional=("madeOf",)
    )
    got = {(r.pred, r.entity): (r.side, r.n_values, r.v_min, r.v_max) for r in out.collect()}
    assert got == {
        ("cas", "m1"): ("subj", 2, "111", "222"),
        ("madeOf", "m1"): ("obj", 2, "p1", "p2"),
    }


def test_functional_violations_requires_a_declaration(spark):
    df = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError):
        functional_violations(df)
