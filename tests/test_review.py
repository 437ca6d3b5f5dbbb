"""Review/update path (save_msds else-branch): the one-pass Spark operator
must equal the oracle's literal sequential replay of the reference loop —
including review-override-then-clobber interleavings, invalid-transition
drops, name matching, and unknown-material skips."""

from __future__ import annotations

import random

import pytest

from entity_extractor_spark.operators.review import apply_review
from entity_extractor_spark.oracle import replay_reviews

STATUSES = ["YES", "NO", "PENDING"]
SOURCES = ["MANUAL", "OECD", "NONE", "OPENAI", "VAI"]  # VAI: every transition drops
TAGS = ["PFAS", "NO_PFAS", "OTHER", None]
NAMES = [f"Chem {c}" for c in "ABCDEFGHJK"]


def _gen(seed: int):
    rng = random.Random(seed)
    chems = {
        f"c{i}": {
            "name": rng.choice(NAMES),  # duplicate names across nodes on purpose
            "node_type": "CHEMICAL",
            "pfas_status": rng.choice(STATUSES),
            "pfas_information_source": rng.choice(SOURCES),
        }
        for i in range(14)
    }
    mats = {
        f"m{i}": {
            "name": f"Mat {i}",
            "node_type": "MATERIAL",
            "pfas_status": rng.choice(STATUSES),
            "pfas_information_source": rng.choice(SOURCES),
        }
        for i in range(8)
    }
    nodes = {**mats, **chems}
    edges = sorted(
        {
            (f"m{rng.randrange(8)}", f"c{rng.randrange(14)}")
            for _ in range(25)
        }
    )
    reviews = []
    for seq in range(6):
        # one unknown material id to exercise the skip path
        mid = "m-missing" if seq == 3 else f"m{rng.randrange(8)}"
        n_rc = rng.randrange(0, 4)  # 0 exercises the empty-list override
        reviews.append(
            {
                "review_seq": seq,
                "material_id": mid,
                "chemicals": [
                    {
                        "chemical_name": rng.choice(NAMES + ["No Such Chem"]),
                        "tag": rng.choice(TAGS),
                        "source": rng.choice(SOURCES + [None]),
                    }
                    for _ in range(n_rc)
                ],
            }
        )
    return nodes, edges, reviews


def _spark_frames(spark, nodes, edges, reviews):
    ndf = spark.createDataFrame(
        [
            (i, n["name"], n["node_type"], n["pfas_status"], n["pfas_information_source"])
            for i, n in nodes.items()
        ],
        "id string, name string, node_type string, pfas_status string, "
        "pfas_information_source string",
    )
    edf = spark.createDataFrame(edges, "material_id string, chem_id string")
    rdf = spark.createDataFrame(
        [(r["review_seq"], r["material_id"]) for r in reviews],
        "review_seq long, material_id string",
    )
    rcdf = spark.createDataFrame(
        [
            (r["review_seq"], k, rc["chemical_name"], rc["tag"], rc["source"])
            for r in reviews
            for k, rc in enumerate(r["chemicals"])
        ],
        "review_seq long, chem_seq long, chemical_name string, tag string, source string",
    )
    return ndf, edf, rdf, rcdf


@pytest.mark.parametrize("seed", range(8))
def test_apply_review_matches_sequential_oracle(spark, seed):
    nodes, edges, reviews = _gen(seed)
    ndf, edf, rdf, rcdf = _spark_frames(spark, nodes, edges, reviews)
    got = {
        r["id"]: (r["pfas_status"], r["pfas_information_source"])
        for r in apply_review(ndf, edf, rdf, rcdf).collect()
    }
    import copy

    want_nodes = replay_reviews(copy.deepcopy(nodes), edges, reviews)
    want = {
        i: (n["pfas_status"], n["pfas_information_source"])
        for i, n in want_nodes.items()
    }
    assert got == want, {
        k: (got[k], want[k]) for k in want if got[k] != want[k]
    }


def test_review_override_clobbered_by_later_shared_child_review(spark):
    """m0 reviewed at seq 0 (override YES); seq 1 reviews m1 which shares
    chemical c0 with m0 => m0 is re-resolved from graph children, losing
    the override — the reference's exact clobber behavior."""
    nodes = {
        "m0": {"name": "Mat 0", "node_type": "MATERIAL", "pfas_status": "PENDING", "pfas_information_source": "NONE"},
        "m1": {"name": "Mat 1", "node_type": "MATERIAL", "pfas_status": "PENDING", "pfas_information_source": "NONE"},
        "c0": {"name": "Chem A", "node_type": "CHEMICAL", "pfas_status": "NO", "pfas_information_source": "OECD"},
    }
    edges = [("m0", "c0"), ("m1", "c0")]
    reviews = [
        {"review_seq": 0, "material_id": "m0",
         "chemicals": [{"chemical_name": "Unmatched", "tag": "PFAS", "source": "OECD"}]},
        {"review_seq": 1, "material_id": "m1", "chemicals": []},
    ]
    ndf, edf, rdf, rcdf = _spark_frames(spark, nodes, edges, reviews)
    got = {r["id"]: (r["pfas_status"], r["pfas_information_source"])
           for r in apply_review(ndf, edf, rdf, rcdf).collect()}
    # seq 0: m0 override from its review list -> (YES, OECD)
    # seq 1: m1's review touches c0 -> BOTH m0 and m1 re-resolve from c0's
    #        state (NO, OECD); m1's own override (empty list) -> (NO, NONE)
    assert got["m0"] == ("NO", "OECD")
    assert got["m1"] == ("NO", "NONE")
    assert got["c0"] == ("NO", "OECD")  # chemical untouched

    import copy
    want = replay_reviews(copy.deepcopy(nodes), edges, reviews)
    assert got == {i: (n["pfas_status"], n["pfas_information_source"]) for i, n in want.items()}


def test_review_invalid_transition_drops(spark):
    """OECD -> MANUAL is a None cell in the transition map: the observation
    drops, node state survives, and the material still re-resolves."""
    nodes = {
        "m0": {"name": "Mat 0", "node_type": "MATERIAL", "pfas_status": "YES", "pfas_information_source": "VAI"},
        "c0": {"name": "Chem A", "node_type": "CHEMICAL", "pfas_status": "NO", "pfas_information_source": "OECD"},
    }
    edges = [("m0", "c0")]
    reviews = [
        {"review_seq": 0, "material_id": "m0",
         "chemicals": [{"chemical_name": "Chem A", "tag": "PFAS", "source": "MANUAL"}]},
    ]
    ndf, edf, rdf, rcdf = _spark_frames(spark, nodes, edges, reviews)
    got = {r["id"]: (r["pfas_status"], r["pfas_information_source"])
           for r in apply_review(ndf, edf, rdf, rcdf).collect()}
    assert got["c0"] == ("NO", "OECD")      # dropped, unchanged
    assert got["m0"] == ("YES", "MANUAL")   # override from review list
