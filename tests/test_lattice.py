"""Unit tests for the PFAS source/status lattice (F12, A3, A4) against the
literal reference semantics (artifact_ingestor_service.py:819-879,
:1171-1257)."""

import pytest

from entity_extractor_spark.functions.lattice import (
    TRANSITION_MAP,
    TransitionError,
    fold_observation,
    merge_source,
    merge_status,
    resolve_material,
    status_from_tag,
)


def test_transition_map_has_16_entries_with_2_error_cells():
    assert len(TRANSITION_MAP) == 16
    assert TRANSITION_MAP["OECD_MANUAL"] is None
    assert TRANSITION_MAP["MANUAL_OECD"] is None


@pytest.mark.parametrize(
    "existing,new,expected",
    [
        ("NONE", "NONE", "NONE"),
        ("NONE", "MANUAL", "MANUAL"),
        ("NONE", "OECD", "OECD"),
        ("MANUAL", "MANUAL", "MANUAL"),
        ("MANUAL", "NONE", "MANUAL"),
        ("OECD", "OECD", "OECD"),
        ("OECD", "NONE", "OECD"),
    ],
)
def test_valid_transitions(existing, new, expected):
    assert merge_source(existing, new) == expected


@pytest.mark.parametrize(
    "existing,new",
    [
        ("OECD", "MANUAL"),   # explicit None cell
        ("MANUAL", "OECD"),   # explicit None cell
        ("VAI", "MANUAL"),    # key absent from map => same error
        ("NONE", "VAI"),      # 'VAI' never a valid NEW source
        ("ECHA", "NONE"),     # ECHA absent entirely
    ],
)
def test_error_transitions(existing, new):
    with pytest.raises(TransitionError):
        merge_source(existing, new)


def test_status_replaced_only_for_the_7_pairs():
    # (NONE, MANUAL) is in the replacing set
    assert merge_status("NONE", "MANUAL", "NO", "YES") == "YES"
    # (MANUAL, MANUAL) is NOT: existing status kept
    assert merge_status("MANUAL", "MANUAL", "NO", "YES") == "NO"
    # (OECD, NONE) is NOT
    assert merge_status("OECD", "NONE", "PENDING", "NO") == "PENDING"
    # (NONE, OECD) IS
    assert merge_status("NONE", "OECD", "PENDING", "NO") == "NO"


def test_status_from_tag():
    assert status_from_tag("PFAS") == "YES"
    assert status_from_tag("NO_PFAS") == "NO"
    assert status_from_tag("PENDING") == "PENDING"
    assert status_from_tag("anything-else") == "PENDING"
    assert status_from_tag(None) == "PENDING"


def test_fold_creation_then_merge():
    st = fold_observation(None, "PFAS", "NONE")
    assert st == ("YES", "NONE")
    st = fold_observation(st, "NO_PFAS", "MANUAL")  # NONE->MANUAL replaces status
    assert st == ("NO", "MANUAL")
    st = fold_observation(st, "PFAS", "NONE")  # MANUAL_NONE keeps status
    assert st == ("NO", "MANUAL")


# ---- A3/A4 material fold ----------------------------------------------------

def test_resolve_material_status_lattice():
    assert resolve_material([("NO", "NONE"), ("YES", "NONE")])[0] == "YES"
    assert resolve_material([("NO", "NONE"), ("NO", "NONE")])[0] == "NO"
    assert resolve_material([("NO", "NONE"), ("PENDING", "NONE")])[0] == "PENDING"
    assert resolve_material([("PENDING", "NONE")])[0] == "PENDING"


def test_resolve_material_source_preference_depends_on_status():
    # resolved YES -> preference [VAI, OECD, MANUAL] among YES children
    st, src = resolve_material([("YES", "OECD"), ("YES", "MANUAL"), ("NO", "VAI")])
    assert (st, src) == ("YES", "OECD")
    # resolved PENDING -> preference [OECD, VAI, MANUAL]
    st, src = resolve_material([("PENDING", "MANUAL"), ("PENDING", "OECD"), ("NO", "VAI")])
    assert (st, src) == ("PENDING", "OECD")
    # children not matching resolved status are not counted
    st, src = resolve_material([("YES", "NONE"), ("NO", "OECD")])
    assert (st, src) == ("YES", "NONE")
