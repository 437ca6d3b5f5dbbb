"""media_context — figure-caption association edge cases the contract
row's interleaved layouts don't isolate individually."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_extractor_spark.operators.multimodal import media_context

_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _doc(doc_id, spans):
    return (doc_id, [(k, t, m, o) for k, t, m, o in spans])


def test_media_context_all_layouts(spark):
    docs = spark.createDataFrame(
        [
            _doc("lead", [("image", "", "m0", 0), ("text", "a", "", 1)]),
            _doc("trail", [("text", "a", "", 0), ("image", "", "m0", 1)]),
            _doc(
                "pair",
                [
                    ("text", "a", "", 0),
                    ("image", "", "m0", 1),
                    ("image", "", "m1", 2),
                    ("text", "b", "", 3),
                ],
            ),
            _doc("none", [("text", "a", "", 0), ("text", "b", "", 1)]),
        ],
        _SCHEMA,
    )
    rows = {(r.doc_id, r.media_ref): r for r in media_context(docs).collect()}
    lead = rows[("lead", "m0")]
    assert lead.prev_text is None and lead.next_text == "a"
    trail = rows[("trail", "m0")]
    assert trail.prev_text == "a" and trail.next_text is None
    # consecutive images share TEXT neighbours (not each other)
    p0, p1 = rows[("pair", "m0")], rows[("pair", "m1")]
    assert (p0.prev_text, p0.next_text) == ("a", "b")
    assert (p1.prev_text, p1.next_text) == ("a", "b")
    assert (p0.prev_offset, p0.next_offset) == (0, 3)
    # docs without media produce no rows
    assert not any(d == "none" for d, _ in rows)


def test_media_context_null_offset_raises(spark):
    docs = spark.createDataFrame(
        [("d", [("image", "", "m0", None), ("text", "a", "", 1)])], _SCHEMA
    )
    with pytest.raises(Exception, match="offset must not be NULL"):
        media_context(docs).collect()


def test_span_reuse_counts_and_floor(spark):
    docs = spark.createDataFrame(
        [
            _doc("d1", [("text", "banner", "", 0), ("text", "banner", "", 1),
                        ("image", "", "logo", 2), ("text", "unique1", "", 3)]),
            _doc("d2", [("text", "banner", "", 0), ("image", "", "logo", 1),
                        ("text", "", "", 2), ("image", "", "", 3)]),
            _doc("d3", [("text", "unique3", "", 0), ("image", "", "own3", 1)]),
        ],
        _SCHEMA,
    )
    from entity_extractor_spark.operators.multimodal import span_reuse

    got = {(r.kind, r.span_key): r for r in span_reuse(docs, 2).collect()}
    # banner: 2 docs, 3 spans (twice in d1); logo: 2 docs 2 spans
    assert (got[("text", "banner")].n_docs, got[("text", "banner")].n_spans) == (2, 3)
    assert (got[("image", "logo")].n_docs, got[("image", "logo")].n_spans) == (2, 2)
    # uniques and empty keys absent
    assert set(got) == {("text", "banner"), ("image", "logo")}
    import pytest

    with pytest.raises(ValueError):
        span_reuse(docs, 0)
