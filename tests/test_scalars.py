"""Edge-case units for the F4/F8/F9 scalar operators (the contract queries
pin the happy path against DuckDB; these pin the corners)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_extractor_spark.functions.core import (
    container_relative_path,
    flatten_polygon,
    parse_msds_json,
    strip_json_fences,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).head()["v"]


def test_strip_json_fences_variants(spark):
    """```json fence, bare ``` fence, no fence at all, leading whitespace —
    all reduce to the raw payload (artifact_ingestor_service.py:770-777)."""
    cases = [
        ('```json\n{"a": 1}\n```', '{"a": 1}'),
        ('```\n{"a": 1}\n```', '{"a": 1}'),
        ('{"a": 1}', '{"a": 1}'),
        ('  ```json {"a": 1} ``` ', '{"a": 1}'),
    ]
    for raw, want in cases:
        assert _one(spark, strip_json_fences(F.lit(raw))) == want, raw


def test_parse_msds_json_malformed_is_null(spark):
    """from_json nulls malformed payloads (set-at-a-time analog of the
    reference's per-doc failure record) instead of failing the stage."""
    good = '```json\n{"material_name": "X", "chemicals": [{"chemical_name": "c", "weight": 2}]}\n```'
    bad = "```json\nnot json at all\n```"
    row = (
        spark.createDataFrame([(good,), (bad,)], "payload string")
        .select(parse_msds_json(F.col("payload")).alias("doc"))
        .collect()
    )
    assert row[0]["doc"]["material_name"] == "X"
    assert row[0]["doc"]["chemicals"][0]["weight"] == 2
    assert row[1]["doc"] is None or row[1]["doc"]["material_name"] is None


def test_container_relative_path_no_query_no_fragment(spark):
    url = "https://h.example.com/cont/a/b.png"
    got = _one(spark, container_relative_path(F.lit(url), "cont"))
    assert got == "a/b.png"


def test_container_relative_path_reattaches_query_and_fragment(spark):
    url = "https://h.example.com/cont/a/b.png?sig=1&x=2#frag"
    got = _one(spark, container_relative_path(F.lit(url), "cont"))
    assert got == "a/b.png?sig=1&x=2#frag"


def test_flatten_polygon_order_and_empty(spark):
    poly = F.array(
        F.struct(F.lit(1).alias("x"), F.lit(2).alias("y")),
        F.struct(F.lit(3).alias("x"), F.lit(4).alias("y")),
    )
    assert _one(spark, flatten_polygon(poly)) == [1, 2, 3, 4]
    empty = F.array().cast("array<struct<x:int,y:int>>")
    assert _one(spark, flatten_polygon(empty)) == []


# ----------------------------------------------------- url canonicalize --

from entity_extractor_spark.functions.core import (  # noqa: E402
    url_canonical_host,
    url_canonicalize,
)


def test_url_canonicalize_known_cases(spark):
    cases = {
        "HTTP://WWW.Example.COM:80/a/b/?z=2&utm_source=x&a=1#frag":
            "http://example.com/a/b?a=1&z=2",
        "https://x.com:8443/": "https://x.com:8443/",
        "https://x.com": "https://x.com/",
        "http://x.com/?utm_source=1&gclid=abc": "http://x.com/",
        "https://www.x.com:443/p": "https://x.com/p",
        "http://a.b.c/p/q?b=2&a=1&a=0": "http://a.b.c/p/q?a=0&a=1&b=2",
        "https://x.com/deep///": "https://x.com/deep",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r.u: r.c
        for r in df.select("u", url_canonicalize(F.col("u")).alias("c")).collect()
    }
    assert got == cases


def test_url_canonicalize_idempotent(spark):
    urls = [
        "HTTP://WWW.Example.COM:80/a/b/?z=2&utm_source=x&a=1#frag",
        "https://x.com:8443/q?k=v",
        "http://x.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(url_canonicalize(F.col("u")).alias("c"))
    twice = once.select(url_canonicalize(F.col("c")).alias("c2"), "c")
    assert all(r.c == r.c2 for r in twice.collect())


def test_url_canonical_host(spark):
    cases = {
        "HTTP://WWW.X.COM:8080/p": "x.com",
        "https://sub.domain.org/": "sub.domain.org",
        "http://www.only": "only",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r.u: r.h
        for r in df.select("u", url_canonical_host(F.col("u")).alias("h")).collect()
    }
    assert got == cases
