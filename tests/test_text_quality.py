

def test_group_percentiles_bruteforce(spark):
    """Type-1 percentile = value at rank ceil(p*n/100), replayed in pure
    Python, including duplicate-heavy groups and a singleton group."""
    import math
    import random

    rng = random.Random(5)
    rows = [(f"g{i % 3}", rng.randrange(10)) for i in range(200)] + [("solo", 42)]
    df = spark.createDataFrame(rows, "lang string, n bigint")
    from entity_extractor_spark.operators.text_quality import group_percentiles

    got = {
        (r["lang"], r["pct"]): r["n"]
        for r in group_percentiles(df, "lang", "n", (1, 50, 90, 99, 100)).collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    expect = {
        (g, p): sorted(vs)[math.ceil(p * len(vs) / 100) - 1]
        for g, vs in by_g.items()
        for p in (1, 50, 90, 99, 100)
    }
    assert got == expect
