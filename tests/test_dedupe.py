"""containment_pairs gates (asymmetric Broder containment) and the
Mersenne split-multiply fold vs the DECIMAL minhash formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

# --------------------------------------------------------- containment_pairs --


def test_containment_excerpt_vs_jaccard(spark):
    """An excerpt has containment ~10^6 of itself in its source while
    Jaccard stays low — the asymmetry the operator exists for."""
    from entity_extractor_spark.operators.dedupe import containment_pairs

    src = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    excerpt = "alpha beta gamma"  # 2 of the source's 9 bigrams... wait: 2 bigrams
    df = spark.createDataFrame(
        [(1, src, "g"), (2, excerpt, "g")], "doc_id long, text string, grp string"
    )
    out = containment_pairs(df, "doc_id", "text", "grp").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc1"], r["doc2"]) == (1, 2)
    assert r["n_sh1"] == 9 and r["n_sh2"] == 2 and r["inter"] == 2
    assert r["cont2_ppm"] == 1_000_000  # excerpt fully inside source
    assert r["cont1_ppm"] == 2 * 1_000_000 // 9  # source barely inside excerpt


def test_containment_threshold_and_unrelated(spark):
    from entity_extractor_spark.operators.dedupe import containment_pairs

    df = spark.createDataFrame(
        [
            (1, "a b c d", "g"),
            (2, "a b", "g"),          # contained in 1
            (3, "x y z w", "g"),      # unrelated
        ],
        "doc_id long, text string, grp string",
    )
    all_pairs = containment_pairs(df, "doc_id", "text", "grp").collect()
    assert len(all_pairs) == 3
    kept = containment_pairs(
        df, "doc_id", "text", "grp", threshold_ppm=900_000
    ).collect()
    assert [(r["doc1"], r["doc2"]) for r in kept] == [(1, 2)]


def test_containment_excludes_empty_and_validates(spark):
    import pytest

    from entity_extractor_spark.operators.dedupe import containment_pairs

    df = spark.createDataFrame(
        [(1, "a b c", "g"), (2, "   ", "g")], "doc_id long, text string, grp string"
    )
    assert containment_pairs(df, "doc_id", "text", "grp").collect() == []
    with pytest.raises(ValueError):
        containment_pairs(df, "doc_id", "text", "grp", threshold_ppm=1_000_001)
    with pytest.raises(ValueError):
        containment_pairs(df, "doc_id", "text", "grp", threshold_ppm=True)


def test_containment_group_size_guard(spark):
    import pytest

    from entity_extractor_spark.operators.dedupe import containment_pairs

    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1}", "hub") for i in range(8)],
        "doc_id long, text string, grp string",
    )
    with pytest.raises(Exception, match="max_group_size"):
        containment_pairs(
            df, "doc_id", "text", "grp", max_group_size=4
        ).collect()
    ok = containment_pairs(df, "doc_id", "text", "grp", max_group_size=None)
    assert ok.count() == 28  # 8 choose 2


def test_containment_sub_n_docs_excluded(spark):
    """A doc with fewer tokens than shingle_n is below the metric's
    resolution: excluded, never a silent zero-containment false
    negative (use shingle_n=1 to cover short docs)."""
    from entity_extractor_spark.operators.dedupe import containment_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "g"), (2, "alpha", "g")],
        "doc_id long, text string, grp string",
    )
    assert containment_pairs(df, "doc_id", "text", "grp").collect() == []
    uni = containment_pairs(
        df, "doc_id", "text", "grp", shingle_n=1
    ).collect()
    assert len(uni) == 1 and uni[0]["cont2_ppm"] == 1_000_000


def test_mersenne_fold_equals_decimal_formulation(spark):
    """_mersenne_axb (pure-BIGINT split-multiply fold) must be
    bit-identical to the DECIMAL(38,0) (a*x + b) % p the DuckDB oracles
    replay, across random 48-bit x and every real coefficient pair."""
    from entity_extractor_spark.operators.dedupe import (
        _MERSENNE,
        _mersenne_axb,
        _mh_const,
    )

    df = spark.range(200_000).select(
        (F.xxhash64("id").bitwiseAND(F.lit((1 << 48) - 1))).alias("x")
    )
    for i in range(16):
        a, b = _mh_const("a", i), _mh_const("b", i)
        dec = (
            (F.lit(a).cast("decimal(38,0)") * F.col("x") + F.lit(b))
            % F.lit(_MERSENNE)
        ).cast("long")
        fold = _mersenne_axb(
            F.col("x"),
            F.lit(a >> 31),
            F.lit(a & ((1 << 31) - 1)),
            F.lit(b),
        )
        bad = df.where(dec != fold).count()
        assert bad == 0, f"hash {i}: {bad} mismatches"
