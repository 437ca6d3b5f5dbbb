"""ngram_jaccard_pairs quadratic-blocking guard: a hub group larger than
max_group_size fails loudly instead of silently going n²; the blocked path
(groups within the limit) returns the same pairs with or without the guard."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from entity_extractor_spark.operators import dedupe as D


def _docs(spark, n_hub: int):
    rows = [
        Row(doc_id=i, text=f"alpha beta gamma delta token{i % 3}", lang="en")
        for i in range(n_hub)
    ]
    rows += [Row(doc_id=1000 + i, text="uno dos tres cuatro", lang="es") for i in range(3)]
    return spark.createDataFrame(rows)


def test_hub_group_raises(spark):
    df = _docs(spark, n_hub=12)
    pairs = D.ngram_jaccard_pairs(
        df, "doc_id", "text", "lang", threshold=0.0, max_group_size=10
    )
    with pytest.raises(Exception, match="max_group_size"):
        pairs.collect()


def test_guarded_path_matches_unguarded(spark):
    df = _docs(spark, n_hub=8)
    guarded = D.ngram_jaccard_pairs(
        df, "doc_id", "text", "lang", threshold=0.1, max_group_size=10
    )
    unguarded = D.ngram_jaccard_pairs(
        df, "doc_id", "text", "lang", threshold=0.1, max_group_size=None
    )
    key = lambda r: (r.doc1, r.doc2)  # noqa: E731
    g = sorted(guarded.collect(), key=key)
    u = sorted(unguarded.collect(), key=key)
    assert g == u
    assert len(g) > 0


# ------------------------------------------------- paragraph dedup (C4-style)
from entity_extractor_spark.operators.dedupe import dedup_paragraphs


def test_dedup_paragraphs_first_wins_and_reassembles(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared one\nbeta"),
            (2, "shared one\ngamma\nshared two"),
            (3, "shared two\nshared one"),
            (4, "shared one"),          # loses everything -> no output row
            (5, "  \n\n"),              # blank-only -> no output row
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_kept"])
        for r in dedup_paragraphs(docs, "doc_id", "text").collect()
    }
    # doc 1 owns every first occurrence it contains; docs 3/4 are all-dupes
    assert out == {
        1: ("alpha\nshared one\nbeta", 3),
        2: ("gamma\nshared two", 2),
    }


def test_dedup_paragraphs_intra_doc_dupe_kept_once(spark):
    docs = spark.createDataFrame([(7, "x\nx\ny")], "doc_id bigint, text string")
    row = dedup_paragraphs(docs, "doc_id", "text").head()
    assert (row["text"], row["n_kept"]) == ("x\ny", 2)


# -------------------------------------------------------------- fuzzy match --

def test_fuzzy_match_known_answer(spark):
    from entity_extractor_spark.operators.dedupe import fuzzy_match_pairs

    rows = [
        (1, "acme corp", "a"), (2, "acme corp.", "a"), (3, "acme cor", "a"),
        (4, "zenith ltd", "a"),
        (5, "acme corp", "b"),  # other block: never paired with block a
    ]
    df = spark.createDataFrame(rows, "id long, nm string, grp string")
    got = {
        (r["id1"], r["id2"]): r["dist"]
        for r in fuzzy_match_pairs(df, "id", "nm", "grp", max_dist=2).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_fuzzy_match_dist_zero_exact_dupes_only(spark):
    from entity_extractor_spark.operators.dedupe import fuzzy_match_pairs

    rows = [(1, "x", "g"), (2, "x", "g"), (3, "y", "g")]
    df = spark.createDataFrame(rows, "id long, nm string, grp string")
    got = [(r["id1"], r["id2"], r["dist"])
           for r in fuzzy_match_pairs(df, "id", "nm", "grp", 0).collect()]
    assert got == [(1, 2, 0)]


def test_fuzzy_match_hub_group_raises(spark):
    from entity_extractor_spark.operators.dedupe import fuzzy_match_pairs

    rows = [(i, f"n{i}", "hub") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, nm string, grp string")
    with pytest.raises(Exception, match="max_group_size"):
        fuzzy_match_pairs(df, "id", "nm", "grp", 1, max_group_size=10).collect()
    # same data passes with the guard sized (or disabled)
    assert fuzzy_match_pairs(df, "id", "nm", "grp", 1, max_group_size=None).count() >= 0


def test_fuzzy_match_validates(spark):
    from entity_extractor_spark.operators.dedupe import fuzzy_match_pairs

    df = spark.createDataFrame([(1, "x", "g")], "id long, nm string, grp string")
    with pytest.raises(ValueError):
        fuzzy_match_pairs(df, "id", "nm", "grp", -1)


# ------------------------------------------------ minhash slot independence --

def test_minhash_slots_are_independent_permutations(spark):
    """Regression for the degenerate-family bug: with narrow coefficients
    (a_i = 2i+3) the hash a_i*x + b_i never wraps mod 2^61-1, every slot
    is monotone in x, and all 16 slots pick the same argmin shingle — so
    two docs agreed on 16/16 slots or 0/16, never in between, and LSH
    banding had no amplification. This pair is constructed so B's
    shingles are a superset of A's AND the globally-minimal-x shingle is
    shared: the monotone family scores it 16/16; an honest family must
    agree on ~J*16 slots. The expected signature is replayed in pure
    Python from the same md5-derived constants — a full cross-
    implementation value check, not just a bound."""
    import hashlib

    A = "red fox jumps over the lazy dog near the old barn"
    B = A + " while three silver crows watch from a broken fence rail"

    P = (1 << 61) - 1

    def shingle_xs(text):
        t = text.strip().lower().split()
        sh = {f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)}
        return {int(hashlib.md5(s.encode()).hexdigest()[:12], 16) for s in sh}

    def expected_sig(xs):
        out = {}
        for i in range(16):
            a = int(hashlib.md5(f"mh:a:{i}".encode()).hexdigest()[:15], 16) | 1
            b = int(hashlib.md5(f"mh:b:{i}".encode()).hexdigest()[:15], 16)
            out[i] = min((a * x + b) % P for x in xs)
        return out

    xa, xb = shingle_xs(A), shingle_xs(B)
    assert xa < xb and min(xb) in xa, "test premise: shared global argmin"

    df = spark.createDataFrame([(1, A), (2, B)], "doc_id int, text string")
    got = {
        (r.doc_id, r.hash_id): r.minhash
        for r in D.minhash_signatures(df, "doc_id", "text").collect()
    }
    ea, eb = expected_sig(xa), expected_sig(xb)
    for i in range(16):
        assert got[(1, i)] == ea[i]
        assert got[(2, i)] == eb[i]
    agree = sum(1 for i in range(16) if ea[i] == eb[i])
    # J = 0.5 exactly (10 of 20 shingles shared); a monotone family gives
    # 16, a degenerate constant family 0 — independence shows up as the
    # strictly-intermediate deterministic value
    assert 0 < agree < 16
    assert agree == 10


def test_minhash_agreement_matches_python_replay(spark):
    """minhash_agreement must reproduce, per pair, the slot-agreement
    count of the pure-Python signature replay, and its est_jaccard_ppm
    must be the exact ppm floor division."""
    import hashlib

    texts = {
        1: "red fox jumps over the lazy dog near the old barn",
        2: "red fox jumps over the lazy dog near the old barn while "
           "three silver crows watch from a broken fence rail",
        3: "completely different words entirely here nothing shared at all",
    }
    P = (1 << 61) - 1

    def sig(text):
        t = text.strip().lower().split()
        xs = {
            int(hashlib.md5(f"{t[i]} {t[i+1]}".encode()).hexdigest()[:12], 16)
            for i in range(len(t) - 1)
        }
        out = {}
        for i in range(16):
            a = int(hashlib.md5(f"mh:a:{i}".encode()).hexdigest()[:15], 16) | 1
            b = int(hashlib.md5(f"mh:b:{i}".encode()).hexdigest()[:15], 16)
            out[i] = min((a * x + b) % P for x in xs)
        return out

    df = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    sigs = D.minhash_signatures(df, "doc_id", "text")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "doc1 int, doc2 int"
    )
    got = {
        (r.doc1, r.doc2): (r.agree, r.est_jaccard_ppm)
        for r in D.minhash_agreement(sigs, pairs).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    for (a, b), (agree, est) in got.items():
        sa, sb = sig(texts[a]), sig(texts[b])
        exp = sum(1 for i in range(16) if sa[i] == sb[i])
        assert agree == exp
        assert est == exp * 1_000_000 // 16


# ------------------------------------------------------ LSH banding S-curve --

def test_lsh_curve_matches_python_replay(spark):
    """Every (bands, rows) split of 16 slots vs a pure-Python floor-ppm
    replay — including the capped top bucket (J = 10^6 pairs) and the
    expected-candidate floor products."""
    from entity_extractor_spark.operators.dedupe import (
        lsh_curve,
        lsh_factorizations,
    )

    jacs = [0, 49_999, 50_000, 123_456, 500_000, 876_543, 999_999, 1_000_000]
    rows = [(i, j) for i, j in enumerate(jacs * 3)]
    df = spark.createDataFrame(rows, "pid long, jac long")
    bp = 50_000
    got = {
        (r.bands, r.rows_per_band, r.jac_bucket_ppm): (
            r.n_pairs,
            r.p_collision_ppm,
            r.expected_candidate_pairs,
        )
        for r in lsh_curve(df, "jac", num_hashes=16, bucket_ppm=bp).collect()
    }

    def powp(x, k):
        acc = x
        for _ in range(k - 1):
            acc = acc * x // 1_000_000
        return acc

    from collections import Counter

    hist = Counter(j // bp for _, j in rows)
    want = {}
    for b, r in lsh_factorizations(16):
        for bucket, n in hist.items():
            rep = min(bucket * bp + bp // 2, 1_000_000)
            p = 1_000_000 - powp(1_000_000 - powp(rep, r), b)
            want[(b, r, rep)] = (n, p, n * p // 1_000_000)
    assert got == want
    # the exact-dup bucket is capped at the grid top and always collides
    assert got[(4, 4, 1_000_000)][1] == 1_000_000


def test_lsh_curve_validates(spark):
    import pytest

    from entity_extractor_spark.operators.dedupe import lsh_curve

    df = spark.createDataFrame([(1, 5)], "pid long, jac long")
    with pytest.raises(ValueError):
        lsh_curve(df, "jac", num_hashes=0)
    with pytest.raises(ValueError):
        lsh_curve(df, "jac", bucket_ppm=333_333)  # does not divide 10^6
