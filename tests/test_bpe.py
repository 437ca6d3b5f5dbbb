"""bpe.py vs a pure-Python reference implementation: identical merge
tables and identical final segmentations, including the a==b run-parity
case ('ggg' under merge (g,g)) and early stop."""

from __future__ import annotations

import random

from entity_extractor_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    word_histogram,
)


def py_bpe(words: dict[str, int], rounds: int):
    toks = {w: list(w) for w in words}
    merges = []
    for _ in range(rounds):
        pc: dict[tuple[str, str], int] = {}
        for w, c in words.items():
            t = toks[w]
            for i in range(len(t) - 1):
                pc[(t[i], t[i + 1])] = pc.get((t[i], t[i + 1]), 0) + c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, c))
        for w, t in toks.items():
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    return merges, toks


def _corpus_df(spark, words: dict[str, int]):
    # one doc per word occurrence batch; exercises the histogram agg too
    docs = [(i, " ".join([w] * c)) for i, (w, c) in enumerate(words.items())]
    return spark.createDataFrame(docs, "doc_id int, text string")


def _check(spark, words: dict[str, int], rounds: int):
    docs = _corpus_df(spark, words)
    mdf, merges = bpe_train(docs, "text", rounds)
    ref_merges, ref_toks = py_bpe(words, rounds)
    assert merges == ref_merges
    got = sorted(
        (r["round"], r.lhs, r.rhs, r.pair_count) for r in mdf.collect()
    )
    assert got == [(i + 1, a, b, c) for i, (a, b, c) in enumerate(ref_merges)]
    seg = bpe_apply(word_histogram(docs, "text"), merges)
    got_seg = {r.w: r.toks for r in seg.collect()}
    assert got_seg == {w: " ".join(t) for w, t in ref_toks.items()}


def test_run_parity_self_pair(spark):
    # 'gggg' dominated by (g,g): strict greedy gives gg gg, then gggg;
    # 'ggg' gives gg g (the odd straggler stays to the RIGHT)
    _check(spark, {"gggg": 10, "ggg": 7, "ga": 1}, 3)


def test_adjacent_distinct_pairs_all_merge(spark):
    # 'abab': (a,b) matches at 1 and 3 — both must merge in one round
    _check(spark, {"abab": 5, "ab": 3, "ba": 2}, 2)


def test_fuzz_random_small_alphabet(spark):
    rng = random.Random(41)
    for trial in range(4):
        words = {}
        for _ in range(rng.randint(4, 12)):
            w = "".join(
                rng.choice("abc") for _ in range(rng.randint(1, 8))
            )
            words[w] = rng.randint(1, 9)
        _check(spark, words, rounds=rng.randint(1, 6))


def test_early_stop(spark):
    # 'ab' collapses to one token after round 1; round 2 has no pairs
    docs = _corpus_df(spark, {"ab": 4})
    mdf, merges = bpe_train(docs, "text", 5)
    assert merges == [("a", "b", 4)]
    assert mdf.count() == 1


def test_rejects_bad_rounds(spark):
    docs = _corpus_df(spark, {"ab": 1})
    try:
        bpe_train(docs, "text", 0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ------------------------------------------- string-replace merge engine --


def test_apply_merge_equals_canonical_on_randomized_sequences(spark):
    """The padded two-pass replace = canonical LTR non-overlapping
    merging, on sequences of MULTI-char symbols (the regime the
    histogram fuzz above can't reach directly: symbols like 'ab'
    adjacent to bare 'a'/'b' are exactly where a naive unpadded replace
    would corrupt)."""
    from pyspark.sql import functions as F

    from entity_extractor_spark.operators.bpe import apply_merge

    def merge_word(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    rng = random.Random(11)
    symbols = ["a", "b", "c", "ab", "ba", "aa"]
    rules = [("a", "b"), ("a", "a"), ("ab", "a"), ("b", "ba"), ("c", "c")]
    seqs = [
        [rng.choice(symbols) for _ in range(rng.randint(1, 12))]
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, " ".join(s)) for i, s in enumerate(seqs)], "i long, sym string"
    )
    for l, r in rules:
        got = {
            row["i"]: row["out"]
            for row in df.select(
                "i", apply_merge(F.col("sym"), l, r).alias("out")
            ).collect()
        }
        for i, s in enumerate(seqs):
            assert got[i] == " ".join(merge_word(s, l, r)), (l, r, s)


def test_apply_merge_boundary_consumption_regressions(spark):
    """The two shapes a naive single-space ' l r ' replace gets wrong —
    each match eats the next token's leading boundary: the alternating
    chain (misses every other merge in one pass) and, fatally, the
    same-symbol run, where a second pass CANNOT repair the damage
    ('a a a a a' under (a,a) must merge tokens (1,2),(3,4), never
    (1,2),(4,5)). The double-space encoding takes both canonically in
    one pass."""
    from pyspark.sql import functions as F

    from entity_extractor_spark.operators.bpe import apply_merge

    df = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "a a a a a")], "i long, sym string"
    )
    alt = df.where("i = 1").select(
        apply_merge(F.col("sym"), "a", "b").alias("s")
    ).head()["s"]
    assert alt == "ab ab ab ab"
    run = df.where("i = 2").select(
        apply_merge(F.col("sym"), "a", "a").alias("s")
    ).head()["s"]
    assert run == "aa aa a"


# ----------------------------------------------------------- bpe_doc_stats --


def test_doc_stats_counts_and_ratio(spark):
    from entity_extractor_spark.operators.bpe import bpe_doc_stats

    df = spark.createDataFrame(
        [(1, "thether"), (2, "er er THE")], "doc_id long, text string"
    )
    merges = [("t", "h"), ("th", "e"), ("e", "r")]
    out = {
        r["doc_id"]: r
        for r in bpe_doc_stats(df, "doc_id", "text", merges).collect()
    }
    # doc 1: one word 'thether': t h e t h e r -> th e th e r ->
    # the the r (e,r never adjacent) => 3 tokens over 7 chars
    assert out[1]["n_words"] == 1
    assert out[1]["n_chars_tokenized"] == 7
    assert out[1]["n_tokens"] == 3
    assert out[1]["tokens_per_word_ppm"] == 3_000_000
    # doc 2: 'er' 'er' 'the' -> one token each
    assert out[2]["n_words"] == 3
    assert out[2]["n_chars_tokenized"] == 7
    assert out[2]["n_tokens"] == 3
    assert out[2]["tokens_per_word_ppm"] == 1_000_000


def test_doc_stats_rank_order_matters(spark):
    from entity_extractor_spark.operators.bpe import bpe_doc_stats

    df = spark.createDataFrame([(1, "the")], "doc_id long, text string")
    good = bpe_doc_stats(df, "doc_id", "text", [("t", "h"), ("th", "e")]).head()
    assert good["n_tokens"] == 1  # t h e -> th e -> the
    swapped = bpe_doc_stats(
        df, "doc_id", "text", [("th", "e"), ("t", "h")]
    ).head()
    assert swapped["n_tokens"] == 2  # 'th e' rule fires before 'th' exists


def test_doc_stats_empty_doc_emits_no_row(spark):
    from entity_extractor_spark.operators.bpe import bpe_doc_stats

    df = spark.createDataFrame(
        [(1, "hi"), (2, "   ")], "doc_id long, text string"
    )
    out = bpe_doc_stats(df, "doc_id", "text", [("h", "i")]).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_doc_stats_rejects_bad_merges(spark):
    from entity_extractor_spark.operators.bpe import bpe_doc_stats

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for bad in ([], [("a", "")]):
        try:
            bpe_doc_stats(df, "doc_id", "text", bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_apply_chunking_matches_single_projection(spark):
    """A merge list longer than _APPLY_CHUNK must produce the same
    segmentation as canonical sequential application (the chunk
    boundary with its lazy checkpoint must be invisible)."""
    from entity_extractor_spark.operators import bpe as B

    # 60 merges: the first two do real work on 'aaab' ('a a a b' ->
    # 'aa a b' -> 'aa ab'), the rest are no-op filler pairs that still
    # push the list across the chunk boundary
    merges = [("a", "a"), ("a", "b")] + [
        (f"q{i}", f"q{i}") for i in range(58)
    ]
    words = spark.createDataFrame(
        [("aaab", 3), ("ab", 1)], "w string, cnt long"
    )
    got = {r["w"]: r["toks"] for r in B.bpe_apply(words, merges).collect()}
    assert got == {"aaab": "aa ab", "ab": "ab"}
    stats = B.bpe_doc_stats(
        spark.createDataFrame([(1, "aaab ab")], "doc_id long, text string"),
        "doc_id", "text", merges,
    ).head()
    assert stats["n_words"] == 2
    assert stats["n_chars_tokenized"] == 6
    assert stats["n_tokens"] == 3  # 'aa ab' + 'ab'
