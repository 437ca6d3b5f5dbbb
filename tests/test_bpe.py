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
