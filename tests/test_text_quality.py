

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


def test_distinctive_terms_bruteforce(spark):
    """Exact-integer lift replayed in Python fractions; top-k set and
    ordering-free equality per group."""
    from fractions import Fraction
    from collections import Counter, defaultdict

    rows = [
        (1, "aa bb aa cc", "g1"), (2, "aa aa bb", "g1"), (3, "cc dd", "g1"),
        (4, "dd dd ee dd", "g2"), (5, "ee ff dd dd", "g2"), (6, "aa dd", "g2"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    from entity_extractor_spark.operators.text_quality import distinctive_terms

    got = {
        (r["lang"], r["term"]): (r["tf_g"], r["lift_nano"])
        for r in distinctive_terms(df, "doc_id", "text", "lang", k=2, min_tf=2).collect()
    }

    tf_g: Counter = Counter()
    for _, text, g in rows:
        for t in text.split():
            tf_g[(g, t)] += 1
    tf_all: Counter = Counter()
    g_tok: Counter = Counter()
    for (g, t), c in tf_g.items():
        tf_all[t] += c
        g_tok[g] += c
    total = sum(tf_g.values())
    lifts = {
        (g, t): (c, int(Fraction(c * 10**9 * total, tf_all[t] * g_tok[g])))
        for (g, t), c in tf_g.items()
        if c >= 2
    }
    expect = {}
    by_g: dict[str, list] = defaultdict(list)
    for (g, t), (c, l) in lifts.items():
        by_g[g].append((t, c, l))
    for g, items in by_g.items():
        for t, c, l in sorted(items, key=lambda x: (-x[2], x[0]))[:2]:
            expect[(g, t)] = (c, l)
    assert got == expect


def test_pair_counts_bruteforce(spark):
    from collections import Counter

    rows = [(1, "a b a b c"), (2, "a b"), (3, "x"), (4, ""), (5, "b c b c b c")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    from entity_extractor_spark.operators.text_quality import pair_counts

    got = [(r["pair"], r["tf"], r["df"]) for r in pair_counts(df, "doc_id", "text", k=3).collect()]
    tf: Counter = Counter()
    docs: dict[str, set] = {}
    for did, text in rows:
        ts = text.split()
        for a, b in zip(ts, ts[1:]):
            tf[f"{a} {b}"] += 1
            docs.setdefault(f"{a} {b}", set()).add(did)
    expect = [
        (p, c, len(docs[p]))
        for p, c in sorted(tf.items(), key=lambda x: (-x[1], x[0]))[:3]
    ]
    assert got == expect


def test_inverted_index_replay_and_cap(spark):
    import hashlib

    from entity_extractor_spark.operators.text_quality import inverted_index

    docs = [(i, "alpha beta " + ("alpha " if i % 2 == 0 else "gamma ") * 2) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.term: (r.df, r.cf, r.n_postings, r.postings_csv)
           for r in inverted_index(df, "doc_id", "text", max_postings=5).collect()}
    # python replay
    from collections import defaultdict
    tf = defaultdict(dict)
    for d, text in docs:
        for t in text.strip().lower().split():
            tf[t][d] = tf[t].get(d, 0) + 1
    for t, per in tf.items():
        dfx, cfx = len(per), sum(per.values())
        ranked = sorted(per, key=lambda d: (hashlib.md5(f"{d}|post0".encode()).hexdigest(), d))[:5]
        csv = ",".join(str(d) for d in sorted(ranked))
        assert out[t] == (dfx, cfx, min(5, dfx), csv), t
    # hub term (alpha: df 20) capped at 5; rare term uncapped
    assert out["alpha"][0] == 20 and out["alpha"][2] == 5
    assert out["gamma"][0] == 10 and out["gamma"][2] == 5
    assert out["beta"][0] == 20
