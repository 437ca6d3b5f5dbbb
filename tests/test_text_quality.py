

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


# ------------------------------------------- duplicated n-grams (substring) --

def _brute_dup_ngrams(rows, n):
    """pure-Python replay: per-doc positional n-grams, cross-doc dup flag."""
    grams = {}  # doc -> list of gram strings (with multiplicity)
    for d, text in rows:
        t = text.strip().lower().split()
        grams[d] = [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
    owners = {}
    for d, gs in grams.items():
        for g in gs:
            owners.setdefault(g, set()).add(d)
    out = {}
    for d, gs in grams.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if len(owners[g]) > 1)
        out[d] = (len(gs), dup, dup * 1_000_000 // len(gs))
    return out


def test_duplicated_ngrams_brute(spark):
    """Random overlapping corpus vs the pure-Python replay — totals, dup
    counts, and the ppm floor all exact; short docs absent."""
    import random

    from entity_extractor_spark.operators.text_quality import duplicated_ngrams

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 9))))
        for d in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.ngrams_total, r.ngrams_dup, r.dup_ppm)
        for r in duplicated_ngrams(df, "doc_id", "text", n=3).collect()
    }
    assert got == _brute_dup_ngrams(rows, 3)


def test_duplicated_ngrams_cross_doc_only(spark):
    """A gram repeated 5x inside ONE doc but appearing nowhere else is NOT
    duplicated mass (that's repetition_signals' job); the same gram in two
    docs flags every position in both."""
    from entity_extractor_spark.operators.text_quality import duplicated_ngrams

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c a b c a b c"),  # self-repeating only
            (2, "x y z q r s"),
            (3, "x y z t u v"),  # shares exactly 'x y z' with 2
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.ngrams_total, r.ngrams_dup)
        for r in duplicated_ngrams(df, "doc_id", "text", n=3).collect()
    }
    assert got[1] == (13, 0)
    assert got[2] == (4, 1) and got[3] == (4, 1)


def test_duplicated_ngrams_rejects_bad_n(spark):
    import pytest

    from entity_extractor_spark.operators.text_quality import duplicated_ngrams

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicated_ngrams(df, "doc_id", "text", n=0)


# --------------------------------------------------- bigram LM quality score --

def _brute_lm(train_rows, score_rows):
    from collections import Counter

    def bigrams(text):
        t = text.strip().lower().split()
        return [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]

    c_bg = Counter(g for _, tx in train_rows for g in bigrams(tx))
    c_w1 = Counter()
    for g, c in c_bg.items():
        c_w1[g.split(" ")[0]] += c
    v = len(c_w1) + 1
    out = {}
    for d, tx in score_rows:
        gs = bigrams(tx)
        if not gs:
            continue
        total = sum(
            (c_bg.get(g, 0) + 1) * 1_000_000 // (c_w1.get(g.split(" ")[0], 0) + v)
            for g in gs
        )
        out[d] = (len(gs), total // len(gs))
    return out


def test_lm_bigram_score_brute(spark):
    """Random train/score corpora vs a pure-Python Laplace replay — all
    three smoothing branches (seen bigram, unseen bigram w/ known prefix,
    unknown prefix) carry mass; weighted floor-mean exact."""
    import random

    from entity_extractor_spark.operators.text_quality import lm_bigram_score

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(8)]
    mk = lambda d, lo, hi: (  # noqa: E731
        d,
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(lo, hi))),
    )
    train = [mk(d, 2, 12) for d in range(30)]
    score = [mk(d, 0, 10) for d in range(100, 140)] + [
        (990, "zz qq zz"),  # wholly unknown prefixes -> uniform floor
        (991, train[0][1]),  # pure reference phrasing
    ]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.lm_score_ppm)
        for r in lm_bigram_score(tdf, sdf, "doc_id", "text").collect()
    }
    assert got == _brute_lm(train, score)


def test_lm_bigram_score_orders_fluency(spark):
    """The filter property: reference-like text outscores mixed text,
    which outscores gibberish with unknown words."""
    from entity_extractor_spark.operators.text_quality import lm_bigram_score

    train = spark.createDataFrame(
        [
            (101, "the cat sat on the mat"),
            (102, "the cat sat on a hat"),
            (103, "the dog sat on the mat"),
        ],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ate a fish"),
            (3, "zq vrk plm wxt qqj"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.lm_score_ppm
        for r in lm_bigram_score(train, score, "doc_id", "text").collect()
    }
    assert got[1] > got[2] > got[3]


def test_duplicated_ngrams_blank_docs_absent_under_n1(spark):
    """Regression: split('') yields [''] — under n=1 that phantom token
    made two blank docs flag each other 100%-duplicated. Blank/whitespace
    docs must be absent at EVERY n; real n=1 token overlap still counts."""
    from entity_extractor_spark.operators.text_quality import duplicated_ngrams

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "alpha beta"), (4, "beta gamma"), (5, None)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.ngrams_total, r.ngrams_dup)
        for r in duplicated_ngrams(df, "doc_id", "text", n=1).collect()
    }
    assert got == {3: (2, 1), 4: (2, 1)}


def test_centroid_scores_classifies_and_guards(spark):
    import pytest

    from entity_extractor_spark.operators.text_quality import centroid_scores

    train = spark.createDataFrame(
        [
            (1, "cat cat dog", "pets"),
            (2, "dog cat cat cat", "pets"),
            (3, "stock bond market", "finance"),
            (4, "bond market market", "finance"),
        ],
        "doc_id long, text string, label string",
    )
    score = spark.createDataFrame(
        [(10, "cat dog cat"), (11, "market bond"), (12, "   ")],
        "doc_id long, text string",
    )
    rows = centroid_scores(train, score, "doc_id", "text", "label").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.label] = r
    # pet-ish doc ranks pets first, finance doc ranks finance first
    assert by_doc[10]["pets"].rank == 1
    assert by_doc[11]["finance"].rank == 1
    # perfect-direction match: doc 11 "market bond" vs finance centroid
    # shares all mass -> score near 1e6; cross-class score strictly lower
    assert by_doc[11]["finance"].score_ppm > by_doc[11]["pets"].score_ppm
    # tokenless docs are unscorable and absent
    assert 12 not in by_doc
    # exact-math replay for one cell: doc 10 vs pets centroid
    # buckets collide only by md5; recompute via the operator's own parts
    assert 0 <= by_doc[10]["pets"].score_ppm <= 10**6
    bad = spark.createDataFrame(
        [(1, "x y", None)], "doc_id long, text string, label string"
    )
    with pytest.raises(Exception, match="NULL train label"):
        centroid_scores(bad, score, "doc_id", "text", "label").collect()


# ---------------------------------------------------------- c4_line_filter --


def test_c4_rules_and_attribution(spark):
    """Each rule drops its line; attribution goes to the FIRST failing
    rule (punct -> short -> block); kept lines reassemble in order."""
    from entity_extractor_spark.operators.text_quality import c4_line_filter

    doc = "\n".join(
        [
            "this line has enough words to pass.",   # kept
            "no terminal punctuation here at all",   # punct
            "too short.",                            # short
            "this line mentions javascript badly.",  # block
            "another good line with many words!",    # kept
            "   ",                                   # blank: vanishes
            "short no punct",                        # punct (first rule)
            'quoted line also counts as terminal?',  # kept (?)
        ]
    )
    out = c4_line_filter(
        spark.createDataFrame([(1, doc)], "doc_id long, text string"),
        "doc_id", "text", min_words=5, min_kept_lines=1,
        blocklist=("javascript",),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_lines"] == 7  # blank excluded
    assert r["n_kept"] == 3
    assert (r["dropped_punct"], r["dropped_short"], r["dropped_block"]) == (2, 1, 1)
    assert r["text"] == (
        "this line has enough words to pass.\n"
        "another good line with many words!\n"
        "quoted line also counts as terminal?"
    )


def test_c4_doc_gate_and_validation(spark):
    import pytest
    from entity_extractor_spark.operators.text_quality import c4_line_filter

    df = spark.createDataFrame(
        [(1, "one good line stays here tonight.\nbad"),
         (2, "first excellent line of this doc.\nsecond excellent line of this doc.")],
        "doc_id long, text string",
    )
    out = c4_line_filter(df, "doc_id", "text", min_words=5, min_kept_lines=2)
    assert [r["doc_id"] for r in out.collect()] == [2]
    with pytest.raises(ValueError, match="min_words"):
        c4_line_filter(df, "doc_id", "text", min_words=0)
    with pytest.raises(ValueError, match="blocklist"):
        c4_line_filter(df, "doc_id", "text", blocklist=())


def test_c4_blocklist_case_and_phrase(spark):
    """Blocklist matching is case-insensitive substring — phrases and
    braces (the published C4 entries) both fire."""
    from entity_extractor_spark.operators.text_quality import c4_line_filter

    df = spark.createDataFrame(
        [(1, "Lorem Ipsum dolor sit amet filler.\nvar x = {a: 1} in code line.\na perfectly clean sentence stays here.")],
        "doc_id long, text string",
    )
    r = c4_line_filter(df, "doc_id", "text", min_kept_lines=1).collect()[0]
    assert r["n_kept"] == 1 and r["dropped_block"] == 2
    assert r["text"] == "a perfectly clean sentence stays here."


# ------------------------------------------------------- cooccurrence_counts --


def test_cooccurrence_known_and_weights(spark):
    from entity_extractor_spark.operators.text_quality import cooccurrence_counts

    # "a b a": pairs within window 2: (a,b,d1), (b,a,d1), (a,a,d2)
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    out = {
        (r["w1"], r["w2"]): (r["n_pairs"], r["weight_ppm_sum"])
        for r in cooccurrence_counts(df, "doc_id", "text", window=2).collect()
    }
    assert out == {
        ("a", "b"): (2, 2_000_000),      # two d=1 co-occurrences
        ("a", "a"): (1, 500_000),        # self pair at d=2
    }


def test_cooccurrence_brute_force(spark):
    import random
    from collections import defaultdict

    from entity_extractor_spark.operators.text_quality import cooccurrence_counts

    rng = random.Random(13)
    docs = {
        d: " ".join(rng.choice("pqrs") for _ in range(rng.randrange(2, 30)))
        for d in range(15)
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n_pairs"], r["weight_ppm_sum"])
        for r in cooccurrence_counts(df, "doc_id", "text", window=3).collect()
    }
    want = defaultdict(lambda: [0, 0])
    for t in docs.values():
        toks = t.split()
        for i in range(len(toks)):
            for dd in range(1, 4):
                if i + dd < len(toks):
                    k = tuple(sorted((toks[i], toks[i + dd])))
                    want[k][0] += 1
                    want[k][1] += 1_000_000 // dd
    assert got == {k: tuple(v) for k, v in want.items()}


def test_cooccurrence_validation(spark):
    import pytest

    from entity_extractor_spark.operators.text_quality import cooccurrence_counts

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        cooccurrence_counts(df, "doc_id", "text", window=0)


# --------------------------------------------------------- pmi_collocations --


def test_pmi_python_replay(spark):
    from entity_extractor_spark.operators.ranking import log2fp_py
    from entity_extractor_spark.operators.text_quality import pmi_collocations

    pairs = [("a", "b", 8), ("a", "a", 2), ("b", "c", 1), ("c", "c", 5)]
    df = spark.createDataFrame(pairs, "w1 string, w2 string, n_pairs long")
    out = {
        (r["w1"], r["w2"]): (r["m1"], r["m2"], r["pmi_fp"])
        for r in pmi_collocations(df).collect()
    }
    T = sum(c for _, _, c in pairs)
    m = {}
    for x, y, c in pairs:
        m[x] = m.get(x, 0) + c
        m[y] = m.get(y, 0) + c  # self pairs count twice
    assert m == {"a": 12, "b": 9, "c": 11}
    for x, y, c in pairs:
        q = max(c * T * 1_048_576 // (m[x] * m[y]), 1)
        want = log2fp_py(q, 6) - 20 * 64
        assert out[(x, y)] == (m[x], m[y], want), (x, y)
    # sanity: the strongly-associated pair scores above the weak one
    assert out[("a", "b")][2] > out[("b", "c")][2]


def test_pmi_clamp_floor(spark):
    """A pair 20+ bits anti-correlated floors at -1280 instead of
    raising (q clamps to 1)."""
    from entity_extractor_spark.operators.text_quality import pmi_collocations

    pairs = [("x", "y", 1), ("x", "x", 10_000_000), ("y", "y", 10_000_000)]
    df = spark.createDataFrame(pairs, "w1 string, w2 string, n_pairs long")
    out = {
        (r["w1"], r["w2"]): r["pmi_fp"] for r in pmi_collocations(df).collect()
    }
    assert out[("x", "y")] == -1280


def test_c4_page_blocklist_drops_whole_document(spark):
    """page_blocklist reproduces the published C4 page-level rules: a doc
    containing 'lorem ipsum' or '{' anywhere vanishes entirely (no output
    row), while the line-level blocklist only drops the matching line
    (ADVICE r04). Matching is case-insensitive substring over the whole
    document text."""
    from entity_extractor_spark.operators.text_quality import c4_line_filter

    df = spark.createDataFrame(
        [
            (1, "a perfectly clean first sentence here.\nanother clean sentence follows it now."),
            (2, "Lorem Ipsum dolor sit amet filler text.\na clean sentence that would survive alone."),
            (3, "code sample with braces {x: 1} inline.\nclean enough sentence in the same page."),
        ],
        "doc_id long, text string",
    )
    out = c4_line_filter(
        df, "doc_id", "text", min_kept_lines=1,
        blocklist=("javascript",),
        page_blocklist=("lorem ipsum", "{"),
    )
    assert [r["doc_id"] for r in out.orderBy("doc_id").collect()] == [1]
    # without page_blocklist the historical line-level contract is unchanged
    line_only = c4_line_filter(df, "doc_id", "text", min_kept_lines=1)
    assert [r["doc_id"] for r in line_only.orderBy("doc_id").collect()] == [1, 2, 3]


# ------------------------------------------------------------ gopher_rules --


def test_gopher_rules_each_rule_fires(spark):
    """One doc per rule violation plus one clean keeper; every published
    rule column carries the exact ppm value a hand computation gives."""
    from entity_extractor_spark.operators.text_quality import gopher_rules

    good = " ".join(["the", "report", "covers", "sample", "data"] * 12)  # 60 words
    rows = [
        (1, good),                                              # keeps
        (2, "the tiny doc."),                                   # word_count < 50
        (3, " ".join(["to", "of", "be", "at", "it", "we"] * 10)),  # mean len < 3
        (4, " ".join(["the#tag" if i % 5 == 0 else "plain" for i in range(60)]) + " the and of"),  # symbol > 0.1
        (5, "\n".join(["- bullet line item"] * 10) + "\nthe and of " + " ".join(["w"] * 3)),  # bullets > 0.9 (and fails mean-len anyway)
        (6, " ".join(["1234" if i % 3 else "5678" for i in range(60)]) + " the and"),  # alpha < 0.8
        (7, " ".join(["plain", "words", "without", "common", "stops"] * 12)),  # 0 stopword hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # min_stopword_hits=1: the keeper doc carries only 'the' of the Gopher
    # stopword set (the same reason the contract query relaxes it)
    out = {
        r["doc_id"]: r
        for r in gopher_rules(df, "doc_id", "text", min_stopword_hits=1).collect()
    }
    assert out[1]["keep"] is True
    assert out[1]["word_count"] == 60
    assert out[1]["mean_word_len_ppm"] == 5000000
    for d in (2, 3, 7):
        assert out[d]["keep"] is False, d
    assert out[2]["word_count"] == 3
    assert out[3]["mean_word_len_ppm"] == 2000000
    assert out[4]["symbol_word_ppm"] > 100000
    assert out[6]["alpha_word_ppm"] < 800000
    assert out[7]["stopword_hits"] == 0


def test_gopher_rules_zero_words_and_ppm_exactness(spark):
    from entity_extractor_spark.operators.text_quality import gopher_rules

    df = spark.createDataFrame(
        [(1, ""), (2, "   \n  \n"), (3, "alpha beta gamma"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text").collect()}
    # NULL text == empty text: deterministic word_count=0 / keep=False,
    # never NULL stats (ADVICE r04 — a .where(keep)/.where(~keep) pair
    # must partition the corpus, not silently drop NULL-text docs).
    for d in (1, 2, 4):
        assert out[d]["word_count"] == 0
        assert out[d]["mean_word_len_ppm"] == 0
        assert out[d]["keep"] is False
    # 3 words, 14 chars -> 14*1e6 div 3 = 4666666 (truncated, both engines)
    assert out[3]["mean_word_len_ppm"] == 4666666
    assert out[3]["alpha_word_ppm"] == 1000000
