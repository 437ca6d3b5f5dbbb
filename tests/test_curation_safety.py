"""Edge cases for the curation-safety operators (repetition signals, PII
redaction, n-gram decontamination) that the driver corpus can't exercise:
degenerate docs, tie-breaks, zero-/full-overlap, multi-match redaction.
The corpus-level value check is the contract (CORRECTNESS) gate."""

from __future__ import annotations

from entity_extractor_spark.operators import contamination as C
from entity_extractor_spark.operators import text_quality as TQ


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_repetition_signals_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),          # top bigram: "a b" x2 ("b a" also 2 -> lex-min wins)
            (2, "x x x x"),            # fully degenerate: dup 0.75, "x x" x3 / 3
            (3, "one"),                # single token: no bigram
            (4, "p q r s"),            # all unique: every bigram count 1, lex-min "p q"
        ],
        "doc_id int, text string",
    )
    out = _rows(TQ.repetition_signals(docs, "doc_id", "text"))
    assert out[1]["top_bigram"] == "a b" and out[1]["top_bigram_count"] == 2
    assert out[1]["dup_token_frac"] == 0.6  # 5 tokens, 2 distinct
    assert out[2]["dup_token_frac"] == 0.75
    assert out[2]["top_bigram"] == "x x" and out[2]["top_bigram_frac"] == 1.0
    assert out[3]["n_tokens"] == 1 and out[3]["top_bigram"] is None
    assert out[3]["top_bigram_count"] is None and out[3]["top_bigram_frac"] is None
    assert out[3]["dup_token_frac"] == 0.0
    assert out[4]["top_bigram"] == "p q" and out[4]["top_bigram_count"] == 1


def test_pii_scan_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org, call 555-123-4567 twice 555-123-4567"),
            (2, "no pii here at all"),
            (3, "not-a-phone 12-34-56 and not@an@email"),
        ],
        "doc_id int, text string",
    )
    out = _rows(TQ.pii_scan(docs, "doc_id", "text"))
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 2
    assert "<EMAIL>" in out[1]["redacted"] and "<PHONE>" in out[1]["redacted"]
    assert "a@b.com" not in out[1]["redacted"] and "555-123-4567" not in out[1]["redacted"]
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    assert out[2]["redacted"] == "no pii here at all"
    # "not@an@email": the greedy local-part eats "not@an" leaving "@email"
    # with no TLD dot -> no full match; 12-34-56 fails the 3-3-4 shape
    assert out[3]["n_phones"] == 0


def test_pii_scan_email_swallows_phone_digits(spark):
    # a phone-shaped digit run inside an email local part is ONE email and
    # ZERO phones: n_phones is counted on the email-redacted text, so the
    # counts always reconcile with the placeholders in `redacted`
    docs = spark.createDataFrame(
        [(1, "reach me at 555-123-4567@example.com")], "doc_id int, text string"
    )
    out = _rows(TQ.pii_scan(docs, "doc_id", "text"))
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 0
    assert out[1]["redacted"] == "reach me at <EMAIL>"


def test_ngram_contamination_overlap(spark):
    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id int, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),  # 4 grams, 3 hit
            (2, "totally different words here now"),  # 3 grams, 0 hit
            (3, "too short"),  # < 3 tokens: absent from report
        ],
        "doc_id int, text string",
    )
    out = _rows(C.ngram_contamination(corpus, eval_docs, n=3))
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 4 and out[1]["n_hit"] == 3
    assert out[1]["contamination"] == 0.75
    assert out[2]["n_hit"] == 0 and out[2]["contamination"] == 0.0


def test_ngram_contamination_distinct_grams_count_once(spark):
    # a doc repeating one contaminated gram 3 times counts it ONCE
    eval_docs = spark.createDataFrame([(9, "a b c")], "doc_id int, text string")
    corpus = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id int, text string"
    )
    out = _rows(C.ngram_contamination(corpus, eval_docs, n=3))
    # distinct grams of doc 1: {a b c, b c a, c a b} -> 3 grams, 1 hit
    assert out[1]["n_grams"] == 3 and out[1]["n_hit"] == 1


def test_repetition_fold_matches_counter_oracle(spark):
    """Randomized batch property: the sorted-array longest-run fold must
    equal a Counter argmax with (count DESC, bigram ASC) tie-break. A
    5-word vocabulary forces heavy repetition and frequent count ties."""
    import random
    from collections import Counter

    rng = random.Random(42)
    vocab = ["a", "b", "c", "aa", "bb"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40))))
        for i in range(300)
    ]
    out = _rows(
        TQ.repetition_signals(
            spark.createDataFrame(docs, "doc_id int, text string"), "doc_id", "text"
        )
    )
    for i, text in docs:
        toks = text.split(" ")
        cnt = Counter(" ".join(p) for p in zip(toks, toks[1:]))
        best_bg, best_c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert out[i]["top_bigram"] == best_bg, (i, text)
        assert out[i]["top_bigram_count"] == best_c, (i, text)
        assert out[i]["top_bigram_frac"] == round(best_c / (len(toks) - 1), 6)
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["dup_token_frac"] == round(1 - len(set(toks)) / len(toks), 6)


def test_pii_scan_matches_python_re_oracle(spark):
    """Randomized batch property: counts and redaction equal Python `re`
    applying the same patterns (both engines' dialects contain them)."""
    import random
    import re

    rng = random.Random(7)
    pool = [
        "plain", "word", "x@y.io", "a.b-c@mail.example.org", "no@tld",
        "user+tag@host.museum", "555-123-4567", "5551234567", "12-34-5678",
        "@", "dot.", "a@b.c", "end99-888-7777x",
    ]
    docs = [
        (i, " ".join(rng.choice(pool) for _ in range(rng.randint(1, 15))))
        for i in range(200)
    ]
    out = _rows(
        TQ.pii_scan(
            spark.createDataFrame(docs, "doc_id int, text string"), "doc_id", "text"
        )
    )
    for i, text in docs:
        etext = re.sub(TQ.PII_EMAIL_RE, "<EMAIL>", text)
        assert out[i]["n_emails"] == len(re.findall(TQ.PII_EMAIL_RE, text)), text
        assert out[i]["n_phones"] == len(re.findall(TQ.PII_PHONE_RE, etext)), text
        assert out[i]["redacted"] == re.sub(TQ.PII_PHONE_RE, "<PHONE>", etext), text


def test_ngram_contamination_matches_set_oracle(spark):
    """Randomized batch property: overlap fractions equal pure-Python set
    arithmetic over distinct 3-grams."""
    import random

    rng = random.Random(99)
    vocab = [f"w{j}" for j in range(12)]
    mk = lambda lo, hi: " ".join(rng.choice(vocab) for _ in range(rng.randint(lo, hi)))
    eval_docs = [(1000 + i, mk(3, 20)) for i in range(10)]
    corpus = [(i, mk(1, 30)) for i in range(150)]

    def grams(text):
        t = text.split(" ")
        return {" ".join(t[j : j + 3]) for j in range(len(t) - 2)}

    eval_set = set().union(*[grams(t) for _, t in eval_docs])
    out = _rows(
        C.ngram_contamination(
            spark.createDataFrame(corpus, "doc_id int, text string"),
            spark.createDataFrame(eval_docs, "doc_id int, text string"),
            n=3,
        )
    )
    for i, text in corpus:
        g = grams(text)
        if not g:
            assert i not in out
            continue
        hit = len(g & eval_set)
        assert out[i]["n_grams"] == len(g), text
        assert out[i]["n_hit"] == hit, text
        assert out[i]["contamination"] == round(hit / len(g), 6)


def test_cross_split_leakage_bruteforce(spark):
    """Leakage join replayed in Python over synthetic pairs+labels; same-
    split pairs never leak, unlabeled endpoints drop out (inner join)."""
    from entity_extractor_spark.operators.contamination import cross_split_leakage

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (7, 99)], "doc1 bigint, doc2 bigint"
    )
    labels = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "train"),
         (5, "valid"), (6, "train"), (7, "train")],
        "doc_id bigint, split string",
    )
    got = {
        (r["doc1"], r["doc2"], r["split1"], r["split2"])
        for r in cross_split_leakage(pairs, labels).collect()
    }
    assert got == {
        (1, 2, "train", "test"),
        (2, 3, "test", "train"),
        (5, 6, "valid", "train"),
    }
