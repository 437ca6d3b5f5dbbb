"""duplicate_substring_spans gates — the ExactSubstr (Lee et al. 2021)
span-level dedup: cross-doc-only firing, interval merging, ppm coverage,
and a pure-Python brute-force replay on a seeded corpus."""

from __future__ import annotations

import random

from entity_extractor_spark.operators.dedupe import duplicate_substring_spans


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_shared_sentence_spans(spark):
    """Two docs sharing an exact >=L region each get one span covering
    exactly that region; the unrelated doc is absent."""
    shared = "the quick brown fox jumps over the lazy dog again"
    # distinct boundary chars on each side so the duplicated region is
    # EXACTLY `shared` (a common adjacent space would legitimately extend
    # the span by one char — the operator is char-exact, not word-exact)
    d1 = "XXXX-" + shared + "+YYYY tail one"
    d2 = "prefix words here_" + shared + "=other suffix"
    d3 = "completely unrelated content with nothing shared at all ok"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = _rows(duplicate_substring_spans(df, "doc_id", "text", 30, 2))
    assert set(out) == {1, 2}
    # every 30-gram inside `shared` occurs in both docs; coverage is the
    # full shared region in each doc (start at its local offset)
    s1 = d1.index(shared)
    s2 = d2.index(shared)
    assert out[1]["spans_csv"] == f"{s1}-{s1 + len(shared)}"
    assert out[2]["spans_csv"] == f"{s2}-{s2 + len(shared)}"
    assert out[1]["n_spans"] == 1 and out[2]["n_spans"] == 1
    assert out[1]["dup_chars"] == len(shared)
    assert out[1]["dup_ppm"] == len(shared) * 1_000_000 // len(d1)


def test_within_doc_repeat_does_not_fire(spark):
    """min_docs counts DISTINCT docs: a 30-gram repeated twice inside one
    doc but nowhere else must not mark anything."""
    block = "abcdefghijklmnopqrstuvwxyz0123"  # exactly 30 chars
    d1 = block + " middle filler words " + block
    df = spark.createDataFrame(
        [(1, d1), (2, "nothing in common with doc one at all here")],
        "doc_id long, text string",
    )
    out = _rows(duplicate_substring_spans(df, "doc_id", "text", 30, 2))
    assert out == {}


def test_overlapping_regions_merge(spark):
    """Two shared regions that overlap in doc 1 merge into one maximal
    span; disjoint shared regions stay separate spans."""
    a = "A" * 10 + "shared-region-one-padded-out-x" + "B" * 10
    b = "C" * 10 + "shared-region-two-padded-out-y" + "D" * 10
    # doc1 carries both regions back to back (touching -> merge),
    # doc2 carries region a, doc3 carries region b
    r1 = "shared-region-one-padded-out-x"
    r2 = "shared-region-two-padded-out-y"
    assert len(r1) == 30 and len(r2) == 30
    d1 = "QQ " + r1 + r2 + " ZZ"
    df = spark.createDataFrame(
        [(1, d1), (2, a), (3, b)], "doc_id long, text string"
    )
    out = _rows(duplicate_substring_spans(df, "doc_id", "text", 30, 2))
    assert out[1]["n_spans"] == 1  # touching intervals merged
    assert out[1]["dup_chars"] == 60
    assert out[2]["spans_csv"] == "10-40"
    assert out[3]["spans_csv"] == "10-40"


def test_short_docs_and_bad_gram_len(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "also short")], "doc_id long, text string"
    )
    assert duplicate_substring_spans(df, "doc_id", "text", 30, 2).count() == 0
    try:
        duplicate_substring_spans(df, "doc_id", "text", 1, 2)
        raise AssertionError("gram_len=1 must raise")
    except ValueError:
        pass


def _brute(docs: dict[int, str], L: int, min_docs: int):
    """Pure-Python replay: repeated-gram set, per-doc covered positions,
    merged spans."""
    occ: dict[str, set[int]] = {}
    for d, t in docs.items():
        for p in range(len(t) - L + 1):
            occ.setdefault(t[p : p + L], set()).add(d)
    rep = {g for g, ds in occ.items() if len(ds) >= min_docs}
    out = {}
    for d, t in docs.items():
        covered = set()
        for p in range(len(t) - L + 1):
            if t[p : p + L] in rep:
                covered.update(range(p, p + L))
        if not covered:
            continue
        spans = []
        for p in sorted(covered):
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + 1)
            else:
                spans.append([p, p + 1])
        out[d] = {
            "n_spans": len(spans),
            "dup_chars": sum(e - s for s, e in spans),
            "dup_ppm": sum(e - s for s, e in spans) * 1_000_000 // len(t),
            "spans_csv": ";".join(f"{s}-{e}" for s, e in spans),
        }
    return out


def test_brute_force_replay(spark):
    """Seeded pseudo-random corpus with planted shared blocks: operator
    output equals the pure-Python brute force exactly."""
    rng = random.Random(42)
    blocks = [
        "".join(rng.choice("abcd ") for _ in range(45)) for _ in range(4)
    ]
    docs = {}
    for d in range(12):
        parts = []
        for _ in range(3):
            if rng.random() < 0.5:
                parts.append(rng.choice(blocks))
            else:
                parts.append("".join(rng.choice("wxyz ") for _ in range(40)))
        docs[d] = " ".join(parts)
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = _rows(duplicate_substring_spans(df, "doc_id", "text", 30, 2))
    want = _brute(docs, 30, 2)
    assert set(got) == set(want)
    for d in want:
        for k in ("n_spans", "dup_chars", "dup_ppm", "spans_csv"):
            assert got[d][k] == want[d][k], (d, k, got[d][k], want[d][k])
