"""Distributed BPE tokenizer training — the vocabulary-building step of a
training-data pipeline, as pure relational algebra.

The reference chunks text for embedding with a character budget
(`embedding_service.py:36-68`); a real LLM data pipeline additionally
needs the tokenizer itself trained ON the corpus at corpus scale. BPE
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") is the standard: start from characters, repeatedly merge
the most frequent adjacent symbol pair. text_quality.pair_counts exposes
one round of candidates; this module runs the full training loop and the
encoder, exactly, with no Python in the hot path.

Scale design — the whole loop runs on the WORD HISTOGRAM, not the corpus:
one corpus scan builds (word, count) [algebraic groupBy, map-side
combinable], and every merge round after that touches only the distinct
words (~10^8 rows at 100 TB vs 10^13 corpus tokens — five orders of
magnitude less). A word's working symbolization is a single-space-joined
STRING, not a positional token table, so each round is exactly

    one zip-two-shifted-slices pair explode + ONE algebraic weighted
    pair-count agg (map-side partials absorb hot pairs),
    a 1-row driver collect for the argmax (the pagerank scalar pattern —
    NEVER a 1-row crossJoin, which plans as BNLJ), and
    one whole-stage-codegen literal string replace (three, counting the
    separator encode/collapse around it).

Zero windows, zero joins, zero per-word sorts per round — the earlier
token-table formulation of this module spent ~5 word-partitioned window
sorts per round (lead, run-grouping, run-rank, lag, renumber) over
one-row-per-CHARACTER; at 10^9 token rows x 10^3 merge rounds those sorts
are the bottleneck, and the string form deletes them while provably
computing the same function (fuzzed against the same pure-Python
reference in tests/test_bpe.py). localCheckpoint per round keeps the plan
from growing with rounds.

Semantics (identical on Spark and the DuckDB oracle, which still replays
the run-parity window formulation — two INDEPENDENT formulations agreeing
is the point of the contract):
  * pair counting: every adjacent occurrence, sliding ("aaa" counts
    (a,a) twice), weighted by word frequency — Sennrich's convention;
  * best pair: max count, ties by (left, right) ascending — deterministic
    on any engine with binary string ordering;
  * merge application: strict leftmost-greedy non-overlapping — i.e.
    within a run of k consecutive matches (only possible when left ==
    right, e.g. (g,g) over "ggg"), the 1st, 3rd, ... merge. Expressed as
    ONE plain-string replace over a DOUBLE-SPACE separator encoding:
    pad to ' tok1  tok2  ...  tokN ' and replace ' l  r ' with ' lr '.
    Each match consumes only the FIRST of the two spaces before the
    following token, so exactly one space — the same boundary shape as
    the string start — is left behind and the engine's left-to-right
    non-overlapping scan continues seamlessly into it: every canonical
    leftmost-greedy merge is taken in a single pass. (A naive
    single-space replace of ' l r ' is NOT canonical: its match eats
    the next token's leading boundary, so over ' a a a a a ' with rule
    (a,a) it merges tokens (1,2),(4,5) instead of (1,2),(3,4) —
    regression-pinned in tests/test_bpe.py alongside a randomized
    equivalence proof against the Python reference.) Symbols never
    contain spaces, so the padded pattern only matches at true symbol
    boundaries; decoding is collapse-double-spaces + trim.
No end-of-word sentinel: merges never cross word boundaries because each
word is its own symbol string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def word_histogram(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): whitespace-split lowercase alphabetic words with corpus
    frequencies — the only pass over the corpus; everything downstream is
    histogram-sized."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def char_split(word: Column) -> Column:
    """Seed symbolization: the word's characters joined by single spaces
    ('bana' -> 'b a n a'). regexp_replace('(.)', '$1 ') + trim — pure
    string ops any ANSI engine replays (DuckDB: same regex with the 'g'
    flag and \\1)."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def apply_merge(sym: Column, left: str, right: str) -> Column:
    """Merge every (left, right) adjacency in a space-joined symbol
    string with canonical leftmost-greedy semantics, in ONE pass:
    re-encode with double-space separators, literal-replace
    ' l  r ' -> ' lr ' (each match leaves one boundary space behind —
    see module docstring), collapse separators, trim. Plain codegen'd
    string ops, no regex, no windows."""
    padded = F.concat(
        F.lit(" "),
        F.replace(sym, F.lit(" "), F.lit("  ")),
        F.lit(" "),
    )
    merged = F.replace(
        padded, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
    )
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


def _pair_counts(work: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the (sym, cnt) working table —
    the zip-two-shifted-slices construction (cheapest HOF form, see
    text_quality.pair_counts), then ONE algebraic agg."""
    toks = F.split(F.col("sym"), " ")
    width = F.size(toks) - 1
    zipped = F.arrays_zip(F.slice(toks, 1, width), F.slice(toks, 2, width))
    return (
        work.where(F.size(toks) >= 2)
        .select("cnt", F.explode(zipped).alias("pr"))
        .groupBy(
            F.col("pr")["0"].alias("lhs"), F.col("pr")["1"].alias("rhs")
        )
        .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
    )


def bpe_train(
    docs: DataFrame, text_col: str, rounds: int
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Train `rounds` BPE merges over the corpus. Returns (merges_df,
    merges_list) where merges_df is (round, lhs, rhs, pair_count) and the
    list drives bpe_apply / encode without a second collect. Round r's
    counts see the corpus as rewritten by rounds 1..r-1 — the defining
    property of BPE vs a one-shot pair ranking. Stops early (fewer rows
    than `rounds`) when no pair is left to merge."""
    if type(rounds) is not int or rounds < 1:
        raise ValueError("rounds must be an int >= 1")
    spark = docs.sparkSession
    work = (
        word_histogram(docs, text_col)
        .select(char_split(F.col("w")).alias("sym"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(rounds):
        best = (
            _pair_counts(work)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, c = best[0].lhs, best[0].rhs, best[0].pair_count
        merges.append((lhs, rhs, c))
        work = work.select(
            apply_merge(F.col("sym"), lhs, rhs).alias("sym"), "cnt"
        ).localCheckpoint(eager=True)
    mdf = spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "round bigint, lhs string, rhs string, pair_count bigint",
    )
    return mdf, merges


_APPLY_CHUNK = 48  # merges fused per projection before a lineage cut


def _chunked_apply(
    df: DataFrame,
    sym_col: str,
    merges: list[tuple[str, str, int] | tuple[str, str]],
) -> DataFrame:
    """Apply a ranked merge list to `sym_col`, fusing _APPLY_CHUNK
    merges (3 literal replaces each) into one codegen projection and
    cutting the plan with a lazy localCheckpoint between chunks. A
    merge list is 10^3-10^5 rules in a real tokenizer; folding ALL of
    them into one Column nests ~3 * len(merges) expression nodes —
    Catalyst recursion and codegen method-size limits both give out
    long before 10^5. Lists at or under one chunk (every in-repo use)
    keep the single-projection plan with zero checkpoints."""
    keep = [c for c in df.columns if c != sym_col]
    for start in range(0, len(merges), _APPLY_CHUNK):
        sym = F.col(sym_col)
        for m in merges[start : start + _APPLY_CHUNK]:
            sym = apply_merge(sym, m[0], m[1])
        df = df.select(*keep, sym.alias(sym_col))
        if start + _APPLY_CHUNK < len(merges):
            df = df.localCheckpoint(eager=False)
    return df


def bpe_apply(
    words: DataFrame, merges: list[tuple[str, str, int] | tuple[str, str]]
) -> DataFrame:
    """Segment every word with the learned merges, in learned order —
    BPE inference over the (w, cnt) histogram. Output (w, cnt, toks):
    final tokens joined by ' ' in position order (sorted-CSV doctrine:
    one deterministic row per word, replayable as string_agg ORDER BY).
    At serving time the encoded histogram joins back to the corpus by
    word — the corpus itself is never re-segmented row by row.

    The merge chain is 3 literal replaces per merge fused into codegen
    projections of _APPLY_CHUNK merges each, with a lazy lineage cut
    between chunks (one projection, no checkpoints, for lists up to one
    chunk — see _chunked_apply for why unbounded fusion breaks at
    tokenizer-sized merge lists)."""
    seeded = words.select(
        "w", "cnt", char_split(F.col("w")).alias("toks")
    )
    return _chunked_apply(seeded, "toks", list(merges))


def bpe_doc_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int] | tuple[str, str]],
) -> DataFrame:
    """Tokenize a corpus document-by-document with a learned merge list
    and report the compression it buys. Per document:

        (id, n_words, n_chars_tokenized, n_tokens, tokens_per_word_ppm)

    n_tokens counts post-merge symbols across the doc's words;
    n_chars_tokenized counts pre-merge symbols (characters), so
    n_tokens / n_chars is the sequence-length saving of the merge list.
    tokens_per_word_ppm = n_tokens * 10^6 div n_words (exact BIGINT).
    Tokenization here is RAW whitespace words (\\s+, no alphabetic
    filter — the oov_stats convention): a tokenizer budget report must
    count every word the model will actually see, not just the clean
    ones the trainer learned from. Docs with no words emit no row (0/0
    undefined).

    Scale: the merge chain is 3 literal replaces per merge fused into
    codegen projections of _APPLY_CHUNK merges each over the exploded
    words (single projection for lists up to one chunk; lazy lineage
    cut between chunks — see _chunked_apply); the only exchange is
    the doc-keyed algebraic rollup."""
    if not merges or not all(len(m) >= 2 and m[0] and m[1] for m in merges):
        raise ValueError(
            "bpe_doc_stats: merges must be non-empty (left, right[, n]) tuples"
        )
    words = df.select(
        F.col(id_col).alias(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).where(F.col("word") != "")
    sym0 = char_split(F.col("word"))
    seeded = words.select(
        id_col,
        F.size(F.split(sym0, " ")).alias("_nc"),
        sym0.alias("_sym"),
    )
    applied = _chunked_apply(seeded, "_sym", list(merges))
    return (
        applied.select(
            id_col,
            "_nc",
            F.size(F.split(F.col("_sym"), " ")).alias("_nt"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("_nc").cast("long").alias("n_chars_tokenized"),
            F.sum("_nt").cast("long").alias("n_tokens"),
        )
        .select(
            id_col,
            "n_words",
            "n_chars_tokenized",
            "n_tokens",
            F.expr("n_tokens * 1000000 div n_words").alias(
                "tokens_per_word_ppm"
            ),
        )
    )
