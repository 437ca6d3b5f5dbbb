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
combinable], and every merge round after that touches only
sum(len(distinct words)) token rows (~10^8 at 100 TB vs 10^13 corpus
tokens — five orders of magnitude less). Per round: one lead() window,
one algebraic pair-count agg, a 1-row driver collect for the argmax
(the pagerank scalar pattern — NEVER a 1-row crossJoin, which plans as
BNLJ), and one window-rebuild — all partitioned by word, so every round
reuses one hash exchange. localCheckpoint per round keeps the plan from
growing with rounds.

Semantics (identical on Spark and the DuckDB oracle, fuzzed against a
pure-Python reference in tests):
  * pair counting: every adjacent occurrence, sliding ("aaa" counts
    (a,a) twice), weighted by word frequency — Sennrich's convention;
  * best pair: max count, ties by (left, right) ascending — deterministic
    on any engine with binary string ordering;
  * merge application: strict leftmost-greedy non-overlapping — i.e.
    within a run of k consecutive matches (only possible when left ==
    right, e.g. (g,g) over "ggg"), the 1st, 3rd, ... merge. Expressed
    relationally: match positions -> consecutive-run grouping (pos -
    row_number) -> odd-rank parity filter -> rebuild with the merged
    token replacing the pair and the consumed position dropped.
No end-of-word sentinel: merges never cross word boundaries because the
token table never had rows spanning words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _w() -> Window:
    # built lazily: Window specs need an active session
    return Window.partitionBy("w").orderBy("pos")


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


def char_tokens(words: DataFrame) -> DataFrame:
    """Seed token table (w, cnt, pos, tok): one row per character,
    positional substring so the oracle's generate_series replay is
    symbol-for-symbol identical."""
    return words.select(
        "w",
        "cnt",
        F.explode(F.expr("sequence(1, length(w))")).alias("pos"),
    ).select(
        "w",
        "cnt",
        F.col("pos").cast("int").alias("pos"),
        F.expr("substring(w, pos, 1)").alias("tok"),
    )


def _pair_counts(tokens: DataFrame) -> DataFrame:
    t = tokens.withColumn("nxt", F.lead("tok").over(_w()))
    return (
        t.where(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("lhs"), F.col("nxt").alias("rhs"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def merge_round(tokens: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Apply ONE merge (lhs, rhs) -> lhs||rhs with strict leftmost-greedy
    semantics (module docstring), returning the renumbered token table."""
    t = tokens.withColumn("nxt", F.lead("tok").over(_w()))
    matches = t.where((F.col("tok") == lhs) & (F.col("nxt") == rhs)).select(
        "w", "pos"
    )
    keep = (
        matches.withColumn("grp", F.col("pos") - F.row_number().over(_w()))
        .withColumn(
            "rnk",
            F.row_number().over(Window.partitionBy("w", "grp").orderBy("pos")),
        )
        .where(F.col("rnk") % 2 == 1)
        .select("w", "pos", F.lit(1).alias("m"))
    )
    j = t.join(keep, ["w", "pos"], "left").withColumn(
        "m", F.coalesce("m", F.lit(0))
    )
    j = j.withColumn("prevm", F.coalesce(F.lag("m").over(_w()), F.lit(0)))
    return (
        j.where(F.col("prevm") == 0)
        .select(
            "w",
            "cnt",
            "pos",
            F.when(F.col("m") == 1, F.concat("tok", "nxt"))
            .otherwise(F.col("tok"))
            .alias("tok"),
        )
        .withColumn("pos", F.row_number().over(_w()).cast("int"))
    )


def bpe_train(
    docs: DataFrame, text_col: str, rounds: int
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Train `rounds` BPE merges over the corpus. Returns (merges_df,
    merges_list) where merges_df is (round, lhs, rhs, pair_count) and the
    list drives bpe_apply / encode without a second collect. Stops early
    (fewer rows than `rounds`) when no pair is left to merge."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    spark = docs.sparkSession
    tokens = char_tokens(word_histogram(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str, int]] = []
    for r in range(1, rounds + 1):
        best = (
            _pair_counts(tokens)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, c = best[0].lhs, best[0].rhs, best[0].pair_count
        merges.append((lhs, rhs, c))
        tokens = merge_round(tokens, lhs, rhs).localCheckpoint(eager=True)
    mdf = spark.createDataFrame(
        [(i + 1, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "round bigint, lhs string, rhs string, pair_count bigint",
    )
    return mdf, merges


def bpe_apply(
    words: DataFrame, merges: list[tuple[str, str, int] | tuple[str, str]]
) -> DataFrame:
    """Segment every word with the learned merges, in learned order —
    BPE inference over the (word, cnt) histogram. Output (w, cnt, toks):
    final tokens joined by ' ' in position order (sorted-CSV doctrine:
    one deterministic row per word, replayable as string_agg ORDER BY).
    At serving time the encoded histogram joins back to the corpus by
    word — the corpus itself is never re-segmented row by row."""
    tokens = char_tokens(words)
    for i, m in enumerate(merges):
        tokens = merge_round(tokens, m[0], m[1])
        # bound lineage the same way training does, but only every few
        # rounds: apply has no per-round action forcing evaluation
        if (i + 1) % 4 == 0:
            tokens = tokens.localCheckpoint(eager=True)
    return tokens.groupBy("w", "cnt").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)"),
            " ",
        ).alias("toks")
    )
