"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All formulas are built-in column expressions (codegen'd); the language-ID
marker profiles are a tiny broadcast literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

# toy n-gram/stopword marker profiles per language — the structure (argmax
# over marker-hit ratios) is the real operator; profiles are swappable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
    "zh": ["de", "shi", "le"],
}


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """whitespace tokens + BPE-ish regex tokens ([a-z]+ | digits | single
    non-space symbol) — the standard pre-tokenizer split."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
            )
        ).cast("long").alias("re_tokens"),
    )


def quality_exprs(text_col: str) -> dict:
    """The quality features + composite score as COLUMN EXPRESSIONS, so
    consumers (quality_score, the curation composite) can compute them
    inline in a single pass over the scan instead of a derive-then-join.
    Components are rounded before entering the score so every engine runs
    the identical IEEE double ops on identical inputs; no final round (a
    final round would sit on decimal-half landmines where engines' rounding
    modes differ)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_words = F.size(toks).cast("double")
    sw = F.size(
        F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(s) for s in STOPWORDS]), t))
    )
    mean_len = F.round(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")), F.lit(0.0), lambda a, x: a + x
        ) / n_words,
        6,
    )
    sw_ratio = F.round(sw / n_words, 6)
    score = F.least(
        F.lit(1.0),
        0.4 * F.least(n_words / 100.0, F.lit(1.0))
        + 0.3 * F.least(mean_len / 8.0, F.lit(1.0))
        + 0.3 * (1.0 - sw_ratio),
    )
    return {
        "n_words": n_words.cast("long"),
        "mean_token_len": mean_len,
        "stopword_ratio": sw_ratio,
        "quality": score,
    }


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """length / mean-token-length / stopword-ratio features + a composite
    score in [0,1]; rounded so any engine reproduces the exact doubles."""
    ex = quality_exprs(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[ex[name].alias(name) for name in ("n_words", "mean_token_len", "stopword_ratio", "quality")],
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word heuristic language ID: argmax over per-language marker-hit
    ratios, deterministic tie-break by language code."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        scores.append(F.struct((hits / F.size(toks)).alias("s"), F.lit(lang).alias("lang")))
    # argmax with lexicographic tie-break: sort by (-score, lang) -> first
    best = F.array_sort(
        F.array(*scores),
        lambda a, b: F.when(a["s"] > b["s"], -1)
        .when(a["s"] < b["s"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]
    return df.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("pred_lang"),
        F.round(best["s"], 6).alias("lang_score"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set of the
    lowercased text — whitespace/ordering/duplication-insensitive identity."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))), " ")
        ).alias("fp"),
    )


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style per-document repetition signals (Rae et al. 2021 §A1.1):
    duplicate-token fraction and most-frequent-bigram fraction — the
    standard boilerplate / degenerate-repetition filters a pre-training
    curation pass applies before quality scoring.

    Scale shape: per-document metrics must never shuffle, so everything is
    a narrow column expression over the token array. The top bigram is
    found by sorting the doc's bigram array and folding a longest-run scan
    (`aggregate` over a struct accumulator) — NOT by exploding bigrams and
    re-aggregating per doc, which would shuffle ~n_tokens rows per
    document on (doc_id, bigram) for a purely doc-local statistic.
    Tie-break: equal counts keep the lexicographically smallest bigram
    (strict `>` over the ascending-sorted array keeps the first max run).
    Docs with fewer than two tokens have no bigram (NULL top_bigram).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    dup_frac = F.round(
        F.lit(1.0) - F.size(F.array_distinct(toks)) / n.cast("double"), 6
    )
    bigrams = F.array_sort(
        F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    scan = F.aggregate(
        bigrams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(None).cast("string").alias("best_bg"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                > acc["best"],
                x,
            ).otherwise(acc["best_bg"]).alias("best_bg"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        dup_frac.alias("dup_token_frac"),
        scan["best_bg"].alias("top_bigram"),
        F.when(n >= 2, scan["best"]).cast("long").alias("top_bigram_count"),
        F.when(n >= 2, F.round(scan["best"] / (n - 1).cast("double"), 6)).alias(
            "top_bigram_frac"
        ),
    )


# PII patterns restricted to syntax both Java regex (Spark) and RE2
# (DuckDB) interpret identically: character classes, bounded repetition,
# \b word boundaries — no lookaround, no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII detection + redaction (emails, NANP-style phone numbers): per-doc
    match counts and the redacted text with matches replaced by typed
    placeholders. Pure codegen'd regexp expressions — one narrow pass, no
    shuffle, no Python. Precedence: email first, and n_phones is counted on
    the email-REDACTED text, so the counts always equal the placeholders
    present in `redacted` (a digit-run inside an address, e.g.
    '555-123-4567@x.com', is one email and zero phones)."""
    t = F.col(text_col)
    email_redacted = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(email_redacted, F.lit(PII_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(email_redacted, PII_PHONE_RE, "<PHONE>").alias("redacted"),
    )


def top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 50) -> DataFrame:
    """Corpus vocabulary head: top-k whitespace terms by total frequency
    (tf) with document frequency (df) — the first statistic a corpus
    curation pass computes (stopword discovery, boilerplate detection,
    tokenizer-vocab sanity).

    Scale shape: explode -> one (term)-keyed aggregation with map-side
    partials (count + count_distinct via two-level agg), then
    orderBy().limit(k) which Spark plans as distributed
    TakeOrderedAndProject — no global window, no single-task sort. The
    (tf DESC, term ASC) tie-break makes the top-k a deterministic SET, so
    the DuckDB oracle matches row-for-row."""
    toks = df.select(
        F.col(id_col).alias("_d"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    return (
        toks.groupBy("term")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("_d").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(k)
    )


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact type-1 percentiles of an integer column per group — the
    corpus length/size distribution report (p50/p90/p99 of document length
    per language/source) curators read before setting truncation and
    packing budgets. Type-1 = the value at rank ceil(p/100 * n), a pure
    integer definition: no interpolation, no floats, so every engine
    agrees bit-for-bit (percentile_approx and quantile_cont both
    interpolate in doubles and neither is cross-engine stable).

    Scale shape: the per-group ordering runs over DISTINCT (group, value)
    pairs, not rows — the row-level mass collapses first through an
    algebraic count (map-side partial), then one window over the collapsed
    table computes cumulative counts. A 10^9-row language with 10^4
    distinct lengths sorts 10^4 rows, where the naive row_number window
    (the DuckDB oracle's formulation, fine at oracle scale) would ship and
    sort all 10^9. Returns (group, pct, value) long-format.
    """
    from pyspark.sql import Window

    counts = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("val")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("grp").orderBy("val")
    cum = counts.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("grp"))
    )
    pcts = F.array(*[F.lit(int(p)) for p in percentiles])
    return (
        cum.withColumn("pct", F.explode(pcts))
        # target rank t = ceil(pct*n/100), pure integer arithmetic; the one
        # (group, value) row whose cumulative range [cum-cnt+1, cum]
        # covers t holds the percentile value
        .withColumn("t", F.expr("(pct * n + 99) div 100"))
        .where((F.col("cum") >= F.col("t")) & (F.col("cum") - F.col("cnt") < F.col("t")))
        .select(
            F.col("grp").alias(group_col),
            F.col("pct").cast("bigint").alias("pct"),
            F.col("val").alias(value_col),
        )
    )


def distinctive_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 10,
    min_tf: int = 5,
) -> DataFrame:
    """Terms over-represented in each group vs the whole corpus — the
    "what is this language/source/domain full of" diagnostic behind
    tokenizer-vocab allocation and contamination triage. Score is lift
    = P(term | group) / P(term), computed in 1e-9 FIXED-POINT INTEGER
    units ((tf_g * 10^9 * total) div (tf_all * group_tokens), DECIMAL(38,0)
    intermediates — widest product ~1e37 fits): no float division, so the
    ranking is bit-identical on every engine and partitioning (same
    discipline as graph.pagerank). min_tf suppresses the one-off-typo tail
    whose lift is spuriously maximal.

    Scale shape: explode -> (group, term) algebraic count, materialized
    ONCE (localCheckpoint) and reused by all three consumers (tf_all,
    group totals, the lift join) instead of re-exploding the corpus per
    branch; group totals join back as a broadcast; the grand total is a
    single scalar agg over the collapsed table (pagerank's vertex-count
    pattern — a crossJoin scalar attach would plan as a
    BroadcastNestedLoopJoin, which the plan audit forbids). The only big
    exchange is term-keyed. The final row_number()<=k per group takes the
    WindowGroupLimit map-side pre-prune."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf_g = toks.groupBy("grp", "term").agg(
        F.count(F.lit(1)).alias("tf_g")
    ).localCheckpoint(eager=True)
    tf_all = tf_g.groupBy("term").agg(F.sum("tf_g").alias("tf_all"))
    g_tokens = tf_g.groupBy("grp").agg(F.sum("tf_g").alias("g_tokens"))
    total = int(tf_g.agg(F.sum("tf_g")).collect()[0][0] or 0)

    from pyspark.sql import Window

    lifted = (
        tf_g.where(F.col("tf_g") >= min_tf)
        .join(tf_all, "term")
        .join(F.broadcast(g_tokens), "grp")
        .withColumn(
            "lift_nano",
            F.expr(
                f"CAST((CAST(tf_g AS DECIMAL(38,0)) * 1000000000 * {total}L)"
                " div (CAST(tf_all AS DECIMAL(38,0)) * g_tokens) AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("lift_nano"), F.asc("term"))
    return (
        lifted.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(F.col("grp").alias(group_col), "term", "tf_g", "lift_nano")
    )


def pair_counts(df: DataFrame, id_col: str, text_col: str, k: int = 50) -> DataFrame:
    """Corpus-global adjacent-token-pair statistics — the inner loop of
    BPE/WordPiece tokenizer training (the merge candidate list is exactly
    "most frequent adjacent pair") and the collocation head for boilerplate
    mining. Returns the top-k (pair, tf, df) by total frequency with
    (tf DESC, pair ASC) tie-break — a deterministic set.

    Scale shape: pair construction zips two shifted slices of the token
    array (one interpreted-lambda evaluation per pair — the cheap HOF
    form, see contamination._doc_ngrams); then ONE pair-keyed algebraic
    aggregation (map-side partials collapse the head pairs before the
    exchange) and a distributed orderBy().limit(k) =
    TakeOrderedAndProject. No global window, no driver data path.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    width = F.size(toks) - 1
    zipped = F.arrays_zip(F.slice(toks, 1, width), F.slice(toks, 2, width))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(zipped, lambda s: F.concat_ws(" ", s["0"], s["1"])),
    )
    return (
        df.select(F.col(id_col).alias("_d"), F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("_d").alias("df"))
        .orderBy(F.desc("tf"), F.asc("pair"))
        .limit(k)
    )


def build_vocab(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 1000
) -> DataFrame:
    """Frequency-rank tokenizer vocabulary: the vocab_size most frequent
    whitespace tokens, (term, tf). The (tf DESC, term ASC) tie-break makes
    the vocabulary a deterministic SET — the property a tokenizer build
    actually needs (same corpus => same vocab on any engine/partitioning).

    Scale shape: explode -> one term-keyed count with map-side partials,
    then orderBy().limit(V) = distributed TakeOrderedAndProject (V is
    tokenizer-sized, 10^4..10^5: far under the heap-per-task limit that
    makes giant limits dangerous)."""
    toks = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    return (
        toks.groupBy("term")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(vocab_size)
    )


def oov_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame | None = None,
    vocab_size: int = 1000,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a frequency-rank vocab:
    (id, total_tokens, oov_tokens, oov_ppm). The curation signal that
    decides whether a tokenizer's vocab covers a candidate corpus (high
    OOV => the doc fragments into bytes/unknowns and wastes sequence
    length).

    oov_ppm is exact integer arithmetic (oov * 10^6 DIV total) — bit-exact
    cross-engine, no float division. Docs whose text has no tokens have no
    row (0/0 is undefined), mirroring the oracle's join semantics.

    Scale shape: the vocab is tokenizer-sized so it broadcast-joins
    (explicit F.broadcast — never a shuffle on the heavy exploded side);
    the per-doc rollup is ONE doc-keyed aggregation with map-side partial
    counts. Nothing driver-side, no windows."""
    if vocab is None:
        vocab = build_vocab(df, id_col, text_col, vocab_size)
    toks = df.select(
        F.col(id_col).alias(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    marked = toks.join(
        F.broadcast(vocab.select("term", F.lit(1).alias("_in_v"))), "term", "left"
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").alias("total_tokens"),
        F.sum(F.when(F.col("_in_v").isNull(), 1).otherwise(0)).alias("oov_tokens"),
    )
    return per_doc.select(
        id_col,
        "total_tokens",
        "oov_tokens",
        F.expr("oov_tokens * 1000000 DIV total_tokens").alias("oov_ppm"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document distinctive keywords: the k terms with the highest
    integer TF-IDF score, score = tf * ((N * 10^6) DIV df) — term
    frequency in THIS doc times a fixed-point inverse document frequency
    (the pure-integer lift; no ln(), whose float rounding no two engines
    replay identically). Output (doc_id, term, tf, df, score) — the
    per-DOC counterpart of distinctive_terms' per-GROUP lift, and the
    keyword-extraction step of the reference's search indexing
    (keyword_search_service.py builds exactly a per-document term
    weighting in Python).

    Scale shape: one explode -> (doc, term) counts with map-side combine;
    document frequencies by a second agg over the (doc, term) pairs (input
    already deduplicated per doc, so df is a cheap count); N is one scalar
    agg-collect; the per-doc top-k is a rank<=k window on the doc key,
    which Spark's WindowGroupLimit pre-prunes map-side — a 10^9-term doc
    ships k rows per task, never its whole vocabulary. Ties break by
    (score DESC, term ASC): a total order, so the result is a
    deterministic SET."""
    if k <= 0:
        raise ValueError("k must be > 0")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    dt = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    n_docs = dt.select("doc_id").distinct().count()
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = dt.join(dfreq, "term").withColumn(
        "score", F.expr(f"tf * (({n_docs}L * 1000000L) DIV df)")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_postings: int = 100,
    salt: str = "post0",
) -> DataFrame:
    """Capped inverted-index export: per whitespace term, its document
    frequency, corpus frequency, and a deterministic sample of up to
    max_postings doc ids — the retrieval-side artifact a corpus engine
    ships to search/RAG infrastructure, and the exact-index sibling of
    the hashed-TF vectors the ANN path uses.

    The posting sample is the max_postings md5-smallest doc ids (same
    fixed-property-of-the-data doctrine as sample_quantiles /
    sampled_adjacency): partition/retry/engine-invariant, shard-
    mergeable (the union's k smallest = k smallest of the merged
    samples), and exactly replayable by any engine with md5. Postings
    are emitted as an ascending CSV string because array cells never
    hash cross-engine.

    Scale shape: explode -> one (term, doc) tf aggregation (map-side
    partials), then a term-keyed stats agg plus a row_number <=
    max_postings window that Spark plans with WindowGroupLimit — hub
    terms ("the" in 10^9 docs) are pre-pruned map-side to max_postings
    rows per partition before the exchange, so the stopword posting
    list costs the cap, not the corpus. df/cf stay EXACT (algebraic);
    only the posting list is capped, and n_postings says when.
    """
    toks = df.select(
        F.col(id_col).alias("_d"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    td = toks.groupBy("term", "_d").agg(F.count(F.lit(1)).alias("_tf"))
    stats = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("_tf").alias("cf")
    )
    h = F.md5(F.concat_ws("|", F.col("_d").cast("string"), F.lit(salt)))
    w = Window.partitionBy("term").orderBy(h.asc(), F.col("_d").asc())
    posts = (
        td.select("term", "_d", F.row_number().over(w).alias("_rk"))
        .where(F.col("_rk") <= max_postings)
        .groupBy("term")
        .agg(F.array_sort(F.collect_list("_d")).alias("_arr"))
        .select(
            "term",
            F.size("_arr").cast("long").alias("n_postings"),
            F.array_join(F.transform("_arr", lambda v: v.cast("string")), ",").alias(
                "postings_csv"
            ),
        )
    )
    return stats.join(posts, "term")


def vocab_coverage(
    docs: DataFrame,
    text_col: str,
    group_col: str,
    targets: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Vocabulary sizing: per group (language/source), the number of
    distinct terms a frequency-ranked vocabulary needs to cover X% of
    token mass, and the mass actually covered at that size — the curve a
    tokenizer/vocab budget is read off before training (bpe.bpe_train's
    sibling question: "how big must the vocab be here?").

    Exact, with NO term-level sort: terms collapse to the per-group
    FREQUENCY HISTOGRAM (freq -> n_terms, mass), cumulative mass/terms
    run over that tiny table (window partitioned BY GROUP, never
    global), and the boundary frequency class is entered partially with
    pure integer arithmetic — terms_needed = ceil((target_mass -
    prev_cum)/f) of its (freq DESC, term ASC)-ordered terms. A 10^9-token
    group with 10^6 distinct terms and ~10^3 distinct frequencies sorts
    10^3 rows. Output (group, target_pct, vocab_size, covered_tokens,
    total_tokens)."""
    from pyspark.sql import Window

    if not targets or any(t < 1 or t > 100 for t in targets):
        raise ValueError("targets must be percentages in [1, 100]")
    tf = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.col("term").rlike("^[a-z]+$"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    fh = tf.groupBy("grp", "f").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms")
    )
    w = Window.partitionBy("grp").orderBy(F.col("f").desc())
    cum = (
        fh.withColumn("mass", F.expr("f * n_terms"))
        .withColumn("cum_mass", F.sum("mass").over(w))
        .withColumn("cum_terms", F.sum("n_terms").over(w))
        .withColumn("total", F.sum("mass").over(Window.partitionBy("grp")))
    )
    return (
        cum.withColumn(
            "target_pct", F.explode(F.array(*[F.lit(int(t)) for t in targets]))
        )
        # target token mass t = ceil(total * pct / 100); the boundary
        # frequency class is the first (in freq DESC order) whose
        # cumulative mass reaches it
        .withColumn("t", F.expr("(total * target_pct + 99) div 100"))
        .where(
            (F.col("cum_mass") >= F.col("t"))
            & (F.col("cum_mass") - F.col("mass") < F.col("t"))
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("target_pct").cast("bigint").alias("target_pct"),
            F.expr(
                "cum_terms - n_terms + ((t - (cum_mass - mass)) + f - 1) div f"
            ).alias("vocab_size"),
            F.expr(
                "cum_mass - mass + ((t - (cum_mass - mass)) + f - 1) div f * f"
            ).alias("covered_tokens"),
            F.col("total").alias("total_tokens"),
        )
    )


def duplicated_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Substring-level duplication report — per doc, what fraction of its
    token n-gram POSITIONS also occur in some OTHER document:

        (doc_id, ngrams_total, ngrams_dup, dup_ppm)

    This is the signal behind exact-substring training-data dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better"):
    document-level MinHash keeps a doc whose second half is a verbatim
    boilerplate block, and WITHIN-doc repetition_signals can't see it —
    only a corpus-wide position-weighted n-gram view catches partially
    copied text. dup_ppm = ngrams_dup * 10^6 div ngrams_total feeds a
    curation threshold directly (drop or trim docs above X% duplicated
    mass). Cross-doc only by design: a gram repeated 50x inside ONE doc
    counts 0 here (that is repetition_signals' job), so the two signals
    are orthogonal and composable.

    Docs with fewer than n tokens have no n-grams and are absent by
    design — they cannot carry duplicated substring mass.

    Scale shape: grams are built by zipping n shifted slices of the token
    array (the pair_counts/contamination pattern); the corpus collapses to
    the (doc, gram) histogram FIRST (one map-side-combinable agg — the
    only pass over full text); the gram marginal needs only min_doc !=
    max_doc (two algebraic aggs, never a countDistinct Expand), and the
    flag joins back to the histogram on the gram key. Histogram
    localCheckpoint'd once for its two consumers. Per-doc totals are
    BIGINT; the ppm product runs in DECIMAL(38,0) (a 10^12-token doc
    bound is absurd, but overflow must be impossible, not unlikely)."""
    if n < 1:
        raise ValueError("duplicated_ngrams: n must be >= 1")
    # empty/whitespace-only text must yield ZERO tokens, not [""]: under
    # n=1 that phantom token would make two blank docs flag each other as
    # 100%-duplicated — NULL out the array so such docs stay absent
    base = F.trim(F.lower(F.col(text_col)))
    toks = F.when(base != "", F.split(base, r"\s+"))
    width = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, width) for i in range(n)])
    grams = F.when(
        width >= 1,
        F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
        ),
    )
    cells = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()
    )
    marg = cells.groupBy("gram").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("_dup")
    )
    return (
        cells.join(marg, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("ngrams_total"),
            F.sum(F.when(F.col("_dup"), F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("ngrams_dup"),
        )
        .withColumn(
            "dup_ppm",
            F.expr(
                "CAST(CAST(ngrams_dup AS DECIMAL(38,0)) * 1000000"
                " DIV ngrams_total AS BIGINT)"
            ),
        )
    )



def _bigram_cells(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, bg, cnt) bigram histogram — ONE map-side-combinable agg
    over the shifted-slice zip; the only pass over full text either side
    of lm_bigram_score makes."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    width = F.size(toks) - 1
    zipped = F.arrays_zip(F.slice(toks, 1, width), F.slice(toks, 2, width))
    bigrams = F.when(
        width >= 1,
        F.transform(zipped, lambda s: F.concat_ws(" ", s["0"], s["1"])),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def lm_bigram_score(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Reference-fitted bigram language-model fluency score — the
    deterministic integer-arithmetic form of the CCNet/Gopher
    "perplexity filter" stage: fit an n-gram LM on a TRUSTED reference
    corpus (train_df: the Wikipedia-shaped subset), score every candidate
    document (score_df) by how typical its phrasing is of that reference:

        (doc_id, n_bigrams, lm_score_ppm)

    Per bigram the Laplace-smoothed conditional probability on the exact
    ppm grid:

        cond_ppm(w1 w2) = (c(w1 w2) + 1) * 10^6 div (c(w1 ·) + V)

    where c(w1 ·) = reference occurrences of w1 as a bigram prefix (the
    MLE denominator) and V = distinct reference prefixes + 1 (the +1 is
    the unseen-prefix event). Smoothing is what makes the train/score
    split work: a candidate bigram the reference never saw scores
    10^6 div (c(w1·)+V) — small, never zero/undefined — and gibberish
    with a wholly unknown prefix scores 10^6 div V, the floor. The doc
    score is the count-weighted floor-mean of its bigrams' cond_ppm:
    reference-like phrasing scores high, out-of-domain or garbled text
    scores low. Threshold via group_percentiles, not a magic constant.
    (A held-in MLE without smoothing is exactly wrong here: unique
    gibberish gets conditional probability 1 — c(w1 w2) = c(w1 ·) = 1 —
    and outscores real prose, inverting the filter.)

    Every op is floor division on BIGINT/DECIMAL(38,0): the score is
    engine/partitioning/order-invariant — no log(), no float perplexity.
    Docs with < 2 tokens have no bigrams and are absent by design.

    Scale shape: both corpora collapse to (doc, bigram) histograms first;
    the reference table and its prefix marginal are re-aggs of its
    histogram; the candidate histogram left-joins the bigram table (bg
    key) and the prefix marginal (w1 key) — unseen events stay as NULLs
    folded by COALESCE, never an inner-join drop; the per-doc fold is
    algebraic. V is a scalar collected driver-side (one count job — the
    pagerank scalar doctrine: never a 1-row crossJoin/BNLJ). The weighted
    sum runs in DECIMAL(38,0) so overflow is impossible, not unlikely."""
    bg_tab = (
        _bigram_cells(train_df, id_col, text_col)
        .groupBy("bg")
        .agg(F.sum("cnt").cast("long").alias("c_bg"))
        .localCheckpoint()
    )
    prefix = (
        bg_tab.select(F.split(F.col("bg"), " ", 2).getItem(0).alias("w1"), "c_bg")
        .groupBy("w1")
        .agg(F.sum("c_bg").cast("long").alias("c_w1"))
        .localCheckpoint()
    )
    v = prefix.count() + 1
    cells = _bigram_cells(score_df, id_col, text_col).withColumn(
        "w1", F.split(F.col("bg"), " ", 2).getItem(0)
    )
    scored = (
        cells.join(bg_tab, "bg", "left")
        .join(prefix, "w1", "left")
        .withColumn(
            "cond_ppm",
            # the numerator runs in DECIMAL(38,0): a 10^12-occurrence
            # bigram ("of the" at 100 TB) * 10^6 brushes BIGINT's edge;
            # the quotient is <= 10^6 by construction so the cast back
            # is safe
            F.expr(
                f"CAST(CAST(COALESCE(c_bg, 0) + 1 AS DECIMAL(38,0)) * 1000000"
                f" DIV (COALESCE(c_w1, 0) + {int(v)}) AS BIGINT)"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_bigrams"),
        F.expr(
            "CAST(sum(CAST(cnt AS DECIMAL(38,0)) * cond_ppm)"
            " DIV sum(cnt) AS BIGINT)"
        ).alias("lm_score_ppm"),
    )


def centroid_scores(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
) -> DataFrame:
    """Rocchio/centroid text classifier — the curation-grade domain
    scorer ("wiki-like vs crawl-like") trained in ONE aggregation:
    each class's centroid is the summed hashed-TF vector of its seed
    docs (disambiguate.hashed_tf's md5-bucket formula, so the feature
    space is shared with the dense retrieval/disambiguation path), and
    every candidate doc scores cosine^2 against every centroid on the
    exact ppm grid:

        (doc_id, label, score_ppm, rank)

        score_ppm = 10^6 * dot^2 div (|d|^2 * |c|^2)

    cosine^2 instead of cosine: TF counts are integers, so dot, |d|^2
    and |c|^2 are exact BIGINTs and the squared-cosine quotient is ONE
    DECIMAL(38,0) floor division — engine/partitioning-invariant with
    no sqrt, no float summation. Squaring is monotone for non-negative
    cosines (TF vectors are non-negative), so ranking is unchanged.
    rank 1 = best class per doc (ties by label ascending). Docs with no
    tokens are unscorable and absent; empty classes simply contribute
    no centroid. NULL train labels raise executor-side (a silently
    dropped seed class corrupts every ranking downstream).

    Scale shape: the centroid table is (classes x 64 buckets) — tiny,
    broadcast into the bucket-keyed join against the candidate TF
    vectors; per-(doc, class) dot is an algebraic agg with map-side
    partials; the per-doc rank window is bounded by the class count.
    The 10^6 * dot^2 product runs in DECIMAL(38,0): a 10^12-row class
    centroid squares past BIGINT long before it troubles 38 digits."""
    from .disambiguate import hashed_tf

    checked_label = F.when(
        F.col(label_col).isNotNull(), F.col(label_col)
    ).otherwise(
        F.raise_error(F.lit("centroid_scores: NULL train label"))
    )
    seeds = train_df.select(
        F.col(id_col).alias("_tid"),
        F.col(text_col).alias("_ttext"),
        checked_label.alias("_lbl"),
    )
    tf = hashed_tf(seeds, "_tid", "_ttext")
    cent = (
        tf.join(seeds.select("_tid", "_lbl").distinct(), tf.id == F.col("_tid"))
        .groupBy(F.col("_lbl").alias("label"), "bucket")
        .agg(F.sum(F.col("tf").cast("long")).alias("ctf"))
    ).localCheckpoint()
    cnorm = cent.groupBy("label").agg(
        F.sum(F.col("ctf") * F.col("ctf")).cast("long").alias("nc2")
    )
    dv = hashed_tf(score_df, id_col, text_col).select(
        F.col("id").alias("doc_id"), "bucket", F.col("tf").cast("long").alias("dtf")
    )
    dnorm = dv.groupBy("doc_id").agg(
        F.sum(F.col("dtf") * F.col("dtf")).cast("long").alias("nd2")
    )
    dots = (
        dv.join(F.broadcast(cent), "bucket")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("dtf") * F.col("ctf")).cast("long").alias("dot"))
    )
    scored = (
        dots.join(dnorm, "doc_id")
        .join(F.broadcast(cnorm), "label")
        .withColumn(
            "score_ppm",
            F.expr(
                "CAST(CAST(dot AS DECIMAL(38,0)) * dot * 1000000"
                " DIV (CAST(nd2 AS DECIMAL(38,0)) * nc2) AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("label")
    )
    return scored.select(
        "doc_id",
        "label",
        "score_ppm",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    line_sep: str = r"\n",
    join_sep: str = "\n",
    min_words: int = 5,
    min_kept_lines: int = 3,
    blocklist: tuple[str, ...] = ("javascript", "lorem ipsum", "{"),
    page_blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """The C4 line-level cleaning pass (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning..."): keep a line iff it (1) ends in
    terminal punctuation [.!?"], (2) has at least `min_words` whitespace
    words, (3) contains no `blocklist` entry (case-insensitive
    substring); then drop every DOCUMENT retaining fewer than
    `min_kept_lines` lines. Faithfulness note, stated plainly: every
    `blocklist` entry here is applied LINE-level. The published C4
    filter is line-level only for "javascript"; it drops the ENTIRE
    page for "lorem ipsum" and "{" — pass those via `page_blocklist`
    (case-insensitive substring over the whole document; matching docs
    emit no output row and no per-line attribution) to reproduce the
    published page-level behavior. The default keeps the historical
    all-line-level contract of this operator. The standard first-stage web-corpus
    scrubber that runs BEFORE dedup and quality scoring; quality_score
    (above) grades whole documents, this removes the navigation/footer/
    code debris inside them. The reference ingests page text verbatim
    (file_analysis_service.py) and has no cleaning stage.

    Output per SURVIVING doc: (id, text, n_lines, n_kept, dropped_punct,
    dropped_short, dropped_block) — text reassembled from kept lines in
    original order via `join_sep`, per-rule drop counts attributing each
    dropped line to its FIRST failing rule in the order punct -> short ->
    block (deterministic attribution; a line can fail several). Blank /
    whitespace-only lines vanish before the rules (dedup_paragraphs
    contract) and count in none of the columns; docs below
    min_kept_lines have no output row.

    Scale shape: posexplode + pure codegen'd column predicates per line,
    then ONE doc-keyed algebraic aggregation (conditional counts +
    collect of kept lines, ordered by index) — a single exchange, no
    windows, no joins; the blocklist folds into the expression as
    literals. Reassembly memory is bounded by document length, same as
    dedup_paragraphs."""
    if min_words < 1 or min_kept_lines < 1:
        raise ValueError("min_words and min_kept_lines must be >= 1")
    if not blocklist:
        raise ValueError(
            "blocklist must be non-empty (pass a sentinel that cannot "
            "occur if you want rule 3 off)"
        )
    if page_blocklist:
        page_low = F.lower(F.col(text_col))
        page_hit = None
        for b in page_blocklist:
            c = page_low.contains(b.lower())
            page_hit = c if page_hit is None else (page_hit | c)
        df = df.where(~F.coalesce(page_hit, F.lit(False)))
    lines = df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("_idx", "_raw"),
    ).select("_d", "_idx", F.trim("_raw").alias("_ln")).where(F.col("_ln") != "")
    ends_punct = F.substring(F.col("_ln"), -1, 1).isin(".", "!", "?", '"')
    n_words = F.size(F.split(F.col("_ln"), r"\s+"))
    low = F.lower(F.col("_ln"))
    blocked = None
    for b in blocklist:
        c = low.contains(b.lower())
        blocked = c if blocked is None else (blocked | c)
    keep = ends_punct & (n_words >= int(min_words)) & ~blocked
    flagged = lines.select(
        "_d",
        "_idx",
        "_ln",
        keep.alias("_keep"),
        F.when(~ends_punct, F.lit("punct"))
        .when(n_words < int(min_words), F.lit("short"))
        .when(blocked, F.lit("block"))
        .alias("_drop"),
    )
    rolled = flagged.groupBy("_d").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("_drop") == "punct", 1).otherwise(0))
        .cast("long")
        .alias("dropped_punct"),
        F.sum(F.when(F.col("_drop") == "short", 1).otherwise(0))
        .cast("long")
        .alias("dropped_short"),
        F.sum(F.when(F.col("_drop") == "block", 1).otherwise(0))
        .cast("long")
        .alias("dropped_block"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_keep"),
                            F.struct(F.col("_idx").alias("i"), F.col("_ln").alias("t")),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            join_sep,
        ).alias("text"),
    )
    return rolled.where(F.col("n_kept") >= int(min_kept_lines)).select(
        F.col("_d").alias(id_col),
        "text",
        "n_lines",
        "n_kept",
        "dropped_punct",
        "dropped_short",
        "dropped_block",
    )


def cooccurrence_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
) -> DataFrame:
    """Distance-weighted token co-occurrence counts — the GloVe
    statistic (Pennington et al. 2014): for every unordered token pair
    within `window` positions, the raw pair count and the sum of 1/d
    distance weights on the exact ppm grid (GloVe's harmonic weighting;
    weight_ppm = 1e6 div d per occurrence, so the matrix is pure BIGINT
    and engine/partition-invariant — never float accumulation). This
    table IS the input to classic embedding training and to PMI-style
    collocation scoring; text_pair_counts (above) counts unordered
    co-presence per document, this counts POSITIONAL proximity with
    distance discounting.

    Semantics: tokens are the corpus-wide lowercase-whitespace
    convention; pairs are canonical (w1 <= w2 lexicographically), each
    positional co-occurrence counted once; a token repeated within the
    window co-occurs with itself (w1 = w2) — real signal for
    repetition-heavy corpora, not an artifact. Output: (w1, w2,
    n_pairs, weight_ppm_sum).

    Scale shape: the d-shift trick (the sorted_neighborhood pair
    pattern): explode each token row into d = 1..window shifted probes
    and equi-join (doc, pos+d) = (doc, pos) against the token table —
    one hash join of the token stream against itself, never a per-doc
    quadratic or a window function; the final aggregation is algebraic
    with map-side combine (hot pairs collapse per task). Cost is the
    honest window x corpus-tokens row multiplication every
    co-occurrence builder pays."""
    if not 1 <= int(window) <= 64:
        raise ValueError("window must be in [1, 64]")
    toks = df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("_pos", "_t"),
    )
    probes = toks.select(
        "_d",
        F.col("_t").alias("_ta"),
        F.explode(
            F.array(*[F.lit(d) for d in range(1, int(window) + 1)])
        ).alias("_dd"),
        F.col("_pos").alias("_pa"),
    ).select("_d", "_ta", "_dd", (F.col("_pa") + F.col("_dd")).alias("_pos"))
    pairs = probes.join(toks, ["_d", "_pos"]).select(
        F.least("_ta", "_t").alias("w1"),
        F.greatest("_ta", "_t").alias("w2"),
        F.expr("1000000 div _dd").alias("_w"),
    )
    return pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_w").cast("long").alias("weight_ppm_sum"),
    )


def pmi_collocations(
    pairs: DataFrame,
    w1_col: str = "w1",
    w2_col: str = "w2",
    count_col: str = "n_pairs",
    k: int = 6,
) -> DataFrame:
    """Pointwise mutual information over a co-occurrence pair table
    (Church & Hanks 1990 collocations): PMI(x,y) = log2(c_xy * T /
    (m_x * m_y)) on the float-free fixed-point grid —
    pmi_fp = floor(2^k * log2(.)) in 2^-k-bit units via the SAME
    log2fp chain BM25's idf uses (ranking.log2fp_chain), so scores are
    bit-identical on any engine and the ranking never depends on float
    summation order. Feed it cooccurrence_counts (above) and the top of
    the table is the corpus's collocation lexicon; high-PMI pairs also
    flag templated boilerplate a dedup pass should look at.

    Marginals come from the pair table itself: m_x = sum of counts of
    every pair containing x, with a SELF-pair (x,x) counting twice
    (both endpoints are x — the convention that makes sum(m) = 2T
    exactly); T = total pair count. The rational is scaled by 2^20
    before the log (the bm25 idf convention) and clamped to >= 1, so
    pairs more than 20 bits anti-correlated floor at pmi_fp =
    -20 * 2^k instead of raising. Output: (w1, w2, n_pairs, m1, m2,
    pmi_fp).

    Scale shape: one stacked-explode marginal aggregation (both
    endpoints in ONE pass — the u_probabilities convention), T as ONE
    collected scalar folded into the expression as a literal (the
    bm25/pagerank scalar doctrine — never a 1-row crossJoin, which
    plans as a BroadcastNestedLoopJoin), two word-keyed broadcast
    joins back, and a codegen'd arithmetic + log chain; no windows."""
    from .ranking import with_log2fp

    p = pairs.select(
        F.col(w1_col).alias("_w1"),
        F.col(w2_col).alias("_w2"),
        F.col(count_col).cast("long").alias("_c"),
    )
    stacked = p.select(F.col("_w1").alias("_w"), "_c").unionAll(
        p.select(F.col("_w2").alias("_w"), "_c")
    )
    marg = stacked.groupBy("_w").agg(F.sum("_c").cast("long").alias("_m"))
    T = int(
        p.agg(F.sum("_c").cast("long").alias("_T")).collect()[0]._T or 0
    )
    scored = (
        p.withColumn("_T", F.lit(T).cast("long"))
        .join(
            F.broadcast(marg.select(F.col("_w").alias("_w1"), F.col("_m").alias("m1"))),
            "_w1",
        )
        .join(
            F.broadcast(marg.select(F.col("_w").alias("_w2"), F.col("_m").alias("m2"))),
            "_w2",
        )
        .withColumn(
            "_q",
            F.expr(
                "GREATEST(CAST(CAST(_c AS DECIMAL(38,0)) * _T * 1048576"
                " div (CAST(m1 AS DECIMAL(38,0)) * m2) AS BIGINT), 1L)"
            ),
        )
    )
    return with_log2fp(scored, "_q", "_pmi_raw", k).select(
        F.col("_w1").alias(w1_col),
        F.col("_w2").alias(w2_col),
        F.col("_c").alias(count_col),
        "m1",
        "m2",
        (F.col("_pmi_raw") - F.lit(20 * (1 << int(k)))).cast("long").alias("pmi_fp"),
    )


# ------------------------------------------------------------ Gopher rules --

def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_ppm: int = 3_000_000,
    max_mean_word_len_ppm: int = 10_000_000,
    max_symbol_word_ppm: int = 100_000,
    max_bullet_line_ppm: int = 900_000,
    max_ellipsis_line_ppm: int = 300_000,
    min_alpha_word_ppm: int = 800_000,
    min_stopword_hits: int = 2,
    stopwords: tuple[str, ...] = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    ),
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, "Scaling
    Language Models: ...", Appendix A): the published heuristic battery
    that MassiveWeb applies BEFORE any learned filtering — word-count
    bounds, mean-word-length bounds, symbol-to-word ratio ('#' or
    ellipsis), bullet-started and ellipsis-ended line fractions,
    alphabetic-word fraction, and a minimum count of distinct common
    English stopwords present. quality_score (above) is a composite
    grade; this is the rule-by-rule auditable keep/drop battery, one
    published rule per output column, defaults = the paper's thresholds
    (parameterized because a corpus with shorter documents needs
    proportionally tighter bounds to make the gate non-vacuous). The
    paper's REPETITION rules (§A1.1 duplicate-token / top-bigram
    fractions) live in repetition_signals above; together the two cover
    the published battery.

    Output per doc: (doc_id, word_count, mean_word_len_ppm,
    symbol_word_ppm, bullet_line_ppm, ellipsis_line_ppm, alpha_word_ppm,
    stopword_hits, keep) — every ratio on the exact ppm grid (integer
    DIV of non-negative BIGINTs, identical truncation on both engines;
    zero-word docs report 0 ppm everywhere and fail the word-count rule
    rather than dividing by zero), `keep` the conjunction of all eight
    rules. The reference ingests page text with no quality gating
    (file_analysis_service.py) — this is the curation front door its
    extraction pipeline lacks.

    Scale shape: pure per-row codegen'd array expressions (split +
    filter + aggregate) — NO explode, NO shuffle, NO window, NO Python;
    the whole battery is one narrow projection a 100-TB scan fuses into
    its read stage."""
    # NULL text must behave exactly like empty text (word_count=0,
    # keep=false) — without the coalesce, split/size propagate NULL into
    # every stat AND into `keep`, and a later .where(keep) / .where(~keep)
    # would treat the doc asymmetrically instead of deterministically
    # dropping it.
    txt = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    toks = F.filter(
        F.split(F.trim(F.lower(txt)), r"\s+"), lambda x: x != ""
    )
    lines = F.filter(
        F.transform(F.split(txt, r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    wc = F.size(toks).cast("long")
    nl = F.size(lines).cast("long")
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    sym_words = F.size(
        F.filter(toks, lambda x: x.contains("#") | x.contains("...") | x.contains("…"))
    ).cast("long")
    alpha_words = F.size(
        F.filter(toks, lambda x: x.rlike("[a-z]"))
    ).cast("long")
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("-") | x.startswith("*") | x.startswith("•"),
        )
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
    ).cast("long")
    stop_hits = None
    for w in stopwords:
        hit = F.when(F.array_contains(toks, w), 1).otherwise(0)
        stop_hits = hit if stop_hits is None else stop_hits + hit
    out = df.select(
        F.col(id_col).alias("doc_id"),
        wc.alias("word_count"),
        total_chars.alias("_tc"),
        sym_words.alias("_sw"),
        alpha_words.alias("_aw"),
        bullet_lines.alias("_bl"),
        ellipsis_lines.alias("_el"),
        nl.alias("_nl"),
        stop_hits.cast("long").alias("stopword_hits"),
    ).select(
        "doc_id",
        "word_count",
        F.expr(
            "CAST(CASE WHEN word_count > 0 THEN _tc * 1000000 div word_count ELSE 0 END AS BIGINT)"
        ).alias("mean_word_len_ppm"),
        F.expr(
            "CAST(CASE WHEN word_count > 0 THEN _sw * 1000000 div word_count ELSE 0 END AS BIGINT)"
        ).alias("symbol_word_ppm"),
        F.expr(
            "CAST(CASE WHEN _nl > 0 THEN _bl * 1000000 div _nl ELSE 0 END AS BIGINT)"
        ).alias("bullet_line_ppm"),
        F.expr(
            "CAST(CASE WHEN _nl > 0 THEN _el * 1000000 div _nl ELSE 0 END AS BIGINT)"
        ).alias("ellipsis_line_ppm"),
        F.expr(
            "CAST(CASE WHEN word_count > 0 THEN _aw * 1000000 div word_count ELSE 0 END AS BIGINT)"
        ).alias("alpha_word_ppm"),
        "stopword_hits",
    )
    keep = (
        F.col("word_count").between(int(min_words), int(max_words))
        & F.col("mean_word_len_ppm").between(
            int(min_mean_word_len_ppm), int(max_mean_word_len_ppm)
        )
        & (F.col("symbol_word_ppm") <= int(max_symbol_word_ppm))
        & (F.col("bullet_line_ppm") <= int(max_bullet_line_ppm))
        & (F.col("ellipsis_line_ppm") <= int(max_ellipsis_line_ppm))
        & (F.col("alpha_word_ppm") >= int(min_alpha_word_ppm))
        & (F.col("stopword_hits") >= int(min_stopword_hits))
    )
    return out.withColumn("keep", keep)
