"""Text analysis/ranking: token/quality/langid/fingerprint, TF-IDF/BM25 inputs, vocab/OOV, LM-score, PII, BPE, collocations, KMV slices.

Split out of the former monolithic contract.py (round-4, VERDICT ask #6);
query registration happens via the shared @query decorator into the
aggregating contract.Q / contract.SQL dicts in _shared.py.
"""
from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import Window  # noqa: F401

from ._shared import *  # noqa: F401,F403



@query(
    "text_token_counts",
    """SELECT doc_id,
              CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
              CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS re_tokens
       FROM documents""",
)
def text_token_counts(spark, sf_dir):
    return TQ.token_counts(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_quality_score",
    """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
       feats AS (
         SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_words,
                ROUND(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks), 6) AS mean_token_len,
                ROUND(CAST(len(list_filter(toks, x -> list_contains(
                      ['the','a','of','and','to','in','is','it','for','on'], x))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
         FROM t)
       SELECT doc_id, n_words, mean_token_len, stopword_ratio,
              LEAST(CAST(1.0 AS DOUBLE),
                CAST(0.4 AS DOUBLE) * LEAST(n_words / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
                + CAST(0.3 AS DOUBLE) * LEAST(mean_token_len / CAST(8.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
                + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - stopword_ratio)) AS quality
       FROM feats""",
)
def text_quality_score(spark, sf_dir):
    return TQ.quality_score(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_top_terms",
    """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
                  FROM documents)
       SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
       FROM t WHERE term <> ''
       GROUP BY term ORDER BY tf DESC, term LIMIT 50""",
)
def text_top_terms(spark, sf_dir):
    """Corpus vocabulary head (top-50 terms by corpus frequency, with doc
    frequency): curation-pass staple. Distributed top-k —
    orderBy().limit(k) plans as TakeOrderedAndProject (no global window;
    swept by tools/plan_audit.py); deterministic (tf DESC, term ASC)
    tie-break so the result is a well-defined set."""
    return TQ.top_terms(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_language_id",
    """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
                  FROM documents),
       profiles AS (
         SELECT 'de' AS lang, ['der','und','die'] AS markers
         UNION ALL SELECT 'en', ['the','and','of']
         UNION ALL SELECT 'es', ['el','la','de']
         UNION ALL SELECT 'fr', ['le','la','et']
         UNION ALL SELECT 'zh', ['de','shi','le']
       ),
       scores AS (
         SELECT doc_id, lang,
                CAST(len(list_filter(toks, x -> list_contains(markers, x))) AS DOUBLE)
                  / len(toks) AS s
         FROM t CROSS JOIN profiles
       ),
       ranked AS (SELECT doc_id, lang, s,
                         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang ASC) AS rn
                  FROM scores)
       SELECT doc_id, lang AS pred_lang, ROUND(s, 6) AS lang_score
       FROM ranked WHERE rn = 1""",
)
def text_language_id(spark, sf_dir):
    return TQ.language_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_fingerprint",
    """SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(
                    string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS fp
       FROM documents""",
)
def text_fingerprint(spark, sf_dir):
    return TQ.fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


# ------------------------------------------------- curation safety (r2c) --

@query(
    "text_repetition_signals",
    """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
                  FROM documents),
       base AS (
         SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                ROUND(CAST(1.0 AS DOUBLE)
                      - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
                  AS dup_token_frac,
                toks
         FROM t),
       bg AS (
         SELECT doc_id,
                unnest(list_transform(range(1, len(toks)),
                                      i -> concat(toks[i], ' ', toks[i + 1]))) AS bigram
         FROM t WHERE len(toks) >= 2),
       cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
       top AS (
         SELECT doc_id, bigram, c,
                row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram ASC) AS rn
         FROM cnt)
       SELECT b.doc_id, b.n_tokens, b.dup_token_frac,
              t.bigram AS top_bigram,
              CAST(t.c AS BIGINT) AS top_bigram_count,
              ROUND(CAST(t.c AS DOUBLE) / (b.n_tokens - 1), 6) AS top_bigram_frac
       FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id AND t.rn = 1""",
)
def text_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals (duplicate-token fraction,
    top-bigram fraction) as zero-shuffle narrow expressions: the top bigram
    comes from a sorted-array longest-run fold, not an explode+regroup —
    per-document statistics never pay a shuffle. The DuckDB oracle computes
    the same statistic the expensive way (unnest + per-doc window) to make
    the cross-engine check independent of the implementation trick."""
    return TQ.repetition_signals(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_pii_redact",
    """WITH aug AS (
         SELECT doc_id,
                text
                || CASE WHEN doc_id % 3 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE '' END
                || CASE WHEN doc_id % 5 = 0
                        THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END AS text
         FROM documents)
       , er AS (
         SELECT doc_id, text,
                regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS etext
         FROM aug)
       SELECT doc_id,
              CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(etext,
                   '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phones,
              regexp_replace(etext,
                '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS redacted
       FROM er""",
)
def text_pii_redact(spark, sf_dir):
    """PII detect + redact (operators/text_quality.py pii_scan). The driver
    corpus contains no PII by construction, so the query plants
    deterministic doc_id-derived emails/phones on a subset of rows (both
    engines build the identical augmented text from the same parquet),
    exercising match counting, multi-match replacement, and the zero-match
    passthrough path. Patterns are the Java-regex/RE2 common subset."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call 555-010-"),
                    F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return TQ.pii_scan(d, "doc_id", "text")


@query(
    "text_length_percentiles",
    """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       r AS (SELECT lang, n_chars,
                    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn
             FROM documents),
       p AS (SELECT 50 AS pct UNION ALL SELECT 90 UNION ALL SELECT 99)
       SELECT r.lang, CAST(p.pct AS BIGINT) AS pct, r.n_chars
       FROM r JOIN n USING (lang)
       JOIN p ON r.rn = (p.pct * n.n + 99) // 100""",
)
def text_length_percentiles(spark, sf_dir):
    """Corpus length-distribution report (text_quality.group_percentiles):
    exact type-1 p50/p90/p99 of document length per language — the
    truncation/packing-budget numbers. Type-1 (value at rank
    ceil(p/100*n)) is pure integer arithmetic, so exact cross-engine
    agreement is possible where interpolating quantiles are not. The Spark
    side orders only DISTINCT (lang, n_chars) pairs after an algebraic
    collapse; the oracle is the row-level row_number formulation — a
    different strategy confirming the same values."""
    d = _t(spark, sf_dir, "documents")
    return TQ.group_percentiles(d, "lang", "n_chars", (50, 90, 99))


@query(
    "text_distinctive_terms",
    """WITH t AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
                  FROM documents),
       tt AS (SELECT lang, term, count(*) AS tf_g FROM t WHERE term <> ''
              GROUP BY lang, term),
       ta AS (SELECT term, CAST(sum(tf_g) AS BIGINT) AS tf_all FROM tt GROUP BY term),
       gt AS (SELECT lang, CAST(sum(tf_g) AS BIGINT) AS g_tokens FROM tt GROUP BY lang),
       tot AS (SELECT CAST(sum(tf_g) AS BIGINT) AS total FROM tt),
       lifted AS (
         SELECT tt.lang, tt.term, tt.tf_g,
                CAST((CAST(tt.tf_g AS HUGEINT) * 1000000000 * tot.total)
                     // (CAST(ta.tf_all AS HUGEINT) * gt.g_tokens) AS BIGINT) AS lift_nano
         FROM tt JOIN ta USING (term) JOIN gt USING (lang) CROSS JOIN tot
         WHERE tt.tf_g >= 5)
       SELECT lang, term, tf_g, lift_nano FROM (
         SELECT lang, term, tf_g, lift_nano,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY lift_nano DESC, term) AS rn
         FROM lifted)
       WHERE rn <= 10""",
)
def text_distinctive_terms(spark, sf_dir):
    """Per-language over-represented terms (text_quality.distinctive_terms):
    top-10 by lift = P(term|lang)/P(term) in 1e-9 fixed-point integer
    units (DECIMAL(38,0) arithmetic Spark-side, HUGEINT in DuckDB — same
    floor quotient on all-positive operands), min_tf=5 suppressing the
    typo tail. Tokenizer-vocab allocation / domain-mix diagnostic. The
    term-keyed exchange is the only big shuffle; group and grand totals
    re-join as broadcasts; the final per-group top-k takes the
    WindowGroupLimit pre-prune."""
    d = _t(spark, sf_dir, "documents")
    return TQ.distinctive_terms(d, "doc_id", "text", "lang", k=10, min_tf=5)


@query(
    "text_pair_counts",
    """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
                  FROM documents),
       p AS (SELECT doc_id,
                    unnest(list_transform(range(1, len(toks)),
                           i -> concat(toks[i], ' ', toks[i + 1]))) AS pair
             FROM t WHERE len(toks) >= 2)
       SELECT pair, count(*) AS tf, count(DISTINCT doc_id) AS df
       FROM p GROUP BY pair ORDER BY tf DESC, pair LIMIT 50""",
)
def text_pair_counts(spark, sf_dir):
    """Tokenizer-training pair statistics (text_quality.pair_counts):
    top-50 adjacent token pairs by corpus frequency with doc frequency —
    the BPE merge-candidate list / collocation head. One pair-keyed
    algebraic aggregation + distributed TakeOrderedAndProject top-k; the
    oracle rebuilds pairs positionally in DuckDB list algebra."""
    return TQ.pair_counts(_t(spark, sf_dir, "documents"), "doc_id", "text", k=50)


@query(
    "text_oov_rate",
    """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
                  FROM documents),
       tk AS (SELECT doc_id, term FROM t WHERE term <> ''),
       vocab AS (SELECT term FROM (
         SELECT term, count(*) AS tf FROM tk GROUP BY term
         ORDER BY tf DESC, term LIMIT 20)),
       marked AS (SELECT tk.doc_id, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
                  FROM tk LEFT JOIN vocab v ON tk.term = v.term)
       SELECT doc_id, count(*) AS total_tokens,
              CAST(sum(oov) AS BIGINT) AS oov_tokens,
              CAST(sum(oov) AS BIGINT) * 1000000 // count(*) AS oov_ppm
       FROM marked GROUP BY doc_id""",
)
def text_oov_rate(spark, sf_dir):
    """Per-doc out-of-vocabulary rate vs a frequency-rank vocab built from
    the same corpus — the tokenizer-coverage signal a curation pass uses
    to reject docs that would fragment into unknowns. vocab_size=20 of the
    corpus's 31 distinct terms so the gate is non-vacuous at both scale
    factors (k-core lesson: two engines agreeing on a trivial set prove
    nothing). oov_ppm is exact integer DIV — no float division anywhere.
    Vocab broadcast-joins the exploded tokens; rollup is one doc-keyed agg
    with map-side partials."""
    return TQ.oov_stats(_t(spark, sf_dir, "documents"), "doc_id", "text", vocab_size=20)


@query(
    "text_kmv_distinct",
    """WITH h AS (
         SELECT DISTINCT lang,
                CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), '|', 'kmv')), 1, 12)) AS BIGINT) AS hh
         FROM documents),
       r AS (SELECT lang, hh,
                    row_number() OVER (PARTITION BY lang ORDER BY hh) AS rn
             FROM h),
       t AS (SELECT lang, count(*) AS n_kept, max(hh) AS kth
             FROM r WHERE rn <= 32 GROUP BY lang)
       SELECT lang, n_kept,
              CASE WHEN n_kept < 32 THEN n_kept
                   ELSE CAST(8725724278030336 AS BIGINT) // kth
              END AS est_distinct
       FROM t""",
)
def text_kmv_distinct(spark, sf_dir):
    """KMV bottom-k distinct-count sketch per language (k=32 over the
    48-bit md5 grid): the cross-engine-EXACT alternative to HLL (Spark's
    HLL++ and DuckDB's HLL can never hash-match; KMV's k smallest hashes
    and BIGINT floor-quotient estimate replay bit-for-bit on any engine).
    Every sf group holds >= 64 distinct docs so the ESTIMATION path (not
    the exact-fallback) is what both engines value-check; mergeability
    and the <k exact path are unit-gated (tests/test_sketch.py). One
    map-side-deduped DISTINCT, a WindowGroupLimit-pre-pruned per-group
    top-k, one algebraic agg. 8725724278030336 = (k-1) * 2^48."""
    from ..operators.sketch import kmv_distinct

    return kmv_distinct(_t(spark, sf_dir, "documents"), "lang", "doc_id", k=32)


@query(
    "text_kmv_slice_jaccard",
    """WITH t AS (SELECT lang, string_split_regex(trim(lower(text)), '\\s+') AS toks
                  FROM documents),
       sh AS (SELECT DISTINCT lang,
                     unnest(list_transform(
                       generate_series(1, greatest(len(toks) - 1, 1)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS shingle
              FROM t),
       h AS (SELECT DISTINCT lang,
                    CAST(concat('0x', substring(md5(concat(shingle, '|', 'kmv')), 1, 12)) AS BIGINT) AS hh
             FROM sh),
       r AS (SELECT lang, hh, row_number() OVER (PARTITION BY lang ORDER BY hh) AS rn
             FROM h),
       sk AS (SELECT lang, list_sort(list(hh)) AS hs FROM r WHERE rn <= 64 GROUP BY lang),
       pr AS (SELECT a.lang AS slice_a, b.lang AS slice_b, a.hs AS ha, b.hs AS hb,
                     list_sort(list_distinct(list_concat(a.hs, b.hs)))[1:64] AS hm
              FROM sk a JOIN sk b ON a.lang < b.lang),
       e AS (SELECT slice_a, slice_b,
               CASE WHEN len(ha) < 64 THEN CAST(len(ha) AS BIGINT)
                    ELSE 17732923532771328 // ha[64] END AS est_a,
               CASE WHEN len(hb) < 64 THEN CAST(len(hb) AS BIGINT)
                    ELSE 17732923532771328 // hb[64] END AS est_b,
               CASE WHEN len(hm) < 64 THEN CAST(len(hm) AS BIGINT)
                    ELSE 17732923532771328 // hm[64] END AS est_union
             FROM pr),
       f AS (SELECT slice_a, slice_b, est_a, est_b, est_union,
                    greatest(CAST(0 AS BIGINT),
                             est_a + est_b - est_union) AS est_intersection
             FROM e)
       SELECT slice_a, slice_b, est_a, est_b, est_union, est_intersection,
              CASE WHEN est_union > 0 THEN CAST(
                CAST(est_intersection AS HUGEINT) * 1000000
                // CAST(est_union AS HUGEINT) AS BIGINT) END AS jaccard_ppm
       FROM f""",
)
def text_kmv_slice_jaccard(spark, sf_dir):
    """Pairwise corpus-slice overlap from per-slice KMV sketches
    (sketch.kmv_slice_jaccard): jaccard of the per-language word-BIGRAM
    vocabularies via sketch algebra (merge = union hashes, re-take the 64
    smallest; intersection by inclusion-exclusion) — the curation question
    "how much of slice A is already in B" WITHOUT a corpus-shuffling pair
    join. Every lang holds ~900 distinct bigrams >> k=64 so both engines
    value-check the ESTIMATOR path, not the exact fallback; the pairwise
    stage runs over 5 sketch rows. 17732923532771328 = (k-1) * 2^48; the
    ppm quotient needs HUGEINT/DECIMAL(38,0) (est * 10^6 can pass BIGINT).
    Reference analog: the per-folder corpus-stats overlap the ingest
    dashboard cannot answer without full scans (processors/queue.py)."""
    from ..operators.dedupe import _shingles
    from ..operators.sketch import kmv_slice_jaccard

    d = _shingles(_t(spark, sf_dir, "documents"), "text", 2)
    return kmv_slice_jaccard(d.select("lang", "shingle"), "lang", "shingle", k=64)


@query(
    "text_tfidf_top_terms",
    """WITH toks AS (SELECT doc_id,
                unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
              FROM documents),
       tok2 AS (SELECT doc_id, term FROM toks WHERE term != ''),
       dt AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
       nd AS (SELECT count(DISTINCT doc_id) AS n FROM dt),
       dfq AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
       sc AS (SELECT dt.doc_id, dt.term, dt.tf, dfq.df,
                     dt.tf * (((SELECT n FROM nd) * 1000000) // dfq.df) AS score
              FROM dt JOIN dfq USING (term)),
       r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term) AS rn
             FROM sc)
       SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 3""",
)
def text_tfidf_top_terms(spark, sf_dir):
    """Per-document keyword extraction (text_quality.tfidf_top_terms):
    the 3 highest-TF-IDF terms per doc with integer fixed-point IDF
    (tf * ((N*10^6) DIV df) — the lift form, never ln(), whose float
    rounding no two engines replay identically). The per-DOC counterpart
    of text_distinctive_terms' per-group lift; reference analog is the
    per-document term weighting keyword_search_service.py builds in
    Python. The per-doc rank<=k window takes Spark's WindowGroupLimit
    map-side pre-prune; (score DESC, term ASC) is a total order, so the
    top-k is a deterministic set."""
    from ..operators.text_quality import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)


@query(
    "text_inverted_index",
    r"""WITH t AS (SELECT doc_id AS d,
                  unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           FROM documents),
       td AS (SELECT term, d, CAST(count(*) AS BIGINT) AS tf
              FROM t WHERE term <> '' GROUP BY 1, 2),
       stats AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
                        CAST(sum(tf) AS BIGINT) AS cf
                 FROM td GROUP BY 1),
       rk AS (SELECT term, d,
                     row_number() OVER (
                       PARTITION BY term
                       ORDER BY md5(concat(CAST(d AS VARCHAR), '|', 'post0')), d) AS rn
              FROM td),
       posts AS (SELECT term, CAST(count(*) AS BIGINT) AS n_postings,
                        string_agg(CAST(d AS VARCHAR), ',' ORDER BY d) AS postings_csv
                 FROM rk WHERE rn <= 100 GROUP BY term)
       SELECT s.term, s.df, s.cf, p.n_postings, p.postings_csv
       FROM stats s JOIN posts p USING (term)""",
)
def text_inverted_index(spark, sf_dir):
    """Capped inverted-index export (text_quality.inverted_index): per
    term, EXACT document/corpus frequency plus the 100 md5-smallest doc
    ids as an ascending CSV posting sample — the retrieval artifact a
    corpus engine ships to search/RAG, with hub terms costing the cap
    (WindowGroupLimit pre-prunes map-side) instead of the corpus. The
    hash-smallest sample is a fixed property of the data (sample_
    quantiles doctrine): partition/retry/engine-invariant and shard-
    mergeable. Cap binds on every term at sf0.1 (5000 docs, 31-term
    vocabulary) and is mixed at sf0.01 — both branches value-checked."""
    return TQ.inverted_index(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_postings=100
    )


@query("text_bpe_train", _bpe_oracle_sql(_BPE_ROUNDS, encode=False))
def text_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training (bpe.bpe_train): 8 merge rounds
    over the documents word histogram — per round one algebraic weighted
    pair count, a deterministic (count DESC, lhs, rhs) argmax, and a
    strict leftmost-greedy merge expressed as run-parity windows. The
    whole loop runs on the histogram, never the corpus (the 100 TB
    design: ~10^8 token rows vs 10^13 corpus tokens). The oracle unrolls
    all 8 rounds in DuckDB — a wrong count, a wrong tie-break, or a
    non-greedy merge in ANY round cascades into every later round's best
    pair and hash-mismatches."""
    from ..operators import bpe as B

    mdf, _ = B.bpe_train(_t(spark, sf_dir, "documents"), "text", _BPE_ROUNDS)
    return mdf


@query("text_bpe_encode", _bpe_oracle_sql(_BPE_ROUNDS, encode=True))
def text_bpe_encode(spark, sf_dir):
    """BPE inference (bpe.bpe_apply): segment every distinct corpus word
    with the 8 merges text_bpe_train learned, in learned order — output
    one row per word with its final token sequence as a space-joined
    string (sorted-CSV doctrine). Checks the MERGE APPLICATION deeply:
    every word's full segmentation must match DuckDB's replay, including
    the a==b run-parity words ('agg' -> 'a' + 'gg' only if (g,g) merged
    before (a,g))."""
    from ..operators import bpe as B

    d = _t(spark, sf_dir, "documents")
    _, merges = B.bpe_train(d, "text", _BPE_ROUNDS)
    return B.bpe_apply(B.word_histogram(d, "text"), merges)


@query(
    "text_vocab_coverage",
    """WITH tf AS (
         SELECT grp, term, CAST(count(*) AS BIGINT) AS f
         FROM (SELECT lang AS grp,
                      unnest(string_split(lower(text), ' ')) AS term
               FROM documents)
         WHERE regexp_matches(term, '^[a-z]+$') GROUP BY 1, 2),
       fh AS (SELECT grp, f, CAST(count(*) AS BIGINT) AS n_terms
              FROM tf GROUP BY 1, 2),
       cum AS (
         SELECT grp, f, n_terms, f * n_terms AS mass,
                CAST(sum(f * n_terms) OVER (PARTITION BY grp ORDER BY f DESC)
                     AS BIGINT) AS cum_mass,
                CAST(sum(n_terms) OVER (PARTITION BY grp ORDER BY f DESC)
                     AS BIGINT) AS cum_terms,
                CAST(sum(f * n_terms) OVER (PARTITION BY grp) AS BIGINT)
                  AS total
         FROM fh),
       x AS (SELECT cum.*, v.target_pct,
                    (total * v.target_pct + 99) // 100 AS t
             FROM cum, (VALUES (50), (90), (99)) v(target_pct))
       SELECT grp AS lang, CAST(target_pct AS BIGINT) AS target_pct,
              CAST(cum_terms - n_terms
                   + ((t - (cum_mass - mass)) + f - 1) // f AS BIGINT)
                AS vocab_size,
              CAST(cum_mass - mass
                   + ((t - (cum_mass - mass)) + f - 1) // f * f AS BIGINT)
                AS covered_tokens,
              total AS total_tokens
       FROM x
       WHERE cum_mass >= t AND cum_mass - mass < t""",
)
def text_vocab_coverage(spark, sf_dir):
    """Vocabulary sizing curve (text_quality.vocab_coverage): per
    language, the exact number of frequency-ranked vocabulary terms
    needed to cover 50/90/99% of token mass — computed entirely on the
    per-group FREQUENCY HISTOGRAM (no term-level sort anywhere; the
    boundary frequency class is entered partially with ceil-division
    integer arithmetic), windows partitioned by group only."""
    from ..operators.text_quality import vocab_coverage

    return vocab_coverage(
        _t(spark, sf_dir, "documents"), "text", "lang", (50, 90, 99)
    )


# ------------------------------------- substring dedup / LM quality filter --

@query(
    "text_duplicated_ngrams",
    _NEARDUP_SQL + r""",
       cells AS MATERIALIZED (
         SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
         FROM (
           SELECT doc_id,
                  unnest(list_transform(
                    generate_series(1, greatest(len(toks) - 2, 0)),
                    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                  )) AS gram
           FROM (SELECT doc_id,
                        string_split_regex(trim(lower(text)), '\s+') AS toks
                 FROM aug))
         GROUP BY doc_id, gram),
       marg AS (
         SELECT gram, min(doc_id) <> max(doc_id) AS dup
         FROM cells GROUP BY gram)
       SELECT c.doc_id,
              CAST(sum(c.cnt) AS BIGINT) AS ngrams_total,
              CAST(sum(CASE WHEN m.dup THEN c.cnt ELSE 0 END) AS BIGINT)
                AS ngrams_dup,
              CAST(sum(CASE WHEN m.dup THEN c.cnt ELSE 0 END) * 1000000
                   // sum(c.cnt) AS BIGINT) AS dup_ppm
       FROM cells c JOIN marg m USING (gram)
       GROUP BY c.doc_id""",
)
def text_duplicated_ngrams(spark, sf_dir):
    """Substring-level duplication report (text_quality.duplicated_ngrams,
    Lee et al. 2022 shape): per doc, the fraction of its token 3-gram
    positions that also occur in some OTHER document — the signal
    document-level MinHash misses (a doc whose second half is verbatim
    boilerplate) and within-doc repetition_signals can't see. Gated over
    the corrupted-variant corpus where half-prefix and prefixed variants
    guarantee real cross-doc duplicated mass next to organic phrasing
    overlap; the corpus collapses to the (doc, gram) histogram first and
    the gram marginal is min!=max (algebraic, never a countDistinct)."""
    d = _neardup_docs(spark, sf_dir)
    return TQ.duplicated_ngrams(d, "doc_id", "text", n=3)

@query(
    "text_lm_score",
    rf"""WITH tr AS MATERIALIZED (
         SELECT bg, CAST(count(*) AS BIGINT) AS c_bg
         FROM (
           SELECT {_LM_BIGRAMS} AS bg
           FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS toks
                 FROM documents WHERE doc_id % 3 = 0))
         GROUP BY bg),
       pfx AS MATERIALIZED (
         SELECT string_split(bg, ' ')[1] AS w1, CAST(sum(c_bg) AS BIGINT) AS c_w1
         FROM tr GROUP BY 1),
       v AS (SELECT count(*) + 1 AS v FROM pfx),
       sc AS MATERIALIZED (
         SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS cnt
         FROM (
           SELECT doc_id, {_LM_BIGRAMS} AS bg
           FROM (SELECT doc_id,
                        string_split_regex(trim(lower(text)), '\s+') AS toks
                 FROM documents WHERE doc_id % 3 <> 0))
         GROUP BY doc_id, bg),
       cond AS (
         SELECT s.doc_id, s.cnt,
                CAST((COALESCE(t.c_bg, 0) + 1) * 1000000
                     // (COALESCE(p.c_w1, 0) + (SELECT v FROM v))
                     AS BIGINT) AS cond_ppm
         FROM sc s
         LEFT JOIN tr t USING (bg)
         LEFT JOIN pfx p ON p.w1 = string_split(s.bg, ' ')[1])
       SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
              CAST(sum(cnt * cond_ppm) // sum(cnt) AS BIGINT) AS lm_score_ppm
       FROM cond GROUP BY doc_id""",
)
def text_lm_score(spark, sf_dir):
    """Reference-fitted bigram-LM fluency score (text_quality.
    lm_bigram_score) — the deterministic integer form of the CCNet/Gopher
    perplexity filter: fit the Laplace-smoothed bigram table on a trusted
    third of the corpus, score the disjoint other two thirds (real
    train/score split, so genuinely unseen bigrams and unseen prefixes
    both carry mass through the smoothing path). Every conditional is
    (c_bg+1)*10^6 div (c_w1+V) on the exact ppm grid — no log(), no
    float perplexity, engine/order-invariant by construction."""
    d = _t(spark, sf_dir, "documents")
    return TQ.lm_bigram_score(
        d.where("doc_id % 3 = 0"), d.where("doc_id % 3 <> 0"), "doc_id", "text"
    )


@query("text_bpe_apply", _bpe_apply_oracle(_BPE_APPLY_MERGES))
def text_bpe_apply(spark, sf_dir):
    """Per-document BPE tokenization report with a fixed ranked merge
    list (bpe.bpe_doc_stats): word count, pre-merge symbol (character)
    count, post-merge token count and the exact tokens-per-word ppm —
    the compression report a tokenizer build ships, and the
    corpus-serving side of text_bpe_train/text_bpe_encode (which gate
    learning and per-word segmentation). The merge list deliberately
    contains the two-level dependency ('e','r') -> ('m','er'): rank
    order matters and is value-checked (applying 'm er' before 'e r'
    exists would tokenize differently — unit-gated in test_bpe.py,
    corpus-gated here). The whole 5-merge x 2-pass replace chain fuses
    into ONE whole-stage-codegen projection over the exploded words;
    the only exchange is the doc-keyed rollup. Docs with no words emit
    no row (oov_stats convention)."""
    from ..operators.bpe import bpe_doc_stats

    return bpe_doc_stats(
        _t(spark, sf_dir, "documents"), "doc_id", "text", _BPE_APPLY_MERGES
    )



@query(
    "text_centroid_class",
    f"""WITH seeds AS (SELECT doc_id, text, lang FROM documents
                     WHERE doc_id % 3 = 0),
       ttok AS (SELECT doc_id, lang, tok FROM (
                  SELECT doc_id, lang,
                         unnest(string_split_regex(lower(text), '\\s+')) AS tok
                  FROM seeds) WHERE tok != ''),
       ttf AS (SELECT doc_id, lang, {_TFIDF_BUCKET_SQL} AS bucket,
                      CAST(count(*) AS BIGINT) AS tf
               FROM ttok GROUP BY 1, 2, 3),
       cent AS (SELECT lang AS label, bucket, CAST(sum(tf) AS BIGINT) AS ctf
                FROM ttf GROUP BY 1, 2),
       cn AS (SELECT label, CAST(sum(ctf * ctf) AS BIGINT) AS nc2
              FROM cent GROUP BY 1),
       dtok AS (SELECT doc_id, tok FROM (
                  SELECT doc_id,
                         unnest(string_split_regex(lower(text), '\\s+')) AS tok
                  FROM documents WHERE doc_id % 3 <> 0) WHERE tok != ''),
       dv AS (SELECT doc_id, {_TFIDF_BUCKET_SQL} AS bucket,
                     CAST(count(*) AS BIGINT) AS dtf
              FROM dtok GROUP BY 1, 2),
       dn AS (SELECT doc_id, CAST(sum(dtf * dtf) AS BIGINT) AS nd2
              FROM dv GROUP BY 1),
       dots AS (SELECT dv.doc_id, cent.label,
                       CAST(sum(dv.dtf * cent.ctf) AS BIGINT) AS dot
                FROM dv JOIN cent USING (bucket) GROUP BY 1, 2),
       sc AS (SELECT doc_id, label,
                     CAST(CAST(dot AS HUGEINT) * dot * 1000000
                          // (CAST(nd2 AS HUGEINT) * nc2) AS BIGINT) AS score_ppm
              FROM dots JOIN dn USING (doc_id) JOIN cn USING (label))
       SELECT doc_id, label, score_ppm,
              CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY score_ppm DESC, label) AS BIGINT) AS rank
       FROM sc""",
)
def text_centroid_class(spark, sf_dir):
    """Rocchio/centroid domain classifier (text_quality.centroid_scores):
    every third document is a labeled seed (class = lang), the rest score
    squared-cosine against each class centroid on the exact ppm grid —
    the train-in-one-aggregation curation classifier ("wiki-like vs
    crawl-like") whose feature space is the SAME md5 hashed-TF the dense
    retrieval path uses. cosine^2 keeps everything integer (dot, |d|^2,
    |c|^2 are BIGINTs; one DECIMAL(38,0)/HUGEINT floor division) and is
    rank-equivalent to cosine for non-negative TF vectors. Centroids are
    (classes x 64 buckets) — broadcast into the bucket join; the per-doc
    rank window is bounded by the class count. Value-checked at sf0.01
    AND sf0.1 over 5 language classes."""
    d = _t(spark, sf_dir, "documents")
    return TQ.centroid_scores(
        d.where("doc_id % 3 = 0"),
        d.where("doc_id % 3 <> 0"),
        "doc_id", "text", "lang",
    )


@query(
    "text_c4_line_filter",
    r"""WITH t AS (
         SELECT doc_id,
                string_split(replace(text, ' the ', '.' || chr(10)),
                             chr(10)) AS parts
         FROM documents),
       ix AS (SELECT doc_id, unnest(generate_series(1, len(parts))) AS i,
                     parts
              FROM t),
       l AS (SELECT doc_id, i - 1 AS idx, trim(parts[i]) AS ln
             FROM ix WHERE trim(parts[i]) <> ''),
       f AS (SELECT doc_id, idx, ln,
                    right(ln, 1) IN ('.', '!', '?', '"') AS ep,
                    len(string_split_regex(ln, '\s+')) >= 5 AS mw,
                    contains(lower(ln), 'window') AS bl
             FROM l),
       rolled AS (
         SELECT doc_id,
                CAST(count(*) AS BIGINT) AS n_lines,
                CAST(count(*) FILTER (ep AND mw AND NOT bl) AS BIGINT)
                  AS n_kept,
                CAST(count(*) FILTER (NOT ep) AS BIGINT) AS dropped_punct,
                CAST(count(*) FILTER (ep AND NOT mw) AS BIGINT)
                  AS dropped_short,
                CAST(count(*) FILTER (ep AND mw AND bl) AS BIGINT)
                  AS dropped_block,
                string_agg(ln, chr(10) ORDER BY idx)
                  FILTER (ep AND mw AND NOT bl) AS text
         FROM f GROUP BY doc_id)
       SELECT doc_id, text, n_lines, n_kept, dropped_punct, dropped_short,
              dropped_block
       FROM rolled WHERE n_kept >= 3""",
)
def text_c4_line_filter(spark, sf_dir):
    """C4 line-level cleaning (text_quality.c4_line_filter) over the
    sentence-ified corpus (the ' the ' -> '.\\n' convention giving real
    line boundaries): terminal-punctuation, >=5-words, and blocklist
    ('window' — a token with real corpus mass standing in for C4's
    'javascript') rules attribute every dropped line to its first
    failing rule, then docs keeping < 3 lines are dropped whole. All
    four line branches carry mass at both scale factors (500/134/310
    dropped + 322 kept lines at sf0.01) and the doc gate bites
    (23/500 docs survive; 257/5000 at sf0.1). One posexplode + codegen
    predicates + a single doc-keyed aggregation."""
    from ..operators.text_quality import c4_line_filter

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" the "), F.lit(".\n")).alias("text"),
    )
    return c4_line_filter(
        d, "doc_id", "text", min_words=5, min_kept_lines=3,
        blocklist=("window",),
    )


@query(
    "assoc_basket_rules",
    """WITH m AS (
         SELECT DISTINCT l_orderkey AS b, p_brand || '/' || p_type AS i
         FROM lineitem JOIN part ON p_partkey = l_partkey),
       n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM m),
       supp AS (SELECT i, CAST(count(*) AS BIGINT) AS s FROM m GROUP BY 1),
       pairs AS (
         SELECT a.i AS item_a, bb.i AS item_b,
                CAST(count(*) AS BIGINT) AS supp_pair
         FROM m a JOIN m bb ON a.b = bb.b AND a.i != bb.i
         GROUP BY 1, 2),
       kept AS (SELECT p.* FROM pairs p, n
                WHERE p.supp_pair * 1000000 >= 900 * n.nb)
       SELECT k.item_a, k.item_b, k.supp_pair,
              sa.s AS supp_a, sb.s AS supp_b,
              CAST(k.supp_pair * 1000000 // sa.s AS BIGINT)
                AS confidence_ppm,
              CAST(CAST(k.supp_pair AS HUGEINT) * n.nb * 1000000
                   // (CAST(sa.s AS HUGEINT) * sb.s) AS BIGINT) AS lift_ppm
       FROM kept k
       JOIN supp sa ON sa.i = k.item_a
       JOIN supp sb ON sb.i = k.item_b
       CROSS JOIN n""",
)
def assoc_basket_rules(spark, sf_dir):
    """Market-basket association rules (assoc.association_rules —
    Agrawal & Srikant pair rules): orders as baskets, brand/type combos
    as items (150 items; plain brands have only 25 values and every
    pair clears any threshold — no pruning branch to check), directed
    rules clearing the RELATIVE 900-ppm-of-baskets support threshold —
    which bites at BOTH scale factors (5506 kept / 16790 pruned pairs
    at sf0.01, 1082/21268 at sf0.1), exactly what an absolute count
    cannot do across corpus sizes. Confidence and lift on the exact
    ppm grid (lift's three-factor product in DECIMAL(38,0)/HUGEINT);
    the within-basket self-join is bounded by the loud max-basket
    guard; supports broadcast back."""
    from ..operators.assoc import association_rules

    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    baskets = li.join(pt, li.l_partkey == pt.p_partkey).select(
        F.col("l_orderkey").alias("b"),
        F.concat_ws("/", "p_brand", "p_type").alias("i"),
    )
    return association_rules(baskets, "b", "i", min_support_ppm=900)


@query(
    "eval_langid_confusion",
    r"""WITH t AS (SELECT doc_id, lang,
                string_split_regex(trim(lower(text)), '\s+') AS toks
              FROM documents),
       profiles AS (
         SELECT 'de' AS plang, ['der','und','die'] AS markers
         UNION ALL SELECT 'en', ['the','and','of']
         UNION ALL SELECT 'es', ['el','la','de']
         UNION ALL SELECT 'fr', ['le','la','et']
         UNION ALL SELECT 'zh', ['de','shi','le']
       ),
       scores AS (
         SELECT doc_id, lang, plang,
                CAST(len(list_filter(toks, x -> list_contains(markers, x)))
                     AS DOUBLE) / len(toks) AS s
         FROM t CROSS JOIN profiles),
       preds AS (SELECT doc_id, lang AS truth, plang AS pred FROM (
                   SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY s DESC, plang ASC) AS rn
                   FROM scores) WHERE rn = 1),
       cells AS (SELECT truth, pred, CAST(count(*) AS BIGINT) AS n
                 FROM preds GROUP BY 1, 2),
       tm AS (SELECT truth, CAST(sum(n) AS BIGINT) AS truth_total
              FROM cells GROUP BY 1),
       pm AS (SELECT pred, CAST(sum(n) AS BIGINT) AS pred_total
              FROM cells GROUP BY 1)
       SELECT c.truth, c.pred, c.n, tm.truth_total, pm.pred_total,
              CAST(c.n * 1000000 // tm.truth_total AS BIGINT) AS recall_ppm,
              CAST(c.n * 1000000 // pm.pred_total AS BIGINT)
                AS precision_ppm
       FROM cells c JOIN tm USING (truth) JOIN pm USING (pred)""",
)
def eval_langid_confusion(spark, sf_dir):
    """Classifier evaluation closed end-to-end (er_metrics.
    confusion_matrix over text_quality.language_id): the marker-word
    language identifier graded against the corpus's labeled lang column
    as a long-form confusion matrix with exact per-cell recall/precision
    ppm — diagonal cells are class recall/precision, off-diagonal cells
    say where each language's mass leaks and what pollutes each
    prediction (the zh marker list collides with es/fr function words,
    so real confusion mass exists at both scale factors). One (truth,
    pred) count + two marginal re-aggs + broadcast joins; the raw
    corpus scans once."""
    from ..operators.er_metrics import confusion_matrix

    d = _t(spark, sf_dir, "documents")
    preds = TQ.language_id(d, "doc_id", "text")
    joined = preds.join(d.select("doc_id", "lang"), "doc_id").select(
        F.col("lang").alias("truth"), F.col("pred_lang").alias("pred")
    )
    return confusion_matrix(joined, "truth", "pred")


@query(
    "text_cooccurrence_glove",
    r"""WITH t AS (
         SELECT doc_id,
                list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '') AS toks
         FROM documents),
       ix AS (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks))) AS i FROM t),
       tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS w
               FROM ix),
       probes AS (SELECT doc_id, w AS ta, dd, pos + dd AS pos
                  FROM tok, (SELECT unnest([1, 2, 3, 4]) AS dd)),
       pairs AS (
         SELECT least(p.ta, k.w) AS w1, greatest(p.ta, k.w) AS w2,
                1000000 // p.dd AS wppm
         FROM probes p JOIN tok k USING (doc_id, pos))
       SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(wppm) AS BIGINT) AS weight_ppm_sum
       FROM pairs GROUP BY 1, 2""",
)
def text_cooccurrence_glove(spark, sf_dir):
    """Distance-weighted co-occurrence matrix (text_quality.
    cooccurrence_counts — the GloVe statistic): every unordered token
    pair within 4 positions with raw counts and the exact-ppm harmonic
    distance weight (1e6 div d per occurrence, pure BIGINT — never
    float accumulation). The d-shift trick turns proximity into ONE
    hash equi-join of the token stream against itself (the
    sorted_neighborhood pair pattern), then an algebraic pair-keyed
    aggregation where hot pairs collapse map-side. Self-co-occurrence
    (w1 = w2) and all four distance weights carry mass."""
    from ..operators.text_quality import cooccurrence_counts

    d = _t(spark, sf_dir, "documents")
    return cooccurrence_counts(d, "doc_id", "text", window=4)


@query(
    "text_collocations_pmi",
    rf"""WITH t AS (
         SELECT doc_id,
                list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            x -> x <> '') AS toks
         FROM documents),
       ix AS (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks))) AS i FROM t),
       tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS w
               FROM ix),
       probes AS (SELECT doc_id, w AS ta, dd, pos + dd AS pos
                  FROM tok, (SELECT unnest([1, 2, 3, 4]) AS dd)),
       cp AS (
         SELECT least(p.ta, k.w) AS w1, greatest(p.ta, k.w) AS w2,
                CAST(count(*) AS BIGINT) AS c
         FROM probes p JOIN tok k USING (doc_id, pos) GROUP BY 1, 2),
       marg AS (SELECT w, CAST(sum(c) AS BIGINT) AS m FROM (
                  SELECT w1 AS w, c FROM cp
                  UNION ALL SELECT w2, c FROM cp) GROUP BY 1),
       tt AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM cp),
       qv AS (
         SELECT cp.w1, cp.w2, cp.c, ma.m AS m1, mb.m AS m2,
                GREATEST(CAST(CAST(cp.c AS HUGEINT) * tt.T * 1048576
                     // (CAST(ma.m AS HUGEINT) * mb.m) AS BIGINT),
                     1) AS _q
         FROM cp JOIN marg ma ON ma.w = cp.w1
                 JOIN marg mb ON mb.w = cp.w2
                 CROSS JOIN tt),
       chain AS (SELECT w1, w2, c, m1, m2, {_PMI_L2_COLS} FROM qv)
       SELECT w1, w2, c AS n_pairs, m1, m2,
              CAST(_l2_a6 - 20 * 64 AS BIGINT) AS pmi_fp
       FROM chain""",
)
def text_collocations_pmi(spark, sf_dir):
    """PMI collocation scoring (text_quality.pmi_collocations — Church
    & Hanks) composed over the GloVe co-occurrence table: log2(c*T /
    (m_x*m_y)) on the 2^-6-bit fixed-point grid via the SAME generated
    log2fp expression text BM25's idf uses on both engines — scores are
    bit-identical, never float-ordering-dependent. Marginals from one
    stacked-explode pass (self pairs count twice so sum(m) = 2T), the
    rational scaled 2^20 and clamped >= 1 (anti-correlated pairs floor
    at -1280 rather than raising). The corpus's collocation lexicon and
    a boilerplate flag in one table."""
    from ..operators.text_quality import cooccurrence_counts, pmi_collocations

    d = _t(spark, sf_dir, "documents")
    co = cooccurrence_counts(d, "doc_id", "text", window=4)
    return pmi_collocations(co)


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_HITS_SQL = " + ".join(
    f"(CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END)" for w in _GOPHER_STOPS
)


@query(
    "text_gopher_rules",
    f"""WITH base AS (
         SELECT doc_id,
                list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
                            x -> x <> '') AS toks,
                list_filter(list_transform(string_split_regex(coalesce(text, ''), '\\n'),
                                           x -> trim(x)), x -> x <> '') AS lns
         FROM documents),
       m AS (
         SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS word_count,
                CAST(len(lns) AS BIGINT) AS _nl,
                CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS _tc,
                CAST(len(list_filter(toks, x -> contains(x, '#')
                     OR contains(x, '...') OR contains(x, '…'))) AS BIGINT) AS _sw,
                CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS _aw,
                CAST(len(list_filter(lns, x -> starts_with(x, '-')
                     OR starts_with(x, '*') OR starts_with(x, '•'))) AS BIGINT) AS _bl,
                CAST(len(list_filter(lns, x -> ends_with(x, '...')
                     OR ends_with(x, '…'))) AS BIGINT) AS _el,
                CAST({_GOPHER_HITS_SQL} AS BIGINT) AS stopword_hits
         FROM base),
       r AS (
         SELECT doc_id, word_count,
                CAST(CASE WHEN word_count > 0 THEN _tc * 1000000 // word_count ELSE 0 END AS BIGINT) AS mean_word_len_ppm,
                CAST(CASE WHEN word_count > 0 THEN _sw * 1000000 // word_count ELSE 0 END AS BIGINT) AS symbol_word_ppm,
                CAST(CASE WHEN _nl > 0 THEN _bl * 1000000 // _nl ELSE 0 END AS BIGINT) AS bullet_line_ppm,
                CAST(CASE WHEN _nl > 0 THEN _el * 1000000 // _nl ELSE 0 END AS BIGINT) AS ellipsis_line_ppm,
                CAST(CASE WHEN word_count > 0 THEN _aw * 1000000 // word_count ELSE 0 END AS BIGINT) AS alpha_word_ppm,
                stopword_hits
         FROM m)
       SELECT doc_id, word_count, mean_word_len_ppm, symbol_word_ppm,
              bullet_line_ppm, ellipsis_line_ppm, alpha_word_ppm, stopword_hits,
              (word_count BETWEEN 30 AND 100000
               AND mean_word_len_ppm BETWEEN 3000000 AND 10000000
               AND symbol_word_ppm <= 100000
               AND bullet_line_ppm <= 900000
               AND ellipsis_line_ppm <= 300000
               AND alpha_word_ppm >= 800000
               AND stopword_hits >= 1) AS keep
       FROM r""",
)
def text_gopher_rules(spark, sf_dir):
    """The Gopher quality-rule battery (text_quality.gopher_rules — Rae
    et al. 2021 Appendix A) over the driver documents: per-doc ppm
    ratios for each published rule plus the conjunction keep flag.
    min_words=30 / min_stopword_hits=1 instead of the paper's 50/2
    because the driver corpus runs 10-100 words with at most one Gopher
    stopword per doc — the published thresholds would drop everything,
    proving nothing; these put real mass on BOTH keep branches at both
    scale factors (word-count ~70/30, stopword ~76/24). Pure per-row
    codegen'd array expressions, no explode, no shuffle."""
    return TQ.gopher_rules(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        min_words=30, min_stopword_hits=1,
    )
