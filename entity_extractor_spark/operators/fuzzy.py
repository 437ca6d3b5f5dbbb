"""Typo-tolerant entity linking: edit-distance-1 fuzzy join with an
exact-complete, linear-size blocking index.

The reference resolves unmatched names with a substring scan
(`global_node_repository.py:180`: ``lower(gn.name) LIKE '%'||lower(:name)
||'%'``; `manufacturer_repository.py:23`) — a full-table scan per probe
that cannot use an index and misses typos entirely. The scale-sane,
strictly stronger shape is the SymSpell deletion-neighborhood join: for
edit distance <= 1, two strings s, t satisfy lev(s, t) <= 1 IFF their
1-deletion neighborhoods D1(s) and D1(t) intersect, where D1(x) = {x} ∪
{x with one character removed}. Proof sketch: substitution at i shares
the delete-at-i variant; insertion/deletion shares the shorter string
itself; equality shares x. So the join is EXACT-complete — no recall
loss — while the index is linear: sum(len+1) variant rows per side, one
equi-join on the variant string, then one cheap lev() verification to
drop the false candidates the necessary-but-not-sufficient intersection
lets through.

Scale shape at 100 TB: the variant explode is a narrow map (no shuffle);
the candidate join is ONE hash equi-join on short strings; verification
is a codegen'd levenshtein on the (small) candidate set. Never the n^2
cross join, never a per-probe table scan. For edit distance >= 2 the
deletion neighborhood grows O(len^2) — block first (LSH buckets /
norm-name groups, as dedupe.ngram_jaccard_pairs requires) and verify
with F.levenshtein inside the block instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VARIANTS = (
    "CASE WHEN length({c}) <= 1 THEN array({c}) "
    "ELSE array_union(array({c}), "
    "transform(sequence(1, length({c})), "
    "i -> concat(substring({c}, 1, i-1), substring({c}, i+1)))) END"
)


def deletion_variants(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    """One row per 1-deletion variant (the string itself included,
    duplicates within a string collapsed). NULL/empty strings dropped —
    they can never witness a distance-1 match of anything non-empty, and
    an all-NULL gazetteer column should fail loudly downstream, not join.
    """
    return (
        df.where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .withColumn(out_col, F.explode(F.expr(_VARIANTS.format(c=text_col))))
    )


def fuzzy_pairs_1del(
    probe: DataFrame,
    gazetteer: DataFrame,
    probe_key: str,
    probe_text: str,
    gaz_key: str,
    gaz_text: str,
) -> DataFrame:
    """All (probe_key, gaz_key, dist) with lev(probe_text, gaz_text) <= 1.

    Complete by the SymSpell intersection property (module docstring:
    lev <= 1 implies the neighborhoods intersect). The converse does NOT
    hold — 'ab' and 'ba' share the variants 'a' and 'b' at lev 2 — so the
    final F.levenshtein filter supplies precision. distinct() before
    verify: a pair can meet in several variants and must be scored once.
    """
    p = deletion_variants(
        probe.select(
            F.col(probe_key).alias("_pk"), F.col(probe_text).alias("_pt")
        ),
        "_pt",
        "_v",
    )
    g = deletion_variants(
        gazetteer.select(
            F.col(gaz_key).alias("_gk"), F.col(gaz_text).alias("_gt")
        ),
        "_gt",
        "_v",
    )
    cand = (
        p.join(g, "_v")
        .select("_pk", "_pt", "_gk", "_gt")
        .distinct()
    )
    return cand.where(F.levenshtein("_pt", "_gt") <= 1).select(
        F.col("_pk").alias(probe_key),
        F.col("_gk").alias(gaz_key),
        F.levenshtein("_pt", "_gt").cast("bigint").alias("dist"),
    )


def fuzzy_link_best(
    probe: DataFrame,
    gazetteer: DataFrame,
    probe_key: str,
    probe_text: str,
    gaz_key: str,
    gaz_text: str,
) -> DataFrame:
    """Best gazetteer match per probe at edit distance <= 1: min dist,
    ties by min gaz_key — the deterministic argmin every linker here uses
    (link.py's CAS-first cascade, temporal.asof_join). Probes with no
    match within distance 1 are absent from the output (the caller's
    signal to fall back to the LSH / cosine disambiguation path).

    Scale shape: the pair set from fuzzy_pairs_1del is near-linear in the
    probe count (each probe meets a handful of candidates), so the argmin
    is one struct-min groupBy — algebraic, map-side combinable, no window.
    """
    pairs = fuzzy_pairs_1del(
        probe, gazetteer, probe_key, probe_text, gaz_key, gaz_text
    )
    best = pairs.groupBy(probe_key).agg(
        F.min(F.struct(F.col("dist"), F.col(gaz_key))).alias("_b")
    )
    return best.select(
        probe_key,
        F.col(f"_b.{gaz_key}").alias(gaz_key),
        F.col("_b.dist").alias("dist"),
    )
