"""Training-data exporters FROM the knowledge graph: negative sampling
for link-prediction / KG-embedding training, and deterministic random
walks for graph-to-sequence (node2vec/DeepWalk-style) corpora.

The reference builds the graph and stops (global_node_repository.py /
global_edge_repository.py store and serve); a 100 TB training pipeline
additionally has to EXPORT the graph as model food — (positive, negative)
triple pairs and walk sequences — at the same scale as the graph itself.

Determinism doctrine (same as sampling.py): every "random" choice is a
pure function of (row content, salt) on the 48-bit md5 grid, so results
are partition-, retry-, and engine-invariant, and a DuckDB oracle can
replay them bit-for-bit. Never rand(seed) — it is per-partition seeded
and reshuffles under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .graph import _clean_edges, _symmetrized


def _hash48(*cols: Column | str) -> Column:
    """48-bit md5 grid hash of the '|'-joined stringified columns — the
    repo-wide portable-hash recipe (md5 hex chars 1-12)."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c for c in cols]
    return F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 12), 16, 10).cast(
        "long"
    )


def negative_sample(
    triples: DataFrame,
    entities: DataFrame,
    n_per_positive: int,
    salt: str = "neg",
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    entity_col: str = "entity",
) -> DataFrame:
    """Filtered tail-corruption negative sampling: for each positive
    triple (src, rel, dst) and trial j in [0, n_per_positive), replace
    dst with a hash-chosen entity; drop any corruption that collides with
    a TRUE triple (the standard "filtered" setting of the KG-embedding
    literature — Bordes et al., TransE, NeurIPS 2013). Output
    (src, rel, dst, trial) where dst is the corrupted tail; per positive,
    up to n_per_positive rows survive (fewer when a draw hits a true
    triple — deterministic, disclosed, and rare when the entity set is
    large).

    The draw: entities get a deterministic permutation index (row_number
    over (md5(entity|salt), entity)); trial j of a triple picks index
    hash48(src|rel|dst|j|salt) % N. Pure content arithmetic — no rand(),
    no driver loops.

    Scale shape: positives explode map-side by n_per_positive (no
    shuffle), ONE equi-join on the sampled index against the indexed
    entity table, ONE left-anti join against the positives on the full
    triple key. The entity count N is the only driver-side scalar (a
    single count job). Skew-free: sampled indices are uniform by
    construction."""
    if n_per_positive <= 0:
        raise ValueError("n_per_positive must be > 0")
    pos = triples.select(
        F.col(src).alias("src"), F.col(rel).alias("rel"), F.col(dst).alias("dst")
    ).distinct()
    ents = (
        entities.select(F.col(entity_col).alias("_ent"))
        .where(F.col("_ent").isNotNull())
        .distinct()
    )
    idx_w = Window.orderBy(_hash48(F.col("_ent"), F.lit(salt)), F.col("_ent"))
    indexed = ents.withColumn("_idx", F.row_number().over(idx_w) - 1).localCheckpoint(
        eager=True
    )
    n = indexed.count()
    if n == 0:
        raise ValueError("entities is empty")
    drawn = (
        pos.withColumn(
            "trial", F.explode(F.sequence(F.lit(0), F.lit(n_per_positive - 1)))
        )
        .withColumn(
            "_idx",
            _hash48(
                F.col("src"), F.col("rel"), F.col("dst"), F.col("trial"), F.lit(salt)
            )
            % F.lit(n),
        )
        .join(indexed, "_idx")
        .select(
            "src",
            "rel",
            F.col("_ent").alias("dst_neg"),
            F.col("trial").cast("long").alias("trial"),
        )
    )
    return drawn.join(
        pos.select("src", "rel", F.col("dst").alias("dst_neg")),
        ["src", "rel", "dst_neg"],
        "left_anti",
    ).select("src", "rel", F.col("dst_neg").alias("dst"), "trial")


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    length: int,
    salt: str = "walk",
    src: str = "src",
    dst: str = "dst",
    start_col: str = "vertex",
) -> DataFrame:
    """One deterministic walk of up to `length` hops from every start
    vertex over the undirected graph: output (start, step, vertex) with
    step 0 = the start itself. The next hop from v at step t is the
    neighbor minimizing (hash48(v|t|neighbor|salt), neighbor) — a pure
    content draw, so the walk corpus is partition/retry-invariant and
    engine-replayable (the contract oracle unrolls the steps with
    row_number() = 1). A start with no neighbors contributes only its
    step-0 row.

    This is the DeepWalk/node2vec corpus generator (Perozzi et al., KDD
    2014) in its deterministic form: one walk per start per salt — run R
    salts for R walks per vertex, exactly like epochs.

    Scale shape: `length` rounds, each ONE frontier-sized equi-join on
    the current vertex plus ONE algebraic min(struct) per start (map-side
    partials) — never per-walk Python, never a |V| scan. The symmetrized
    edge table is localCheckpoint'd once and reused by every round."""
    if length < 0:
        raise ValueError("length must be >= 0")
    und = _symmetrized(_clean_edges(edges, src, dst)).localCheckpoint(eager=True)
    cur = (
        starts.select(F.col(start_col).alias("start"))
        .where(F.col("start").isNotNull())
        .distinct()
        .withColumn("_cur", F.col("start"))
    )
    out = cur.select("start", F.lit(0).cast("long").alias("step"),
                     F.col("_cur").alias("vertex"))
    for step in range(1, length + 1):
        nxt = (
            und.join(cur.select("start", F.col("_cur").alias("src")), "src")
            .select(
                "start",
                F.col("dst").alias("_cand"),
                _hash48(F.col("src"), F.lit(step), F.col("dst"), F.lit(salt)).alias(
                    "_h"
                ),
            )
            .groupBy("start")
            .agg(F.min(F.struct("_h", "_cand")).alias("_m"))
            .select("start", F.col("_m._cand").alias("_cur"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(
            nxt.select(
                "start", F.lit(step).cast("long").alias("step"),
                F.col("_cur").alias("vertex"),
            )
        )
        cur = nxt
    return out


def neighborhood_features(
    edges: DataFrame,
    attrs: DataFrame,
    id_col: str,
    feature_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """GNN-style feature export: per vertex, aggregate the numeric
    attribute over its 1-hop undirected neighborhood — (vertex, degree,
    f_sum, f_min, f_max) — the message-passing layer a graph model trains
    on, materialized relationally (GraphSAGE's mean/pool aggregators,
    Hamilton et al. 2017; iterate the operator for deeper receptive
    fields). The reference serves neighborhoods one node at a time
    (global_edge_repository.py get_edges_for_node); training needs them
    for EVERY node in one pass.

    Float sums follow the repo doctrine for cross-engine exactness: cast
    to DECIMAL(18,2), sum exactly, display as double — never a raw double
    sum, whose addition order no two engines share.

    Scale shape: ONE equi-join (edge table x attribute table on the
    neighbor id) + ONE vertex-keyed algebraic agg with map-side partials;
    hub vertices are absorbed by the combiner, never by a single task's
    memory."""
    und = _symmetrized(_clean_edges(edges, src, dst))
    nb = und.join(
        attrs.select(F.col(id_col).alias("dst"), F.col(feature_col).alias("_f")),
        "dst",
    )
    return nb.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum(F.col("_f").cast("decimal(18,2)")).cast("double").alias("f_sum"),
        F.min("_f").alias("f_min"),
        F.max("_f").alias("f_max"),
    )


def sampled_adjacency(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    fanout: int = 16,
) -> DataFrame:
    """GraphSAGE-style deterministic neighbor sampling: for every vertex
    of the undirected graph, keep at most `fanout` neighbors — the ones
    with the SMALLEST hash48(vertex, neighbor) — and export
    (vertex, degree, k_sampled, neighbors_csv) with the sampled
    neighborhood as a comma-joined SORTED string. This is the adjacency
    artifact a GNN trainer consumes: fan-out-capped so hub vertices cost
    the same as leaves, and the sample is a pure function of the edge
    set — partition/retry/engine-invariant and stable across re-exports
    (an epoch resampler can vary a salt; the default is reproducibility).
    The reference serves neighborhoods one vertex per call
    (global_edge_repository.py get_edges_for_node); training wants them
    all, once, in one pass.

    Neighbors render as a CSV string rather than an array so the export
    is hashable on any engine (array cells compare engine-specifically);
    consumers split on ','. Scale shape: one distinct on symmetrized
    edges, one per-vertex window ordered by (hash, neighbor) that
    WindowGroupLimit pre-prunes to fanout rows map-side, one algebraic
    agg with a deterministic sorted string fold (collect into sort_array
    then join — the list is <= fanout long). Degree comes from the same
    collapsed table, no second scan."""
    if fanout <= 0:
        raise ValueError("fanout must be positive")
    und = _symmetrized(_clean_edges(edges, src, dst)).where(
        F.col("src") != F.col("dst")
    ).distinct()
    w = Window.partitionBy("src").orderBy(
        _hash48(F.col("src"), F.col("dst")), "dst"
    )
    return (
        und.withColumn("_rn", F.row_number().over(w))
        .groupBy(F.col("src").alias("vertex"))
        .agg(
            F.count(F.lit(1)).alias("degree"),
            F.sum(F.when(F.col("_rn") <= fanout, 1).otherwise(0))
            .cast("long")
            .alias("k_sampled"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_rn") <= fanout, F.col("dst"))
                    )
                ),
            ).alias("neighbors_csv"),
        )
    )


def hard_negatives(
    embeddings: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    bits: int = 6,
    bands: int = 2,
    k: int = 3,
    max_abs: float | None = None,
) -> DataFrame:
    """ANN-mined hard negatives for contrastive training: per anchor, the
    top-k most-similar vectors that do NOT share its label (canonical
    entity id) — the quality upgrade over negative_sample's random
    corruptions. A model trained on random negatives learns to separate
    obviously-unrelated pairs; hard negatives carry the gradient signal
    near the decision boundary (the standard dense-retrieval recipe,
    e.g. DPR/ANCE-style mining).

    Scale shape — never an all-pairs join: candidates come from `bands`
    independent hyperplane-LSH bucket self-joins (hash equi-join on
    (band, bucket); per-bucket mass is corpus/2^bits per band), ranked
    by the int8 integer dot over quantize_embeddings codes (bandwidth-
    compressed, engine-exact — the quantized_topk doctrine: quantize to
    ints FIRST, then every downstream comparison is order-free integer
    arithmetic), top-k per anchor via a window partitioned by anchor.
    Recall is probabilistic like every LSH path here (multi-band recovers
    it; measured in bench's recall report for the query-side twin).

    Output: (anchor, negative, qscore, rank), rank 1..k by
    (qscore DESC, negative ASC). Anchors whose buckets contain only
    same-label vectors are absent — the signal to widen bands/bits."""
    from .similarity import (
        corpus_max_abs,
        hyperplane_signature,
        quantize_embeddings,
    )

    if bands < 1 or bits < 1 or k < 1:
        raise ValueError("bands, bits and k must be >= 1")
    ma = corpus_max_abs(embeddings, vec_col) if max_abs is None else float(max_abs)
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(label_col).alias("_lab"),
    )
    sigs = None
    for b in range(bands):
        s = base.select(
            "_id",
            "_lab",
            F.lit(b).alias("_b"),
            hyperplane_signature(F.col("_v"), dims, bits, band=b).alias("_bkt"),
        )
        sigs = s if sigs is None else sigs.unionAll(s)
    cand = (
        sigs.alias("a")
        .join(sigs.alias("c"), ["_b", "_bkt"])
        .where(
            (F.col("a._id") != F.col("c._id"))
            & (F.col("a._lab") != F.col("c._lab"))
        )
        .select(
            F.col("a._id").alias("anchor"), F.col("c._id").alias("negative")
        )
        .distinct()
    )
    coded = quantize_embeddings(embeddings, id_col, vec_col, max_abs=ma)
    scored = (
        cand.join(
            coded.select(F.col(id_col).alias("anchor"), F.col("qvec").alias("_qa")),
            "anchor",
        )
        .join(
            coded.select(
                F.col(id_col).alias("negative"), F.col("qvec").alias("_qc")
            ),
            "negative",
        )
        .select(
            "anchor",
            "negative",
            F.aggregate(
                F.zip_with("_qa", "_qc", lambda a, c: (a * c).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qscore"),
        )
    )
    w = Window.partitionBy("anchor").orderBy(
        F.col("qscore").desc(), F.col("negative")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def mention_contexts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
    k: int = 4,
) -> DataFrame:
    """Token-window training-sample export around gazetteer hits — the
    table an NER/EL model is fine-tuned on ("given k tokens either side,
    is this surface form entity X?"), and the corpus the cosine
    disambiguator's context vectors come from:

        (doc_id, pos, keyword, left_ctx, right_ctx)

    One row per OCCURRENCE (pos = 0-based token index, so repeated hits
    in one doc each carry their own window); contexts are space-joined
    token strings truncated at document edges (sorted-CSV doctrine:
    strings compare exactly cross-engine where array cells do not).

    Scale shape: tokenize -> posexplode -> ONE broadcast-literal isin
    filter (the gazetteer here is the keyword list; for 10^4+ keywords
    use detect_mentions' broadcast-join/Aho-Corasick paths to find hits
    and join windows back) -> two codegen'd array slices around the hit.
    No join, no window, no shuffle at all — a pure narrow map over the
    scan, embarrassingly parallel at any corpus size. k and the keyword
    list are validated driver-side; empty/whitespace docs tokenize to
    zero tokens (never a phantom '')."""
    if k < 1 or not keywords:
        raise ValueError("mention_contexts: k >= 1 and non-empty keywords")
    base = F.trim(F.lower(F.col(text_col)))
    toks = F.when(base != "", F.split(base, r"\s+"))
    hits = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("_t")
    ).select(
        "doc_id", "_t", F.posexplode("_t").alias("pos", "keyword")
    ).where(F.col("keyword").isin([str(w) for w in keywords]))
    left_start = F.expr(f"greatest(pos - {int(k)}, 0) + 1")
    left_len = F.expr(f"pos - greatest(pos - {int(k)}, 0)")
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "keyword",
        F.array_join(F.slice("_t", left_start, left_len), " ").alias(
            "left_ctx"
        ),
        F.array_join(F.slice("_t", F.col("pos") + 2, F.lit(int(k))), " ").alias(
            "right_ctx"
        ),
    )


def mention_salience(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keywords: list[str],
    early_weight: int = 7,
) -> DataFrame:
    """Positional entity salience — per (doc, keyword): how PROMINENT is
    the entity in the document, not merely whether it appears. The
    standard features (Dunietz & Gillick 2014, "A new entity salience
    task"): first-mention position (title/lead mentions dominate),
    mention frequency, and spread, folded into one exact-integer score:

        early_ppm    = (L - first_pos) * 10^6 div L
        freq_ppm     = n_mentions * 10^6 div L
        salience_ppm = (w*early_ppm + (10-w)*freq_ppm) div 10

    (L = doc token count, positions 0-based, w = early_weight in
    [0, 10]). Feeds entity ranking in summarize_entities, disambiguation
    priors (a doc's most salient candidate wins ties), and weak labels
    for a salience classifier — the reference counts mentions per page
    (file_analysis_service.py) but has no notion of position, so a
    footer mention weighs as much as a title one.

    Tokenization is the corpus-wide lowercase-whitespace convention;
    `keywords` are matched as whole tokens (for 10^4+ keywords route
    detection through detect_mentions' broadcast paths and feed its
    output here instead). Docs where a keyword never occurs have no row
    (absent-row semantics). Blank docs tokenize to zero tokens and are
    absent. Output: (id, keyword, n_mentions, first_pos, last_pos,
    spread, salience_ppm).

    Scale shape: posexplode + a broadcast-literal IN filter (the
    mention_contexts convention), then ONE algebraic (doc, keyword)
    aggregation — min/max/count with map-side combine — and a broadcast
    join back for the token count; no windows, no raw-token shuffle
    beyond the matched rows."""
    if not keywords:
        raise ValueError("keywords must be non-empty")
    if not 0 <= int(early_weight) <= 10:
        raise ValueError("early_weight must be in [0, 10]")
    kw = sorted({k.lower() for k in keywords})
    w = int(early_weight)
    toks = df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("_pos", "_t"),
    )
    lens = toks.groupBy("_d").agg(F.count(F.lit(1)).cast("long").alias("_L"))
    hits = toks.where(F.col("_t").isin(*kw))
    agg = hits.groupBy("_d", "_t").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.min("_pos").cast("long").alias("first_pos"),
        F.max("_pos").cast("long").alias("last_pos"),
    )
    return (
        agg.join(lens, "_d")
        .select(
            F.col("_d").alias(id_col),
            F.col("_t").alias("keyword"),
            "n_mentions",
            "first_pos",
            "last_pos",
            (F.col("last_pos") - F.col("first_pos")).alias("spread"),
            F.expr(
                f"CAST(({w} * ((_L - first_pos) * 1000000 div _L)"
                f" + {10 - w} * (n_mentions * 1000000 div _L)) div 10"
                " AS BIGINT)"
            ).alias("salience_ppm"),
        )
    )
