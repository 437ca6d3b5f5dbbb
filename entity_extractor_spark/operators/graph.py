"""Connected components over an edge DataFrame — the canonicalization
primitive (stage s5). GraphFrames-style iterative DataFrame joins, no RDDs.

Algorithm: hash-min label propagation. Each vertex starts labeled with its
own id; each iteration every vertex takes the min label among itself and
its neighbors; converges in O(graph diameter) rounds. The KG equivalence
graphs here are bipartite name<->CAS stars (diameter <= ~4 after unions),
so 2-4 rounds close them; for adversarially deep graphs the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond") drops rounds to O(log d) — plug-compatible here.

Scale notes (10^12-doc corpus, hub chemicals => skewed degree):
  * the min() aggregations are algebraic => map-side partial aggregation
    absorbs hub-key skew before any shuffle;
  * the edges-to-labels join is skewed on hub vertices => AQE skew-join
    splitting (enabled in session.py) handles it at runtime;
  * per-iteration localCheckpoint truncates the lineage so the plan does
    not grow with iterations (SURVEY.md §4 iterative-graph row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SMALL_GRAPH_EDGES = 2_000_000


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """edges(src,dst) [undirected] -> (vertex, component) where component is
    the min vertex id (lexicographic) in the vertex's component.

    Adaptive strategy (same spirit as broadcast-vs-shuffle join selection):
    the DISTINCT edge set is the *entity vocabulary* graph, orders of
    magnitude smaller than the observation table that produced it. When it
    fits comfortably on the driver (< SMALL_GRAPH_EDGES), a driver-side
    union-find computes exact components in one pass and the result is
    broadcast back — replacing ~2 jobs/iteration with one collect. Larger
    graphs take the distributed hash-min label-propagation loop below."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()

    # Materialize the distinct vocabulary graph once (both paths reuse it),
    # then size-probe with a limit+count — the probe moves NO rows to the
    # driver, so a graph that overflows the union-find cutoff costs two
    # cheap jobs instead of a multi-hundred-MB discarded collect. Only
    # graphs that pass the probe pay the driver transfer.
    und = und.localCheckpoint(eager=True)
    if und.limit(SMALL_GRAPH_EDGES + 1).count() <= SMALL_GRAPH_EDGES:
        probe = und.collect()
        spark = edges.sparkSession
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        vertices: set[str] = set()
        for row in probe:
            a, b = row["src"], row["dst"]
            vertices.add(a)
            vertices.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-root union keeps the "component = min vertex id" contract
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = sorted((v, find(v)) for v in vertices)
        if not rows:
            return spark.createDataFrame([], "vertex string, component string")
        return spark.createDataFrame(rows, "vertex string, component string")

    labels = (
        und.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighbor labels: for edge (u,v) send label(v) to u. The vertex's
        # own old label rides along (old = component on the labels side,
        # null on the msgs side) so convergence is checked with a cheap
        # filter over the checkpointed result instead of an extra join+job.
        msgs = und.join(
            labels.withColumnRenamed("vertex", "dst"), "dst"
        ).select(F.col("src").alias("vertex"), "component", F.lit(None).cast("string").alias("old"))
        new_labels = (
            msgs.union(labels.select("vertex", "component", F.col("component").alias("old")))
            .groupBy("vertex")
            .agg(F.min("component").alias("component"), F.max("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("component") != F.col("old")).limit(1).count()
        labels = new_labels.select("vertex", "component")
        if changed == 0:
            break
    return labels
