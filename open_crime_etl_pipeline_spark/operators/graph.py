"""Iterative graph analytics on DataFrames (SURVEY.md §2 [EXT]:
iterative algorithms — the one operator shape plain SQL doesn't cover).

PageRank is the canonical iterative join+agg: each round shuffles rank
mass along edges and re-aggregates per destination. The Spark-first
shape is

    ranks ⟵ ranks ⋈ edges (on src) → groupBy(dst).sum → damp

with ``localCheckpoint(eager=True)`` every few rounds to truncate the
lineage (otherwise the plan doubles per iteration and the optimizer
chokes long before the data does — the classic iterative-Spark
failure). Edges are hash-partitioned on ``src`` once and reused every
round, so each iteration is ONE shuffle of rank rows (O(V)), never of
the edge table.

Triangle counting uses the standard orientation trick: order each
undirected edge from its lower-degree endpoint to the higher (ties by
id), so every triangle is counted exactly once and the join fan-out of
hot vertices is bounded by their *oriented* out-degree (≤ √(2E) for
any graph) instead of their raw degree — this is what keeps
celebrity-vertex skew from exploding the intermediate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, weight)``.

    Out-weights are normalized per src (transition probability =
    weight / Σ out-weight). Vertices = union of endpoints; ranks start
    uniform at 1/V. No dangling-mass redistribution (dangling rank
    decays into the teleport term) — the oracle states the identical
    recurrence, so both engines compute the same fixpoint trajectory.

    Scale shape: ``probs`` (edges with normalized weight) is computed
    once and cached; each iteration shuffles only O(V) rank rows.
    Lineage is truncated with eager localCheckpoints so the 10th
    iteration's plan is as small as the 1st's.
    """
    verts = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()  # joined every round — uncached it re-scans edges 10×
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_weight"))
    probs = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_weight")).alias("p"))
        .repartition("src")
        .cache()
    )
    n_verts = verts.count()  # also materializes the vertex cache
    teleport = (1.0 - damping) / n_verts

    ranks = verts.select("node", F.lit(1.0 / n_verts).alias("rank"))
    for i in range(iters):
        contribs = (
            ranks.join(probs, ranks["node"] == probs["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
        )
        ranks = (
            verts.join(contribs, verts["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    # Detach the result from the iteration caches before returning:
    # eagerly checkpointing the final ranks (O(V) rows) lets verts/probs
    # be unpersisted immediately instead of leaking cached blocks into
    # the caller's session until LRU eviction.
    ranks = ranks.localCheckpoint(eager=True)
    verts.unpersist()
    probs.unpersist()
    return ranks


def pagerank_oracle_sql(edges_cte: str, damping: float = 0.85, iters: int = 10) -> str:
    """Unrolled-SQL PageRank oracle: the same recurrence as
    :func:`pagerank`, written as ``iters`` chained (non-recursive)
    CTEs so DuckDB — which disallows aggregation in recursive CTE
    terms — can state it exactly. ``edges_cte`` must define
    ``edges(src, dst, weight)``."""
    d = damping
    parts = [edges_cte.rstrip().rstrip(","), """,
        verts AS (
            SELECT src AS node FROM edges
            UNION
            SELECT dst FROM edges
        ), nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
        probs AS (
            SELECT e.src, e.dst,
                   e.weight / sum(e.weight) OVER (PARTITION BY e.src) AS p
            FROM edges e
        ),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nv) AS rank FROM verts)"""]
    for i in range(iters):
        parts.append(f""",
        r{i + 1} AS (
            SELECT v.node,
                   (1.0 - {d}) / (SELECT n FROM nv)
                   + {d} * coalesce(m.mass, 0.0) AS rank
            FROM verts v LEFT JOIN (
                SELECT p.dst AS node, sum(r.rank * p.p) AS mass
                FROM r{i} r JOIN probs p ON p.src = r.node
                GROUP BY p.dst
            ) m ON m.node = v.node
        )""")
    parts.append(f"""
        SELECT node, round(rank * 1000, 6) AS rank_k FROM r{iters}""")
    return "WITH " + "".join(parts)


def connected_components(
    edges: DataFrame, iters: int = 8, checkpoint_every: int = 3
) -> DataFrame:
    """Connected-components labels by min-label propagation over an
    undirected graph given as (a, b) pairs: after k rounds each node's
    label is the minimum node id within k hops — at convergence, the
    component's global minimum id. ``iters`` is FIXED (not
    run-to-convergence) so the result is a deterministic function of
    the graph for any engine stating the same recurrence, which is
    what lets an unrolled-SQL oracle pin it exactly (same device as
    :func:`pagerank`).

    Scale shape: the doubled adjacency (+ self-loops, so isolated-ish
    nodes and converged labels are fixpoints of the min) is built once,
    hash-partitioned on ``dst`` and cached; each round shuffles O(V)
    label rows into that partitioning, aggregates min per src — edge
    rows never reshuffle. Lineage is truncated with eager
    localCheckpoints. Min-propagation costs O(diameter) rounds — the
    right default for the short-diameter similarity/co-occurrence
    graphs this engine builds (same propagation the near-dup
    clusterer uses for its scale-safe path, operators/dedup.py); for
    adversarially long paths at 100 TB the large-star/small-star
    variant halves distances per round, at the cost of a non-SQL
    recurrence.
    """
    und = (
        edges.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    verts = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .distinct()
    )
    adj = (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .unionByName(verts.select(F.col("node").alias("src"), F.col("node").alias("dst")))
        .repartition("dst")
        .cache()
    )
    adj.count()  # materialize once; every round reuses the cached partitioning
    labels = verts.select("node", F.col("node").alias("label"))
    for i in range(iters):
        labels = (
            adj.join(labels, adj["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("src", "node")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            labels = labels.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    adj.unpersist()
    return labels


def connected_components_oracle_sql(und_cte: str, iters: int = 8) -> str:
    """Unrolled-SQL min-label propagation: the identical recurrence as
    :func:`connected_components` as chained CTEs (DuckDB disallows
    aggregation in recursive CTE terms). ``und_cte`` must define
    ``und(u, v)`` — deduplicated undirected edges, u < v. Yields
    ``l{iters}(node, label)``; the caller appends the final SELECT."""
    parts = [und_cte.rstrip().rstrip(","), """,
        verts AS (
            SELECT u AS node FROM und UNION SELECT v FROM und
        ), adj AS (
            SELECT u AS src, v AS dst FROM und
            UNION ALL SELECT v, u FROM und
            UNION ALL SELECT node, node FROM verts
        ),
        l0 AS (SELECT node, node AS label FROM verts)"""]
    for i in range(iters):
        parts.append(f""",
        l{i + 1} AS (
            SELECT a.src AS node, min(l.label) AS label
            FROM adj a JOIN l{i} l ON l.node = a.dst
            GROUP BY a.src
        )""")
    return "WITH " + "".join(parts)


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected simple graph given as
    (a, b) pairs (self-loops ignored, duplicates/multi-edges
    deduplicated, either orientation accepted).

    Degree-orders each edge (lower-degree endpoint first, ties by id)
    so each triangle is enumerated exactly once via
    e1(a→b) ⋈ e2(b→c) ⋈ e3(a→c), with hot-vertex join fan-out bounded
    by oriented out-degree ≤ √(2E). Returns a single-row DataFrame
    (n_edges, n_triangles)."""
    und = (
        edges.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # deliberately NOT cached although it is referenced 3× while
        # building `oriented`: measured A/B at sf0.1 (294k edges), the
        # cached form is ~60% SLOWER (4.8–6.1 s vs 3.0–3.7 s) — the
        # block-store round-trip costs more than recomputing the cheap
        # self-join, and the cache boundary blocks codegen fusion
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    oriented = (
        und.join(du, "u").join(dv, "v")
        .select(
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            ).otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"))
            ).alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
        .cache()
    )
    e1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    e3 = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    out = oriented.agg(F.count("*").alias("n_edges")).crossJoin(
        tri.agg(F.count("*").alias("n_triangles"))
    )
    # Single-row result: checkpoint it eagerly so `oriented`'s cached
    # blocks can be released now rather than lingering in the session.
    out = out.localCheckpoint(eager=True)
    oriented.unpersist()
    return out
