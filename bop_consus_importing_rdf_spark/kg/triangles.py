"""Triangle counting over the entity graph.

Degree-ordered triangle counting (Suri & Vassilvitskii, *Counting
Triangles and the Curse of the Last Reducer*, WWW 2011): orient every
undirected edge from its lower-(degree, id) endpoint to the higher one,
enumerate wedges at each source, and confirm each wedge's closing edge
against the oriented edge set. The orientation is the entire scale story
— every node's out-degree is O(√m) regardless of its real degree, so the
wedge fan-out at a 10⁸-degree hub (rdf:type, in this graph) is bounded
and no "last reducer" exists. A naive wedge enumeration on the
UNoriented graph is Θ(Σ deg²) and dies on exactly that hub.

Reference scope: the reference has no graph analytics; this is the
LLM/KG-pipeline extension surface (SURVEY §2.8 — entity-graph quality
signals next to PageRank salience in ``pagerank.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node (Watts & Strogatz, Nature
    1998): ``2·T(v) / (deg(v)·(deg(v)−1))`` over the canonical undirected
    simple graph — the per-node cohesion signal next to the k-core and
    triangle counts. Emitted as ``coeff_ppm`` (coefficient × 10⁶, BIGINT
    integer division) so the value is engine-exact; nodes of degree < 2
    have no defined coefficient and are omitted. Returns
    ``(node, deg, n_triangles, coeff_ppm)``."""
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    und = (
        edges.select(a, b)
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    tri = triangle_counts(und, "a", "b")
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.expr(
                "(2 * coalesce(n_triangles, 0) * 1000000) div "
                "(deg * (deg - 1))"
            ).cast("long").alias("coeff_ppm"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """The k-core of the undirected simple graph: ``(node, deg)`` for
    every node of the maximal subgraph where all degrees are ≥ k — the
    classic graph-quality filter (Seidman, *Network structure and minimum
    degree*, Social Networks 1983; peels spam/tail structure off entity
    graphs before embedding or PageRank).

    Iterative peeling: drop all nodes with degree < k, restrict the edge
    set, repeat to fixpoint. Each round is one combinable degree count
    plus two semi joins, ``localCheckpoint``-ed so lineage stays flat
    (``cc.py`` discipline); the driver only runs a bounded emptiness
    check per round. Peel depth is bounded by the degeneracy ordering —
    typically tens of rounds on web-scale graphs; ``max_iter`` raises
    loudly rather than looping forever.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = und
    for _ in range(max_iter):
        # materialized: three consumers per round (emptiness check, the
        # keep filter feeding two semi joins, and the final return)
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionAll(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=False)
        )
        low = deg.filter(F.col("deg") < k)
        if low.limit(1).count() == 0:
            return deg.select("node", F.col("deg").cast("long").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = (
            cur.join(
                keep.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(
        f"k_core did not converge within max_iter={max_iter} rounds"
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts: ``(node, n_triangles)``,
    one row per node in ≥1 triangle.

    Input is a directed multigraph; it is canonicalized to a simple
    undirected graph first (self-loops dropped, parallel/reverse
    duplicates collapsed). Every triangle contributes exactly 1 to each
    of its three corners. Plan: one distinct on the canonical edge, one
    combinable degree count, two joins for the wedge→closure pipeline,
    one final combinable count — no window, no driver iteration.
    """
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    # materialized: consumed by the degree count AND the orientation join
    # (and everything upstream of `edges` would otherwise re-evaluate per
    # consumer — the plan-text blowup make_plans exposed for live inputs)
    und = (
        edges.select(a, b)
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient u→v iff (deg(u), u) < (deg(v), v) — a total order, so the
    # oriented graph is acyclic and every undirected edge appears once
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    ed = und.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # materialized: three consumers (both wedge sides + the closing-edge
    # semi join) — one shuffle-producing join instead of three replays
    oriented = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=False)
    # wedges at u: unordered pairs of out-neighbours, ordered by the same
    # (deg, id) key so the closing edge — if present — is oriented v→w
    o1 = oriented.select("u", F.col("v"), F.col("dv"))
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("w"), F.col("dv").alias("dw")
    )
    wedges = o1.join(o2, "u").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"], "left_semi").select("u", "v", "w")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
