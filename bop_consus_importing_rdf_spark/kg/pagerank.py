"""PageRank over a DataFrame edge list (entity salience for KG curation).

Ranking the constructed graph is the canonical "which entities matter"
signal a KG-construction pipeline feeds back into linking priors and
curation queues (the reference's catalogue scope stops at duplicate-id
warnings, Flows.kt:106-112; ranking is the SURVEY §2.8 extension surface).

Semantics: the classic power-iteration form popularized by Spark's own
example (examples/src/main/python/pagerank.py) — Page, Brin, Motwani,
Winograd, *The PageRank Citation Ranking* (Stanford InfoLab 1999):

    rank'(v) = 0.15 + 0.85 * Σ_{u→v} rank(u) / outdeg(u)

over a simple directed graph, fixed iteration count, NO dangling-mass
redistribution (nodes without out-links absorb rank, exactly like the
Spark example) — so total mass is not conserved, but per-node ranks
converge to the same ordering and the recurrence needs no global N or
dangling-sum scalar, keeping every step a pure local join + aggregate.

Engine-exact arithmetic: ranks are BIGINT micro-units (``scale`` = 1.0).
Each step is integer-only — ``rank div outdeg`` per edge, a BIGINT sum,
then ``teleport_q + (85 * in_sum) div 100`` — so Spark and the DuckDB
oracle (the same recurrence unrolled as chained CTEs) agree bit-for-bit
regardless of aggregation order; no floating point ever enters.
Overflow bound: ``85 * in_sum`` must fit int64, i.e. total graph mass
``N · scale ≲ 10^17``; the default ``scale=10^9`` is safe to ~10^8 nodes
(drop ``scale`` as N grows — precision is relative to ``scale``).

Scale shape: per iteration, one join of the (src, dst, deg)-checkpointed
adjacency against the (node, rank) table on ``src`` — both sides keyed
the same way every round, so a real deployment co-partitions them once —
one map-side-combinable sum on ``dst``, and one left join back to the
node set. ``localCheckpoint()`` per iteration truncates lineage (the
iterative-DataFrame driver-OOM trap, see cc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    scale: int = 10**9,
) -> DataFrame:
    """Integer-quantized PageRank; returns ``(node, rank_q)``.

    ``edges`` is a directed simple graph (duplicate edges count once —
    callers wanting multigraph weights should pre-aggregate). ``rank_q``
    is the rank in units of ``1/scale`` (initial rank = ``scale`` = 1.0).
    """
    # simple-graph contract enforced here, not by the caller: duplicate
    # (src, dst) rows would inflate out-degree AND contribution count,
    # silently diverging from the documented recurrence (and the oracle's
    # SELECT DISTINCT edge CTE)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # adjacency with out-degree attached, materialized once: every
    # iteration joins it, and without the checkpoint each round would
    # re-execute the caller's entire upstream plan (cc.py lesson)
    adj = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    teleport_q = 15 * scale // 100
    step = F.expr(
        f"CAST({teleport_q} AS BIGINT) + "
        "(85 * coalesce(m, CAST(0 AS BIGINT))) div 100"
    ).alias("rank_q")
    ranks = nodes.select(
        "node", F.lit(scale).cast("long").alias("rank_q")
    )
    for _ in range(iters):
        in_sum = (
            adj.join(ranks, adj["src"] == ranks["node"])
            .select(
                adj["dst"].alias("node"),
                F.expr("rank_q div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            nodes.join(in_sum, "node", "left")
            .select("node", step)
            .localCheckpoint()
        )
    return ranks
