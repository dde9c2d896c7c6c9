"""Reproducible random-walk corpus generation over the entity graph.

DeepWalk (Perozzi, Al-Rfou & Skiena, KDD 2014): short random walks from
every node form the "sentences" a skip-gram model trains on — the
standard way to turn a KG into an embedding corpus. Engine determinism
discipline: the walk's "randomness" is an md5-derived uniform index
(``kg/negatives.py`` spelling: ``('0x'||substr(md5(key),1,8)) % deg``),
so Spark and the unrolled DuckDB oracle take byte-identical walks and
the corpus is reproducible under any partitioning.

Scale shape: walkers advance by EQUI-joins — each step first joins the
walker set to the degree table to compute the chosen neighbor INDEX,
then joins ``(node, idx)`` against the uniquely-indexed adjacency. A
hub node never fans out (the naive spelling — join walkers to the full
neighbor list, then filter — materializes degree×walkers rows at
rdf:type-scale hubs). ``localCheckpoint`` per step keeps the L-join
lineage flat (``cc.py``/``pagerank.py`` discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_index(*cols) -> "F.Column":
    """Uniform reproducible index in [0, 2³²): first 8 md5 hex digits."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 8), 16, 10
    ).cast("long")


def graph_random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(start, walk_id, walk, n_steps)`` — ``walks_per_node``
    reproducible walks of up to ``walk_len`` steps from every node with
    ≥1 out-edge, rendered as a space-joined node sentence. A walk ends
    early at a sink node (``n_steps`` < ``walk_len``); the chosen
    neighbor at step s is ``sorted_out_neighbors[md5(start, walk_id, s,
    cur) % out_degree]``."""
    adj = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nbr")
    ).distinct()
    w = Window.partitionBy("node").orderBy("nbr")
    indexed = adj.withColumn(
        "idx", (F.row_number().over(w) - 1).cast("long")
    ).localCheckpoint(eager=False)
    # materialized: joined by EVERY step — without it each of the L steps
    # replays the degree groupBy off the adjacency
    degs = indexed.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).localCheckpoint(eager=False)
    walkers = (
        degs.select(F.col("node").alias("start"))
        .select(
            "start",
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_node - 1))
            ).alias("walk_id"),
        )
        .select(
            "start", "walk_id",
            F.col("start").alias("cur"),
            F.array(F.col("start")).alias("path"),
        )
    )
    for step in range(1, walk_len + 1):
        chosen = walkers.join(
            degs.select(F.col("node").alias("cur"), "deg"), "cur", "left"
        ).withColumn(
            "idx",
            F.pmod(
                _md5_index(
                    F.col("start"), F.col("walk_id"), F.lit(step),
                    F.col("cur"),
                ),
                F.col("deg"),
            ),
        )
        stepped = chosen.join(
            indexed.select(
                F.col("node").alias("cur"), "idx", "nbr"
            ),
            ["cur", "idx"],
            "left",
        )
        walkers = stepped.select(
            "start", "walk_id",
            F.col("nbr").alias("cur"),
            F.when(
                F.col("nbr").isNotNull(),
                F.concat(F.col("path"), F.array(F.col("nbr"))),
            ).otherwise(F.col("path")).alias("path"),
        ).localCheckpoint(eager=False)
    return walkers.select(
        "start",
        F.col("walk_id").cast("long").alias("walk_id"),
        F.concat_ws(" ", F.col("path")).alias("walk"),
        (F.size("path") - 1).cast("long").alias("n_steps"),
    )
