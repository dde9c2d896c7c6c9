"""Entity linking: mention → canonical entity URI (north-rule stage).

The gazetteer is tiny relative to the corpus (hundreds of rows vs 10^12
turns), so the candidate join is an explicit ``F.broadcast`` — zero shuffle
of the big side. Disambiguation (one alias → several entities) is a
deterministic argmax over ``(prior desc, entity_uri asc)`` via a window keyed
on the mention occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_mentions(turns_with_mentions: DataFrame) -> DataFrame:
    """``mentions: array<string>`` → one row per mention occurrence.

    ``posexplode`` keeps the in-text position so repeated aliases in one
    turn stay distinct occurrences.
    """
    return turns_with_mentions.select(
        "conv_id",
        "turn_idx",
        F.posexplode("mentions").alias("mention_pos", "alias"),
    )


def link_entities(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Resolve each mention occurrence to its best entity.

    ``mentions``: (conv_id, turn_idx, mention_pos, alias);
    ``aliases``: the gazetteer (alias, entity_uri, prior).

    Returns (conv_id, turn_idx, mention_pos, alias, entity_uri, score).
    """
    cand = mentions.join(F.broadcast(aliases), "alias")
    w = Window.partitionBy("conv_id", "turn_idx", "mention_pos").orderBy(
        F.col("prior").desc(), F.col("entity_uri").asc()
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "conv_id",
            "turn_idx",
            "mention_pos",
            "alias",
            "entity_uri",
            F.col("prior").alias("score"),
        )
    )
