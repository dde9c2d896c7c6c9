"""Entity linking: mention → canonical entity URI (north-rule stage).

The gazetteer is tiny relative to the corpus (hundreds of rows vs 10^12
turns), so the candidate join is an explicit ``F.broadcast`` — zero shuffle
of the big side. Disambiguation (one alias → several entities) is a
deterministic argmax over ``(prior desc, entity_uri asc)`` via a window keyed
on the mention occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    The disambiguation argmax depends ONLY on the alias, so it is reduced
    on the gazetteer FIRST (``matcher.best_alias_entities`` — the one
    shared definition of the ``prior DESC NULLS LAST, entity_uri ASC``
    ordering) and the winner broadcast-joined onto the occurrences. The
    round-5 spelling ran a ``row_number`` window partitioned per
    occurrence, which shuffled and sorted every mention in the corpus to
    re-derive a per-alias fact — one exchange of the big side, now zero.
    """
    from .matcher import best_alias_entities

    best = best_alias_entities(aliases, include_score=True)
    return mentions.join(F.broadcast(best), "alias").select(
        "conv_id",
        "turn_idx",
        "mention_pos",
        "alias",
        "entity_uri",
        "score",
    )
