"""Entity blocking: MinHash/LSH similarity edges between entity URIs.

Reuses the generic dedup machinery (``operators/dedup.py``) on each entity's
*alias profile* (all surface forms joined, sorted). Near-duplicate entities —
distinct minted URIs for the same real-world thing — end up connected and
are merged by connected components in the canonicalization stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    char_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
)


# legal-form suffixes stripped before shingling — otherwise a shared
# " Corporation" tail dominates char-shingle similarity between unrelated
# entities (standard company-name canonicalization normalization)
_LEGAL_SUFFIXES = r"\b(corp|corporation|inc|incorporated|ltd|llc|gmbh|co|the)\b"


def entity_profiles(aliases: DataFrame) -> DataFrame:
    """``(entity_uri, profile)`` — normalized, deduped aliases joined sorted."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("alias")), _LEGAL_SUFFIXES, ""),
            r"\s+",
            " ",
        )
    )
    return (
        aliases.select("entity_uri", norm.alias("_n"))
        .filter(F.col("_n") != "")
        .groupBy("entity_uri")
        .agg(F.concat_ws("|", F.array_sort(F.collect_set("_n"))).alias("profile"))
    )


def entity_similarity_edges(
    aliases: DataFrame,
    shingle_n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Similarity edges ``(src, dst, jaccard)`` between entity URIs."""
    profiles = entity_profiles(aliases)
    sh = char_shingles(profiles, "entity_uri", "profile", shingle_n)
    sig = minhash_signature(sh, k)
    # explicit hot-bucket cap: this is a CLUSTERING consumer (edges feed
    # connected_components), where bucket connectivity — not exhaustive
    # pair listing — is the contract; an uncapped boilerplate-hot band
    # bucket goes B²/2-quadratic (round-3 probe: 13.3M candidates / 2,556
    # true pairs). The listing API's default became None in round 4, so
    # the cap must be passed here.
    cand = lsh_candidate_pairs(sig, bands, k // bands, max_bucket=4096)
    return jaccard_pairs(cand, sh, threshold).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "jaccard"
    )
