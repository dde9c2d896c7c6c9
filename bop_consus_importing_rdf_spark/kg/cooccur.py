"""Entity co-occurrence PMI edges — relatedness enrichment for the KG.

Entities mentioned in the same document relate; pointwise mutual
information (Church & Hanks 1990) scores how much more often a pair
co-occurs than chance: ``pmi(a,b) = ln( N·c_ab / (c_a·c_b) )`` over
document-level co-occurrence counts. Real KG pipelines materialize these
as weighted relatedness edges next to the extracted triples (and prune
by PMI threshold); the reference's catalogue scope has no analog — this
is SURVEY §2.8 extension surface.

Scale shape: per-document entity sets are built by ONE groupBy(doc)
(map-side combinable collect_set), and the pair fan-out is ROW-LOCAL — a
combinations expression over the sorted per-doc array, not a self-join,
so no shuffle carries the quadratic term and the blowup is bounded by
the per-doc entity count (cap wide docs upstream if a corpus has
thousand-entity documents). Pair counts and entity marginals are two
combinable aggregations; the O(entities) marginal table broadcasts back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    entity_col: str = "entity",
    scale: int = 10**6,
) -> DataFrame:
    """PMI-weighted co-occurrence edges over (document, entity) pairs.

    Returns ``(entity_a, entity_b, n_pairs, pmi_q)`` for every unordered
    entity pair co-occurring in ≥1 document (``entity_a < entity_b``),
    where ``pmi_q = floor(scale · ln(N·c_ab / (c_a·c_b)))`` with N = docs
    containing ≥1 entity. The products enter the ``ln`` as doubles (no
    int64 overflow at any N) and both engines evaluate the identical
    expression once per pair — the dsir/tfidf quantization discipline, so
    the DuckDB oracle matches exactly.
    """
    # ents/per_doc are each consumed by two branches, but deliberately NOT
    # checkpointed: the repeated subtrees hash-partition identically, so
    # Spark's ReusedExchange covers the re-reads — measured 21.3s without
    # checkpoints vs 31.4s with them at 1M docs (materializing the wide
    # doc×entity and per-doc-array tables costs more than the reuse saves)
    ents = df.select(
        F.col(id_col).alias("id"), F.col(entity_col).alias("entity")
    ).distinct()
    per_doc = ents.groupBy("id").agg(
        F.sort_array(F.collect_set("entity")).alias("es")
    )
    # row-local unordered pairs: for element i, pair with every later
    # element — `es` is a named attribute, so the nested lambdas reference
    # it without re-evaluating an inline expression (the O(n²) HOF trap)
    pairs = per_doc.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("es"),
                    lambda x, i: F.transform(
                        F.slice(F.col("es"), i + 2, F.size(F.col("es"))),
                        lambda y: F.struct(
                            x.alias("entity_a"), y.alias("entity_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.entity_a", "p.entity_b")
    c_ab = pairs.groupBy("entity_a", "entity_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    # O(entities) marginal table, consumed twice under different aliases —
    # also NOT checkpointed: a checkpoint materializes in its own job,
    # which cannot share the ents exchange with the main query (measured
    # 29.4s with just this one checkpointed vs 21.3s without)
    c_e = ents.groupBy("entity").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    n_docs = per_doc.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return (
        c_ab.join(
            F.broadcast(c_e.select(F.col("entity").alias("entity_a"),
                                   F.col("_c").alias("_ca"))),
            "entity_a",
        )
        .join(
            F.broadcast(c_e.select(F.col("entity").alias("entity_b"),
                                   F.col("_c").alias("_cb"))),
            "entity_b",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "entity_a",
            "entity_b",
            "n_pairs",
            F.floor(
                F.lit(scale)
                * F.log(
                    (F.col("_n").cast("double") * F.col("n_pairs").cast("double"))
                    / (F.col("_ca").cast("double") * F.col("_cb").cast("double"))
                )
            )
            .cast("long")
            .alias("pmi_q"),
        )
    )
