"""Deterministic negative sampling for KG-embedding training.

Training a KG embedding (TransE / DistMult / ComplEx family — Bordes et
al., NeurIPS 2013 §3 "corrupted triplets") needs, for every positive
``(s, p, o)``, k negatives with the object replaced by a random entity.
At pipeline scale the sampling must be REPRODUCIBLE (re-runs, resumes and
the DuckDB oracle must see the same negatives), so randomness is an md5
hash of the triple content and the sample index — no RNG state, the same
discipline as ``sample_stratified`` / ``shuffle_shards``.

Scale shape: the entity pool is indexed once with a row_number over its
sorted ids — a single-partition window over the O(entities) pool table,
never the triple corpus — and negatives attach by an equi-join on the
hashed index (entity pool broadcast when small, shuffle-join on the
uniform index otherwise; md5 indices are skew-free by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corrupt_triples(
    triples: DataFrame,
    k: int = 3,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    entities: DataFrame | None = None,
) -> DataFrame:
    """k corrupted negatives per positive triple, object-replacement form.

    ``entities`` is the candidate pool (single ``entity`` column);
    default = the distinct objects of ``triples``. For sample index j,
    the replacement is ``pool[ ('0x'||substr(md5(s|p|o|j),1,8)) %
    n_entities ]`` — uniform, reproducible, engine-portable. Corruptions
    that collide with the true object are DROPPED rather than resampled
    (keeps determinism; a triple can yield < k negatives — the standard
    filtered-uniform scheme, Bordes et al. sample-and-discard).

    Returns ``(subj, pred, neg_obj, sample_idx)``.
    """
    if k < 1:
        # F.sequence(0, k-1) would DESCEND for k <= 0 (Spark defaults to
        # step -1 when start > stop), silently emitting bogus negative
        # sample indices — fail loudly instead
        raise ValueError(f"k must be >= 1, got {k}")
    t = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    )
    pool = (
        entities.select(F.col(entities.columns[0]).alias("entity"))
        if entities is not None
        else t.select(F.col("obj").alias("entity"))
    ).distinct()
    # O(entities) pool table: the global row_number window runs over the
    # pool only, never the triple corpus
    indexed = pool.withColumn(
        "_idx",
        F.row_number().over(Window.orderBy("entity")).cast("long") - 1,
    ).localCheckpoint(eager=False)
    n = indexed.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    fanned = (
        t.crossJoin(F.broadcast(n))
        .select(
            "subj",
            "pred",
            "obj",
            F.explode(
                F.sequence(F.lit(0), F.lit(k - 1))
            ).alias("sample_idx"),
            F.col("_n"),
        )
        .withColumn(
            "_idx",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("subj"),
                            F.col("pred"),
                            F.col("obj"),
                            F.col("sample_idx"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("_n"),
        )
    )
    return (
        fanned.join(indexed, "_idx")
        .filter(F.col("entity") != F.col("obj"))
        .select(
            "subj",
            "pred",
            F.col("entity").alias("neg_obj"),
            F.col("sample_idx").cast("long").alias("sample_idx"),
        )
    )
