"""Counter, duplicate detection and manifest aggregation (reference A1-A3, J4, S8).

Semantic traps preserved from the reference (SURVEY.md §7):
- duplicates are WARNED about but KEPT (``ImportingRdfVerticle.kt:85-88``);
- the counter is 1-based emission order (``:88-89``) — the reference's order
  is Jena set-iteration order (nondeterministic!), ours is an explicit
  deterministic sort, which is the only reproducible reading;
- ``total`` prefers the hydra page count over the actual emitted count
  (``Flows.kt:106``).

Scale note: ``row_number`` over the per-catalogue window sorts within one
partition per catalogue. That is fine — the counter ranges over *datasets*
(≤ millions per catalogue), not triples; skew across catalogues is handled
by the catalogues being independent window partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_counter(
    datasets: DataFrame,
    catalogue_col: str = "catalogue",
    order_cols: tuple[str, ...] = ("identifier", "subj"),
) -> DataFrame:
    """A2: 1-based deterministic emission counter per catalogue."""
    w = Window.partitionBy(catalogue_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return datasets.withColumn("counter", F.row_number().over(w).cast("long"))


def duplicate_warnings(
    datasets: DataFrame, catalogue_col: str = "catalogue"
) -> DataFrame:
    """J4: identifiers emitted more than once — warn-only, nothing dropped.

    Returns ``(catalogue, identifier, n_occurrences)`` for n > 1. The
    reference does an O(n²) ``List.contains`` scan per element; a hash
    aggregation is O(n) with identical semantics.
    """
    return (
        datasets.groupBy(catalogue_col, "identifier")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )


def resolve_total(
    datasets: DataFrame,
    doc_totals: DataFrame,
    doc_col: str = "doc_id",
    actual_counts: DataFrame | None = None,
) -> DataFrame:
    """A1: per-page ``total`` = hydra ``totalItems`` if > 0 else the page's
    actual dataset count (``Flows.kt:106``).

    ``doc_totals``: ``(doc_id, hydra_total)``. ``datasets`` must carry
    ``doc_col``. ``actual_counts`` (``doc_col, _actual_total``) overrides the
    fallback count — the reference takes ``datasets.size`` at Flows.kt:105
    BEFORE identifier/blank/empty filtering, so callers should pass the
    pre-filter dataset-subject count per page; without it the count of the
    rows in ``datasets`` is used.
    """
    actual = actual_counts
    if actual is None:
        actual = datasets.groupBy(doc_col).agg(
            F.count(F.lit(1)).alias("_actual_total")
        )
    return (
        datasets.join(F.broadcast(doc_totals), doc_col, "left")
        .join(F.broadcast(actual), doc_col, "left")
        .withColumn(
            "total",
            F.when(
                F.col("hydra_total").isNotNull() & (F.col("hydra_total") > 0),
                F.col("hydra_total").cast("long"),
            ).otherwise(F.col("_actual_total")),
        )
        .drop("hydra_total", "_actual_total")
    )


def manifest(datasets: DataFrame, catalogue_col: str = "catalogue") -> DataFrame:
    """A3/S8: the trailing identifier-list record, one per catalogue.

    Duplicates preserved (J4), order = the counter. ``array_sort`` over
    ``(counter, identifier)`` structs gives a deterministic list without
    relying on ``collect_list`` ordering (which Spark does not guarantee).
    """
    return (
        datasets.groupBy(catalogue_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("counter", "identifier"))
                ),
                lambda s: s["identifier"],
            ).alias("identifiers")
        )
    )
