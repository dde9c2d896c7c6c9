"""Cleanup filters and scans (reference F1-F3).

All plain column predicates — Catalyst pushes them into the parquet scan
(check ``PushedFilters`` in ``.explain``), so at 100 TB these cost only the
row groups that survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vocab import DCAT_DATASET, DCAT_DATASET_PROP, RDF_TYPE


def remove_lowercase_dataset_typo(triples: DataFrame) -> DataFrame:
    """F1: drop every ``(?, rdf:type, dcat:dataset)`` statement.

    The lowercase ``dcat:dataset`` is the *property*, a common publisher typo
    for the class; the reference deletes these before the subject scan
    (``Flows.kt:102-103``, ``page.page.removeAll(null, RDF.type,
    DCAT.dataset)``). Ordering is load-bearing: this must run before
    :func:`dataset_subjects`.
    """
    return triples.filter(
        ~(
            (F.col("pred") == RDF_TYPE)
            & (F.col("obj_value") == DCAT_DATASET_PROP)
            & (F.col("obj_kind") == "iri")
        )
    )


def dataset_subjects(triples: DataFrame) -> DataFrame:
    """F2: distinct subjects typed ``dcat:Dataset`` — the split keys.

    (reference ``Flows.kt:105``: ``listResourcesWithProperty(RDF.type,
    DCAT.Dataset).toSet()``)
    """
    return (
        triples.filter(
            (F.col("pred") == RDF_TYPE) & (F.col("obj_value") == DCAT_DATASET)
        )
        .select("subj")
        .distinct()
    )


def drop_blank_identifiers(subjects_with_id: DataFrame) -> DataFrame:
    """F3: drop datasets whose derived identifier is null/blank.

    (reference ``Flows.kt:108-109``: warn + skip). The rejected count feeds
    ``lineage_metrics`` at the pipeline level.
    """
    ident = F.col("identifier")
    return subjects_with_id.filter(ident.isNotNull() & (F.trim(ident) != ""))
