"""The dataset split pipeline (reference ``datasetsFlow``, ``Flows.kt:95-136``).

Stage order is load-bearing and mirrors the reference exactly (SURVEY.md §7):
F1 typo cleanup → F2 subject scan → X1 identify → F3 blank filter →
J1 subgraph closure → J3 nested-catalogue subtraction → F4 empty filter.

Where the reference loops dataset-at-a-time over an in-memory Jena model,
this runs set-at-a-time: ONE closure computation for all datasets at once
(the frontier join parallelizes over every dataset simultaneously), then one
scoped closure for all nested catalogues. No per-dataset Python loop exists
anywhere — the dataset count can be billions.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.identify import with_identifier
from ..vocab import DCAT_CATALOG, RDF_TYPE
from .cleanup import (
    dataset_subjects,
    drop_blank_identifiers,
    remove_lowercase_dataset_typo,
)
from .closure import reachable_closure, subgraph_triples


def split_datasets(
    triples: DataFrame,
    remove_prefix: bool = False,
    precedence_uri_ref: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Split a triple table into per-dataset subgraphs.

    Returns ``(dataset_triples, datasets)``:

    - ``dataset_triples``: the input statement columns + ``dataset_id`` (the
      owning dataset subject URI), after nested-catalogue subtraction;
    - ``datasets``: ``(subj, identifier)`` — one row per non-blank-id,
      non-empty dataset (F3 + F4 applied).
    """
    # F1 first (before the scan). Persist hash-partitioned on subj: the
    # closure loop probes this side once per iteration, and a persisted
    # partitioning on the join key means only the (small) frontier side
    # shuffles each round (MEMORY_AND_DISK: spills instead of OOM at scale)
    t = (
        remove_lowercase_dataset_typo(triples)
        .repartition(F.col("subj"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    subjects = dataset_subjects(t)  # F2
    # checkpointed: feeds both the closure seeds and the final F4 semi-join
    named = drop_blank_identifiers(  # X1 + F3
        with_identifier(subjects, t, remove_prefix, precedence_uri_ref)
    ).localCheckpoint()

    # J1: one closure for every dataset at once
    seeds = named.select(F.col("subj").alias("root"), F.col("subj").alias("node"))
    closure = reachable_closure(t, seeds)
    ds_triples = (
        subgraph_triples(t, closure, root_alias="dataset_id")
        .repartition(F.col("dataset_id"), F.col("subj"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # J3: nested-catalogue subtraction. The dataset resource itself is never
    # subtracted even if (mis)typed dcat:Catalog — the reference iterates
    # catalogue resources of the *extracted* model and removing the root
    # would void the dataset.
    #
    # The reference computes the catalogue subgraph WITHIN each dataset's
    # model (Flows.kt:117-121). A dataset's node set is forward-closed
    # (its model holds every statement whose subject is reachable), so the
    # within-model closure of a catalogue node equals its GLOBAL closure —
    # one tiny-seeded closure over t replaces a scoped closure over the
    # (×Datasets larger) tagged triple set.
    cat_in_ds = (
        ds_triples.filter(
            (F.col("pred") == RDF_TYPE)
            & (F.col("obj_value") == DCAT_CATALOG)
            & (F.col("subj") != F.col("dataset_id"))
        )
        .select("dataset_id", F.col("subj").alias("cat_root"))
        .distinct()
    )
    if not cat_in_ds.isEmpty():
        cat_seeds = cat_in_ds.select(
            F.col("cat_root").alias("root"), F.col("cat_root").alias("node")
        ).distinct()
        cat_closure = reachable_closure(t, cat_seeds)
        removal = (
            cat_in_ds.join(
                cat_closure, cat_in_ds["cat_root"] == cat_closure["root"]
            )
            .select("dataset_id", F.col("node").alias("subj"))
            .distinct()
        )
        ds_triples = ds_triples.join(
            removal, ["dataset_id", "subj"], "left_anti"
        )

    # F4: drop datasets whose model ended up empty
    non_empty = ds_triples.select(
        F.col("dataset_id").alias("subj")
    ).distinct()
    datasets = named.join(non_empty, "subj", "left_semi").select(
        "subj", "identifier"
    )
    return ds_triples, datasets
