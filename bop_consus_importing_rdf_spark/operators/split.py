"""The dataset split pipeline (reference ``datasetsFlow``, ``Flows.kt:95-136``).

Stage order is load-bearing and mirrors the reference exactly (SURVEY.md §7):
F1 typo cleanup → F2 subject scan → X1 identify → F3 blank filter →
J1 subgraph closure → J3 nested-catalogue subtraction → F4 empty filter.

Where the reference loops dataset-at-a-time over an in-memory Jena model,
this runs set-at-a-time: ONE closure computation for all datasets at once
(the frontier join parallelizes over every dataset simultaneously), then one
scoped closure for all nested catalogues. No per-dataset Python loop exists
anywhere — the dataset count can be billions.

At 100 TB, feed this a triple table persisted BUCKETED BY ``subj``
(``sources/bucketed.py``): every stage here is a pure filter/project over
the input until the subgraph probe join, so the bucket partitioning
survives, and once the closure side is past the broadcast threshold the
probe join plans with no exchange on the (big) triple side — asserted by
``test_bucketed.py::test_split_probe_side_exchange_free_over_bucketed``.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.identify import identify
from ..vocab import DCAT_CATALOG, DCAT_DATASET, DCT_IDENTIFIER, RDF_TYPE
from .cleanup import (
    drop_blank_identifiers,
    remove_lowercase_dataset_typo,
)
from .closure import reachable_closure, subgraph_triples


def split_datasets(
    triples: DataFrame,
    remove_prefix: bool = False,
    precedence_uri_ref: bool = False,
    input_materialized: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Split a triple table into per-dataset subgraphs.

    Returns ``(dataset_triples, datasets)``:

    - ``dataset_triples``: the input statement columns + ``dataset_id`` (the
      owning dataset subject URI), after nested-catalogue subtraction;
    - ``datasets``: ``(subj, identifier)`` — one row per non-blank-id,
      non-empty dataset (F3 + F4 applied).

    ``input_materialized=True`` declares that ``triples`` is already a
    durable materialization — the bucketed-by-``subj`` table the
    production harvest lands (``harvest.py``), or any parquet scan — so
    the defensive input persist is skipped: every consumer re-reads the
    (column-pruned, predicate-pushed) scan instead of filling an
    executor-memory copy first, and a bucketed scan keeps its
    exchange-free subj distribution all the way into the subgraph probe
    join. This is the 100-TB calling convention; the persist branch exists
    for ad-hoc in-memory inputs.
    """
    if input_materialized:
        t = remove_lowercase_dataset_typo(triples)
    else:
        # F1 first (before the scan). Persist WITHOUT repartitioning: the
        # closure loop probes its own slim edge cache (closure.py), so
        # nothing left here exploits a subj hash partitioning — the
        # subgraph SMJ exchanges t exactly once either way, and a
        # pre-emptive repartition(subj) measured as a pure ~10s loss at
        # sf0.1 (MEMORY_AND_DISK: spills instead of OOM at scale)
        t = remove_lowercase_dataset_typo(triples).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    # F2 + X1 FUSED into one scan (round-6): dataset membership and the
    # min dct:identifier are both per-subj aggregates of the same table,
    # so one filtered groupBy replaces the previous two scans + left join
    # (dataset_subjects().distinct ⋈ with_identifier's groupBy) — same
    # rows, one less pass over the statement table and no join. Over a
    # bucketed-by-subj input the aggregation is exchange-free.
    is_ds_stmt = (F.col("pred") == RDF_TYPE) & (
        F.col("obj_value") == DCAT_DATASET
    )
    is_id_stmt = F.col("pred") == DCT_IDENTIFIER
    subjects_with_id = (
        t.filter(is_ds_stmt | is_id_stmt)
        .groupBy("subj")
        .agg(
            F.max(is_ds_stmt).alias("_is_ds"),
            F.min(F.when(is_id_stmt, F.col("obj_value"))).alias("_dct_id"),
        )
        .filter(F.col("_is_ds"))
        .select(
            "subj",
            identify(
                F.col("subj"), F.col("_dct_id"), remove_prefix,
                precedence_uri_ref,
            ).alias("identifier"),
        )
    )
    # checkpointed: feeds both the closure seeds and the final F4 semi-join
    named = drop_blank_identifiers(subjects_with_id).localCheckpoint()  # F3

    # J1 + J3 closures FUSED into one loop. The reference computes the
    # catalogue subgraph WITHIN each dataset's extracted model
    # (Flows.kt:117-121). A dataset's node set is forward-closed (its model
    # holds every statement whose subject is reachable), so the within-model
    # closure of a catalogue node equals its GLOBAL closure — which lets the
    # catalogue roots ride the SAME iterative loop as the dataset roots
    # (one fixpoint instead of two: half the checkpoint/isEmpty actions).
    # Catalogue roots are known globally up front (subjects typed
    # dcat:Catalog); closures of catalogue nodes that never occur inside a
    # dataset are tiny wasted work, joined away below.
    ds_seeds = named.select(F.col("subj").alias("root"), F.col("subj").alias("node"))
    cat_roots = (
        t.filter((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == DCAT_CATALOG))
        .select(F.col("subj").alias("root"), F.col("subj").alias("node"))
        .distinct()
        # checkpointed eagerly: three consumers (closure seeds, the
        # ds/cat closure split below, cat_in_ds) would otherwise each
        # re-run the scan + distinct; the set is catalogue-roots-sized
        .localCheckpoint()
    )
    closure = reachable_closure(
        t, ds_seeds.union(cat_roots), prune_to_subjects=True
    )

    # Split the closure's roots back into dataset vs catalogue closures
    # with an ANTI join against the (small) catalogue-root set instead of
    # round-5's left-semi against the dataset-count-sized `named` table —
    # a broadcast-sized build side instead of a 150k-row one. Equivalence
    # incl. the mistyped-dataset corner: a dataset root D that is ALSO
    # typed dcat:Catalog previously generated its full ds_triples and then
    # removal (cat_root = D ∈ closure(D)) subtracted every one of them,
    # emptying D before F4; the anti join drops D's closure up front, so D
    # contributes no ds_triples at all — `final` is identical (oracle hash
    # unchanged), minus the generate-then-subtract work.
    ds_closure = closure.join(
        cat_roots.select("root"), "root", "left_anti"
    )
    # NO repartition before the checkpoint: localCheckpoint drops
    # outputPartitioning (Scan ExistingRDD — verified empirically), so a
    # pre-checkpoint repartition(dataset_id) is a pure wasted wide shuffle.
    # Downstream groupBy(dataset_id) consumers shuffle off the checkpoint,
    # but F4's distinct and the triple counts reduce map-side first — their
    # exchanges carry ~one row per dataset, not the statement table.
    ds_triples = subgraph_triples(t, ds_closure, root_alias="dataset_id")

    # J3: nested-catalogue subtraction — faithful to the reference, which
    # iterates ALL catalogue-typed resources of the extracted model
    # (Flows.kt:117-121) INCLUDING the dataset root itself when it is
    # (mis)typed dcat:Catalog: such a dataset's model empties and F4 drops it.
    #
    # Round-5: the catalogue roots inside each dataset are detected on the
    # CLOSURE NODE SET, not the extracted statement table — a statement
    # (s, rdf:type, dcat:Catalog) lands in dataset D's model iff s is in
    # D's closure and the statement exists in t, so
    # {(D, s) : s ∈ closure(D)} ⋈ cat_roots is set-identical to filtering
    # ds_triples (proven equal by the unchanged oracle hash). That makes
    # ds_triples SINGLE-consumer, dropping its full persist — previously
    # the biggest intermediate materialized twice (persist + the final
    # checkpoint below).
    cat_in_ds = ds_closure.join(
        cat_roots.select(F.col("root").alias("cat_root")),
        ds_closure["node"] == F.col("cat_root"),
    ).select(F.col("root").alias("dataset_id"), "cat_root")
    removal = (
        cat_in_ds.join(closure, cat_in_ds["cat_root"] == closure["root"])
        .select("dataset_id", F.col("node").alias("subj"))
        .distinct()
    )
    # the finished per-dataset statement table is consumed by several
    # downstream views (F4, counts, canonical hash, renders) — checkpoint it
    # ONCE so every consumer reads materialized blocks instead of re-running
    # the subtraction (at cluster scale this materialization is the bucketed
    # parquet write the resume layer performs anyway)
    final = ds_triples.join(
        removal, ["dataset_id", "subj"], "left_anti"
    ).localCheckpoint()
    t.unpersist()

    # F4: drop datasets whose model ended up empty. The non-empty set is
    # spelled as the KEYS OF THE TRIPLE-COUNT AGGREGATION, not a bare
    # distinct — callers that also need per-dataset counts (the split
    # consumer queries do) build the byte-identical groupBy/count, and the
    # physical planner then REUSES one exchange for both (the round-5
    # spelling's distinct vs count aggregates canonicalized differently,
    # so the checkpointed statement table was scanned twice per consumer
    # plan). Key set is identical either way.
    non_empty = split_triple_counts(final).select(
        F.col("dataset_id").alias("subj")
    )
    datasets = named.join(non_empty, "subj", "left_semi").select(
        "subj", "identifier"
    )
    return final, datasets


def split_triple_counts(ds_triples: DataFrame) -> DataFrame:
    """Per-dataset statement counts ``(dataset_id, n_triples)``.

    The canonical spelling shared by :func:`split_datasets`'s F4 filter and
    the consumer queries — byte-identical expression trees are what lets
    the planner collapse the two aggregations onto one exchange."""
    return ds_triples.groupBy("dataset_id").agg(
        F.count(F.lit(1)).alias("n_triples")
    )
