"""F1-F5, J1-J3: the dataset split pipeline on the FIXTURES.md §2 graph.

Covers every cited reference behavior: lowercase-typo cleanup before the
scan, bnode-chain closure, nested-catalogue subtraction, blank-id drop,
duplicate ids kept, empty-model drop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.operators.cleanup import (
    dataset_subjects,
    remove_lowercase_dataset_typo,
)
from bop_consus_importing_rdf_spark.operators.closure import reachable_closure
from bop_consus_importing_rdf_spark.operators.split import split_datasets
from bop_consus_importing_rdf_spark.vocab import (
    DCAT_CATALOG,
    DCAT_DATASET,
    DCAT_DATASET_PROP,
    DCT_IDENTIFIER,
    RDF_TYPE,
)

from .conftest import triples_df

EX = "http://example.org/"


@pytest.fixture(scope="module")
def fixture_triples(spark):
    rows = [
        # ds1: plain dataset, bnode chain 2 hops deep (J1)
        (EX + "ds1", RDF_TYPE, DCAT_DATASET, "iri"),
        (EX + "ds1", DCT_IDENTIFIER, "id-1", "literal"),
        (EX + "ds1", EX + "contact", "_:b1", "bnode"),
        ("_:b1", EX + "name", "Alice", "literal"),
        ("_:b1", EX + "addr", "_:b2", "bnode"),
        ("_:b2", EX + "city", "Berlin", "literal"),
        # lowercase typo row (F1) — must vanish before the scan
        (EX + "ds1", RDF_TYPE, DCAT_DATASET_PROP, "iri"),
        # ds2: no dct:identifier → URI fallback; contains a nested catalog (J3)
        (EX + "ds2", RDF_TYPE, DCAT_DATASET, "iri"),
        (EX + "ds2", EX + "inCatalog", EX + "cat1", "iri"),
        (EX + "cat1", RDF_TYPE, DCAT_CATALOG, "iri"),
        (EX + "cat1", EX + "title", "The Catalog", "literal"),
        (EX + "cat1", EX + "publisher", "_:b3", "bnode"),
        ("_:b3", EX + "name", "Gov", "literal"),
        # ds3: blank identifier → dropped (F3)
        (EX + "ds3", RDF_TYPE, DCAT_DATASET, "iri"),
        (EX + "ds3", DCT_IDENTIFIER, "  ", "literal"),
        # ds4 + ds5: duplicate identifier, both kept (J4)
        (EX + "ds4", RDF_TYPE, DCAT_DATASET, "iri"),
        (EX + "ds4", DCT_IDENTIFIER, "dup", "literal"),
        (EX + "ds4", EX + "title", "four", "literal"),
        (EX + "ds5", RDF_TYPE, DCAT_DATASET, "iri"),
        (EX + "ds5", DCT_IDENTIFIER, "dup", "literal"),
        (EX + "ds5", EX + "title", "five", "literal"),
    ]
    return triples_df(spark, rows)


def test_f1_removes_typo_only(spark, fixture_triples):
    cleaned = remove_lowercase_dataset_typo(fixture_triples)
    assert cleaned.count() == fixture_triples.count() - 1
    assert (
        cleaned.filter(F.col("obj_value") == DCAT_DATASET_PROP).count() == 0
    )


def test_f2_subject_scan(spark, fixture_triples):
    subs = {
        r.subj
        for r in dataset_subjects(
            remove_lowercase_dataset_typo(fixture_triples)
        ).collect()
    }
    assert subs == {EX + "ds1", EX + "ds2", EX + "ds3", EX + "ds4", EX + "ds5"}


def test_j1_closure_follows_bnode_chain(spark, fixture_triples):
    seeds = spark.createDataFrame(
        [(EX + "ds1", EX + "ds1")], "root string, node string"
    )
    nodes = {
        r.node for r in reachable_closure(fixture_triples, seeds).collect()
    }
    # ds1 itself, _:b1, _:b2, plus IRI objects of ds1's statements
    assert {"_:b1", "_:b2", EX + "ds1"} <= nodes
    assert EX + "cat1" not in nodes  # unreachable from ds1


def test_split_end_to_end(spark, fixture_triples):
    ds_triples, datasets = split_datasets(fixture_triples)
    ids = sorted(r.identifier for r in datasets.collect())
    # ds3 dropped (blank id); dup kept twice
    assert ids == sorted(["dup", "dup", "id-1", EX + "ds2"])

    by_ds = {
        r.dataset_id: r.cnt
        for r in ds_triples.groupBy("dataset_id").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    # ds1: 3 own stmts (typo removed) + 3 bnode-chain stmts = 6
    assert by_ds[EX + "ds1"] == 6
    # ds2: catalogue subgraph subtracted → only its 2 own statements
    assert by_ds[EX + "ds2"] == 2
    cat_stmts = ds_triples.filter(
        (F.col("dataset_id") == EX + "ds2")
        & (F.col("subj").isin(EX + "cat1", "_:b3"))
    )
    assert cat_stmts.count() == 0


def test_remove_prefix_variant(spark, fixture_triples):
    _, datasets = split_datasets(fixture_triples, remove_prefix=True,
                                 precedence_uri_ref=True)
    ids = sorted(r.identifier for r in datasets.collect())
    # ds3 reappears: URI precedence bypasses its blank dct:identifier
    assert ids == ["ds1", "ds2", "ds3", "ds4", "ds5"]


def test_scoped_closure_never_leaks_across_scopes(spark):
    """Same node names in two scopes: the closure stays inside each scope
    partition (exercises the scope_cols path through the unrolled prefix
    and the hop joins)."""
    from bop_consus_importing_rdf_spark.operators.closure import (
        reachable_closure,
    )

    rows = [
        ("g1", "a", "p", "b", "iri", None, None),
        ("g1", "b", "p", "c", "iri", None, None),
        ("g2", "a", "p", "z", "iri", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_lang string, obj_datatype string",
    )
    seeds = spark.createDataFrame(
        [("a", "a", "g1"), ("a", "a", "g2")],
        "root string, node string, doc_id string",
    )
    out = reachable_closure(t, seeds, scope_cols=("doc_id",))
    got = sorted((r.doc_id, r.root, r.node) for r in out.collect())
    assert got == [
        ("g1", "a", "a"), ("g1", "a", "b"), ("g1", "a", "c"),
        ("g2", "a", "a"), ("g2", "a", "z"),
    ]


def test_dense_cyclic_graph_fanout_gate(spark):
    """High average fan-out (untrusted cyclic RDF) disables the path-
    enumerating unrolled prefix; the anti-join loop still reaches the exact
    fixpoint. Both configurations must agree (ADVICE r2)."""
    # K8-ish digraph: every node points at every other → out-degree 7
    nodes = [f"n{i}" for i in range(8)]
    rows = [
        (a, "p", b, "iri", None, None) for a in nodes for b in nodes if a != b
    ]
    t = triples_df(spark, rows)
    seeds = spark.createDataFrame(
        [("n0", "n0")], "root string, node string"
    )
    gated = reachable_closure(t, seeds)
    forced = reachable_closure(t, seeds, unroll_fanout_max=None, unroll=2)
    want = {("n0", n) for n in nodes}
    assert {(r.root, r.node) for r in gated.collect()} == want
    assert {(r.root, r.node) for r in forced.collect()} == want


def test_prune_to_subjects_same_statements_and_column_order(spark):
    """Round-6 regression: the prune semi-join (a USING join) moves the
    join key first, and the unrolled prefix unions parts positionally —
    without an explicit re-select the pruned parts contributed
    (node, root) swapped. Pruned closure must equal unpruned ∩ subjects
    and extract the identical statement set."""
    from pyspark.sql import functions as F

    from bop_consus_importing_rdf_spark.operators.closure import (
        reachable_closure,
        subgraph_triples,
    )

    rows = [
        ("urn:d1", "urn:p:type", "urn:Dataset", "iri"),
        ("urn:d1", "urn:p:link", "urn:mid", "iri"),
        ("urn:mid", "urn:p:link", "urn:leaf", "iri"),
        ("urn:mid", "urn:p:name", "m", "literal"),
    ]
    t = triples_df(spark, rows)
    seeds = spark.createDataFrame(
        [("urn:d1", "urn:d1")], "root string, node string"
    )
    full = reachable_closure(t, seeds)
    pruned = reachable_closure(t, seeds, prune_to_subjects=True)
    assert pruned.columns == ["root", "node"]
    got = {tuple(r) for r in pruned.collect()}
    # urn:leaf is reached but never a statement subject -> pruned
    assert got == {("urn:d1", "urn:d1"), ("urn:d1", "urn:mid")}
    a = sorted(map(tuple, subgraph_triples(t, full).collect()))
    b = sorted(map(tuple, subgraph_triples(t, pruned).collect()))
    assert a == b
