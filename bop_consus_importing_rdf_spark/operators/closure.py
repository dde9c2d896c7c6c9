"""Reachability closure over the triple table (reference J1/J3).

``Resource.extractAsModel()`` (reference ``Flows.kt:114``) computes the
statements reachable from a dataset resource — following object IRIs and
blank nodes. Relationally this is an iterative equi-join to fixpoint:

    frontier := seed subjects
    repeat: frontier := (frontier ⋈ triples on node=subj).obj  \\ visited

Driver-side ``while`` over DataFrames with ``localCheckpoint()`` per
iteration (cuts lineage — the classic failure mode of iterative Spark jobs);
AQE picks broadcast joins automatically once the frontier shrinks below the
broadcast threshold. DCAT graphs are shallow (~3-4 hops) so the loop runs a
handful of iterations regardless of data size; each iteration is one shuffle
on ``node``.

The oracle twin is a recursive CTE (DuckDB) — see ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vocab import KIND_BNODE, KIND_IRI


def reachable_closure(
    triples: DataFrame,
    seeds: DataFrame,
    follow: Sequence[str] = (KIND_IRI, KIND_BNODE),
    scope_cols: Sequence[str] = (),
    max_iters: int = 32,
    prune_to_subjects: bool = False,
) -> DataFrame:
    """All nodes reachable from each seed root.

    ``seeds``: columns ``root, node`` (+ ``scope_cols``); usually
    ``root == node`` = the dataset subject. ``triples``: the statement table
    (+ ``scope_cols``). The closure never leaves a scope partition when
    ``scope_cols`` is set (used by J3 to stay inside one dataset's model).

    Returns ``(root, node, *scope_cols)`` including the seeds themselves.

    ``prune_to_subjects=True`` drops reached nodes that never appear as a
    statement subject (leaf IRIs — class constants, literal-like targets).
    They can't expand the frontier and contribute nothing to a subsequent
    ``subgraph_triples`` join, but in DCAT-shaped data they dominate the
    frontier (every dataset reaches the same class node), so pruning them
    before the distinct/anti-join shuffles roughly halves per-iteration
    bytes. Only the returned NODE SET changes (leaves omitted) — extracted
    statements are identical.
    """
    from functools import reduce

    scope = list(scope_cols)
    subj_nodes = None
    if prune_to_subjects:
        # materialized once — the semi-join probes it every iteration
        subj_nodes = (
            triples.select(F.col("subj").alias("node"))
            .distinct()
            .localCheckpoint()
        )
    first = seeds.select("root", "node", *scope).distinct().localCheckpoint()
    # visited = lazy union of per-iteration checkpointed frontiers — never
    # re-materialized as a whole (the old union+checkpoint per iteration
    # rewrote O(V) rows every round, turning O(E·d) work into O(V·d²))
    pieces = [first]
    frontier = first
    for _ in range(max_iters):
        cond = [frontier["node"] == triples["subj"]]
        cond += [frontier[c] == triples[c] for c in scope]
        step = (
            frontier.join(triples, cond)
            .filter(triples["obj_kind"].isin(*follow))
            .select(
                frontier["root"],
                triples["obj_value"].alias("node"),
                *[frontier[c] for c in scope],
            )
        )
        if subj_nodes is not None:
            step = step.join(subj_nodes, "node", "left_semi")
        step = step.distinct()
        visited = reduce(lambda a, b: a.union(b), pieces)
        frontier = step.join(
            visited, ["root", "node", *scope], "left_anti"
        ).localCheckpoint()
        if frontier.isEmpty():
            break
        pieces.append(frontier)
    return reduce(lambda a, b: a.union(b), pieces)


def subgraph_triples(
    triples: DataFrame,
    closure: DataFrame,
    root_alias: str = "dataset_id",
    scope_cols: Sequence[str] = (),
) -> DataFrame:
    """J1 step 2: tag every statement with the root(s) whose closure owns it.

    A statement shared by two datasets' closures is emitted for both — same
    semantics as the reference extracting an independent model per dataset.
    """
    scope = list(scope_cols)
    cond = [closure["node"] == triples["subj"]]
    cond += [closure[c] == triples[c] for c in scope]
    return triples.join(closure, cond).select(
        closure["root"].alias(root_alias), *[triples[c] for c in triples.columns]
    )
