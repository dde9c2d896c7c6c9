"""Hydra paging extraction from the triple table (reference A1 input side).

The reference delegates to ``HydraPaging.findPaging(page, brokenHydra ?
address : null)`` (piveau-utils, consumed at ``Flows.kt:83-86``): locate the
``hydra:PagedCollection`` resource in the page model, read
``hydra:totalItems`` and the ``hydra:nextPage`` link; with ``brokenHydra``
the next-page URL is rebuilt from the *requested* address because some
portals emit hydra links with a wrong scheme/host/path — only the query
string of the advertised link can be trusted (``README.md:90-92``).

Here both reads are pure column expressions over the statement table scoped
per source document — no model object, no driver loop; a billion pages
resolve their paging in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vocab import (
    HYDRA_NEXT_PAGE,
    HYDRA_PAGED_COLLECTION,
    HYDRA_TOTAL_ITEMS,
    RDF_TYPE,
)


def _paged_collections(triples: DataFrame, doc_col: str) -> DataFrame:
    return (
        triples.filter(
            (F.col("pred") == RDF_TYPE)
            & (F.col("obj_value") == HYDRA_PAGED_COLLECTION)
        )
        .select(doc_col, "subj")
        .distinct()
    )


def hydra_totals(triples: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """``(doc_col, hydra_total)`` — ``hydra:totalItems`` of each document's
    paged-collection resource; documents without one emit no row (callers
    left-join and fall back, mirroring ``HydraPaging.total`` returning 0).

    ``min`` aggregation = deterministic pick should a malformed page carry
    several collections/values (Jena's ``listStatements().next`` order is
    arbitrary; a deterministic reading is the only reproducible one).
    """
    pc = _paged_collections(triples, doc_col)
    # try_cast: NULL for a malformed count instead of an ANSI error — and
    # the optimizer may evaluate the projection against pre-filter rows
    # (non-numeric obj_values of other predicates) when it reorders
    ti = triples.filter(F.col("pred") == HYDRA_TOTAL_ITEMS).select(
        doc_col, "subj", F.col("obj_value").try_cast("long").alias("_total")
    )
    return (
        pc.join(ti, [doc_col, "subj"])
        .groupBy(doc_col)
        .agg(F.min("_total").alias("hydra_total"))
    )


def hydra_next_pages(
    triples: DataFrame,
    addresses: DataFrame,
    broken_hydra: bool = False,
    doc_col: str = "doc_id",
) -> DataFrame:
    """``(doc_col, next_page)`` — the follow-up URL for each paged document.

    ``addresses``: ``(doc_col, address)``, the URL each page was actually
    fetched from. With ``broken_hydra`` the advertised link's scheme/host/
    path are discarded and its query string is grafted onto the real
    address (the piveau broken-hydra workaround).
    """
    pc = _paged_collections(triples, doc_col)
    np = triples.filter(F.col("pred") == HYDRA_NEXT_PAGE).select(
        doc_col, "subj", F.col("obj_value").alias("_next_raw")
    )
    linked = (
        pc.join(np, [doc_col, "subj"])
        .groupBy(doc_col)
        .agg(F.min("_next_raw").alias("_next_raw"))
        .join(F.broadcast(addresses), doc_col, "left")
    )
    if broken_hydra:
        next_page = F.concat(
            F.regexp_replace(F.col("address"), r"\?.*$", ""),
            F.regexp_extract(F.col("_next_raw"), r"(\?.*)$", 1),
        )
    else:
        next_page = F.col("_next_raw")
    return linked.select(doc_col, next_page.alias("next_page"))
