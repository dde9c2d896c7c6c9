"""Identifier derivation (reference X1).

``Resource.identify(removePrefix, precedenceUriRef)`` — called at reference
``Flows.kt:108``, semantics per ``README.md:65-71`` / ``config.schema.json``:

- default: id = the ``dct:identifier`` literal if present, else the resource
  URI;
- ``precedenceUriRef=true``: flip the priority (URI first);
- ``removePrefix=true``: keep only the URI segment after the last ``/``
  (applied to the URI-derived form).

Expressed as a ``coalesce`` over columns — the caller left-joins the
``dct:identifier`` triples onto the dataset subjects first, so the whole
derivation stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..vocab import DCT_IDENTIFIER

_LAST_SEGMENT = "([^/]+)$"


def identify(
    uri: Column,
    dct_identifier: Column,
    remove_prefix: bool = False,
    precedence_uri_ref: bool = False,
) -> Column:
    """Derive the dataset identifier from its URI + optional dct:identifier.

    A blank-node subject (``_:`` label) has NO URI in RDF — its URI form is
    null, which is exactly how the reference ends up with blank identifiers
    to warn about and drop (F3, ``Flows.kt:108-109``).
    """
    base = F.when(uri.startswith("_:"), None).otherwise(uri)
    uri_form = (
        F.regexp_extract(base, _LAST_SEGMENT, 1) if remove_prefix else base
    )
    if remove_prefix:
        uri_form = F.when(base.isNull(), None).otherwise(uri_form)
    ident = F.when(dct_identifier == "", None).otherwise(dct_identifier)
    if precedence_uri_ref:
        return F.coalesce(uri_form, ident)
    return F.coalesce(ident, uri_form)


def with_identifier(
    subjects: DataFrame,
    triples: DataFrame,
    remove_prefix: bool = False,
    precedence_uri_ref: bool = False,
) -> DataFrame:
    """Attach ``identifier`` to a DataFrame of dataset ``subj`` URIs.

    Left-joins the (small relative to the full triple set) ``dct:identifier``
    statements; with >1 identifier literal per subject the minimum is taken
    so the derivation stays deterministic (Jena's ``getProperty`` returns an
    arbitrary one — we must not be nondeterministic).
    """
    ids = (
        triples.filter(F.col("pred") == DCT_IDENTIFIER)
        .groupBy("subj")
        .agg(F.min("obj_value").alias("_dct_id"))
    )
    out = subjects.join(ids, "subj", "left")
    return out.withColumn(
        "identifier",
        identify(F.col("subj"), F.col("_dct_id"), remove_prefix, precedence_uri_ref),
    ).drop("_dct_id")


def sql_identify(
    uri: str,
    dct_identifier: str,
    remove_prefix: bool = False,
    precedence_uri_ref: bool = False,
) -> str:
    """Portable SQL twin of :func:`identify` (Spark SQL + DuckDB)."""
    base = f"case when substring({uri},1,2)='_:' then null else {uri} end"
    uri_form = (
        f"regexp_extract({base}, '([^/]+)$', 1)" if remove_prefix else base
    )
    ident = f"nullif({dct_identifier}, '')"
    if precedence_uri_ref:
        return f"coalesce({uri_form}, {ident})"
    return f"coalesce({ident}, {uri_form})"
