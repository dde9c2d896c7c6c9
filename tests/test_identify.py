"""X1: identifier derivation — all 4 (removePrefix, precedenceUriRef) combos.

Reference semantics per ``README.md:65-71`` / call site ``Flows.kt:108``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.functions.identify import (
    identify,
    with_identifier,
)
from bop_consus_importing_rdf_spark.vocab import DCT_IDENTIFIER

from .conftest import triples_df

URI = "http://example.org/cat/ds-42"


@pytest.mark.parametrize(
    "remove_prefix,precedence,dct_id,expected",
    [
        (False, False, "the-id", "the-id"),       # dct:identifier wins
        (False, False, None, URI),                # fallback: full URI
        (True, False, None, "ds-42"),             # fallback: last segment
        (False, True, "the-id", URI),             # URI precedence
        (True, True, "the-id", "ds-42"),          # URI precedence + strip
        (False, False, "", URI),                  # blank literal → fallback
    ],
)
def test_identify_matrix(spark, remove_prefix, precedence, dct_id, expected):
    df = spark.createDataFrame([(URI, dct_id)], "uri string, dct_id string")
    got = df.select(
        identify(F.col("uri"), F.col("dct_id"), remove_prefix, precedence).alias("i")
    ).collect()[0].i
    assert got == expected


def test_with_identifier_joins_and_is_deterministic(spark):
    triples = triples_df(
        spark,
        [
            (URI, DCT_IDENTIFIER, "zzz", "literal"),
            (URI, DCT_IDENTIFIER, "aaa", "literal"),  # two ids → min wins
            ("http://example.org/no-id", "urn:p", "x", "literal"),
        ],
    )
    subjects = spark.createDataFrame(
        [(URI,), ("http://example.org/no-id",)], "subj string"
    )
    out = {r.subj: r.identifier for r in with_identifier(subjects, triples).collect()}
    assert out[URI] == "aaa"
    assert out["http://example.org/no-id"] == "http://example.org/no-id"
