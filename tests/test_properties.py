"""Property tests (SURVEY.md §5.4): partition invariance, escaping
round-trips under hypothesis-generated inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.operators.split import split_datasets
from bop_consus_importing_rdf_spark.sources.rdf_io import _parse_one, _unescape

from .test_split import fixture_triples  # noqa: F401 (fixture reuse)

KEY = ["dataset_id", "subj", "pred", "obj_value", "obj_kind"]


@pytest.mark.parametrize("k", [1, 7, 32])
def test_split_invariant_under_partitioning(spark, fixture_triples, k):  # noqa: F811
    base_triples, base_ds = split_datasets(fixture_triples)
    re_triples, re_ds = split_datasets(fixture_triples.repartition(k))
    assert (
        base_triples.select(KEY).exceptAll(re_triples.select(KEY)).count() == 0
    )
    assert (
        re_triples.select(KEY).exceptAll(base_triples.select(KEY)).count() == 0
    )
    assert sorted(r.identifier for r in base_ds.collect()) == sorted(
        r.identifier for r in re_ds.collect()
    )


# pure-Python round-trip of the renderer's escaping against the parser's
# unescaping — mirrors functions/ntriples.py `_ESCAPES` exactly
def _escape(s: str) -> str:
    for raw, esc in [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")]:
        s = s.replace(raw, esc)
    return s


@given(st.text(max_size=200))
@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow], deadline=None)
def test_escape_unescape_roundtrip(s):
    assert _unescape(_escape(s)) == s


@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=100
    )
)
@settings(max_examples=200, deadline=None)
def test_nt_line_parses_back(s):
    line = f'<urn:s> <urn:p> "{_escape(s)}" .'
    subj, pred, obj, kind, lang, dt = _parse_one(line)
    assert (subj, pred, kind) == ("urn:s", "urn:p", "literal")
    assert obj == s
