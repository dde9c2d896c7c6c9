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


# ---------------------------------------------------------------------------
# Turtle statement re-assembly (round 4): hypothesis over grouped documents
# ---------------------------------------------------------------------------

def _ttl_escape_short(s: str) -> str:
    for raw, esc in [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")]:
        s = s.replace(raw, esc)
    return s


def _ttl_escape_long(s: str) -> str:
    # long-string form: backslash and double quote escaped, newlines raw
    return s.replace("\\", "\\\\").replace('"', '\\"')


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=200, deadline=None)
def test_split_statements_roundtrip_property(lits):
    """A grouped multi-line document (`;` predicate list + `,` object list
    + triple-quoted strings for newline-carrying literals) re-assembles
    into statements that parse back to the original literal values."""
    from bop_consus_importing_rdf_spark.sources.turtle_io import (
        _parse_one_ttl,
        _split_statements,
    )

    objs = []
    for s in lits:
        if "\n" in s or "\r" in s:
            objs.append(f'"""{_ttl_escape_long(s)}"""')
        else:
            objs.append(f'"{_ttl_escape_short(s)}"')
    doc = (
        "<urn:s> <urn:p:list> "
        + " ,\n    ".join(objs)
        + " ;\n  <urn:p:last> <urn:o> .\n"
    )
    stmts = _split_statements(doc)
    parsed = [_parse_one_ttl(x, {}) for x in stmts]
    assert all(p[3] is not None for p in parsed), (stmts, parsed)
    got_lits = [p[2] for p in parsed if p[1] == "urn:p:list"]
    assert got_lits == lits
    assert parsed[-1][:3] == ("urn:s", "urn:p:last", "urn:o")


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=200, deadline=None)
def test_split_statements_bnode_collection_property(lits):
    """Adversarial literals (brackets, parens, dots, quotes, newlines)
    INSIDE a bnode property list and a collection: re-assembly emits a
    well-formed statement set whose structure walks back to the original
    values — the tokenizer must never let literal content drive bracket
    depth or statement splitting."""
    from bop_consus_importing_rdf_spark.sources.turtle_io import (
        _parse_one_ttl,
        _split_statements,
    )

    def lit(s: str) -> str:
        if "\n" in s or "\r" in s:
            return f'"""{_ttl_escape_long(s)}"""'
        return f'"{_ttl_escape_short(s)}"'

    head, rest = lits[0], lits[1:]
    doc = (
        "<urn:s> <urn:p:dist> [ <urn:p:inner> " + lit(head)
        + " ; <urn:p:more> ( " + " ".join(lit(s) for s in rest) + " ) ] .\n"
    )
    parsed = [_parse_one_ttl(x, {}) for x in _split_statements(doc)]
    assert all(p[3] is not None for p in parsed), parsed
    by_sp = {(p[0], p[1]): p[2] for p in parsed}
    bnode = by_sp[("urn:s", "urn:p:dist")]
    assert bnode.startswith("_:tgen-")
    assert by_sp[(bnode, "urn:p:inner")] == head
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    # walk the first/rest chain; empty collection is rdf:nil directly
    node, got = by_sp[(bnode, "urn:p:more")], []
    while node != rdf + "nil":
        got.append(by_sp[(node, rdf + "first")])
        node = by_sp[(node, rdf + "rest")]
    assert got == rest
