"""RDF/XML render + parse: golden doc, subset guards, round-trip."""

from __future__ import annotations

import pytest

from bop_consus_importing_rdf_spark.functions.rdfxml import (
    _parse_doc,
    parse_rdfxml,
    render_rdfxml_docs,
)

# hand-written catalogue page in the style a DCAT harvester meets: typed
# node element, rdf:Description, nested anonymous node, inherited xml:lang
GOLDEN = """<?xml version="1.0" encoding="utf-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:dcat="http://www.w3.org/ns/dcat#"
         xmlns:dct="http://purl.org/dc/terms/" xml:lang="de">
  <dcat:Dataset rdf:about="urn:ds:1">
    <dct:identifier rdf:datatype="http://www.w3.org/2001/XMLSchema#string">id-1</dct:identifier>
    <dct:title>Titel &amp; mehr</dct:title>
    <dct:title xml:lang="en">Title</dct:title>
    <dct:publisher>
      <rdf:Description>
        <dct:name xml:lang="">Acme</dct:name>
      </rdf:Description>
    </dct:publisher>
    <dcat:distribution rdf:resource="urn:dist:1"/>
    <dct:relation rdf:nodeID="b7"/>
  </dcat:Dataset>
</rdf:RDF>"""


def test_parse_golden():
    rows = set(_parse_doc(GOLDEN))
    dct = "http://purl.org/dc/terms/"
    assert (
        "urn:ds:1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://www.w3.org/ns/dcat#Dataset", "iri", None, None,
    ) in rows
    # typed literal: datatype suppresses the inherited language
    assert (
        "urn:ds:1", dct + "identifier", "id-1", "literal", None,
        "http://www.w3.org/2001/XMLSchema#string",
    ) in rows
    # inherited xml:lang from rdf:RDF
    assert ("urn:ds:1", dct + "title", "Titel & mehr", "literal", "de", None) in rows
    # local xml:lang overrides
    assert ("urn:ds:1", dct + "title", "Title", "literal", "en", None) in rows
    assert (
        "urn:ds:1", "http://www.w3.org/ns/dcat#distribution", "urn:dist:1",
        "iri", None, None,
    ) in rows
    assert ("urn:ds:1", dct + "relation", "_:b7", "bnode", None, None) in rows
    # nested anonymous node: dataset → genid bnode → name literal
    pub = [r for r in rows if r[1] == dct + "publisher"]
    assert len(pub) == 1 and pub[0][3] == "bnode"
    bn = pub[0][2]
    # xml:lang="" cancels inheritance (empty → no tag)
    name = [r for r in rows if r[0] == bn and r[1] == dct + "name"]
    assert name == [(bn, dct + "name", "Acme", "literal", "", None)]


@pytest.mark.parametrize(
    "snippet,needle",
    [
        # withdrawn 1999-era syntax: never mis-parse, always loud
        (
            '<rdf:Description rdf:about="u:1">'
            '<d:p xmlns:d="u:" rdf:aboutEach="u:2">t</d:p></rdf:Description>',
            "withdrawn",
        ),
        # statement reification via property-element rdf:ID
        (
            '<rdf:Description rdf:about="u:1">'
            '<d:p xmlns:d="u:" rdf:ID="reif">t</d:p></rdf:Description>',
            "reification",
        ),
        # rdf:ID needs a base to resolve its #fragment against
        ('<rdf:Description rdf:ID="frag"/>', "no in-scope base"),
        # relative rdf:about with no xml:base / base_iri
        ('<rdf:Description rdf:about="rel/ative"/>', "no in-scope base"),
        # a nodeID colliding with the synthesized anon-label prefix
        (
            '<rdf:Description rdf:nodeID="xgen-1-1"/>',
            "collides",
        ),
        # at most one subject-naming attribute
        (
            '<rdf:Description rdf:about="u:1" rdf:nodeID="b"/>',
            "at most one",
        ),
    ],
)
def test_unsupported_subset_raises(snippet, needle):
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        + snippet + "</rdf:RDF>"
    )
    with pytest.raises(ValueError, match=needle):
        _parse_doc(doc)


# full-grammar fixture exercising every round-5 addition: rdf:ID + scoped
# xml:base, rdf:li container expansion, parseType Resource / Collection /
# Literal, property attributes on node and property elements, relative
# rdf:resource/rdf:datatype resolution. The document lives in oracle.py
# (it is also the `rdfxml_full_grammar_parse` contract fixture); here the
# parse is checked tuple-by-tuple rather than as rendered lines.
from bop_consus_importing_rdf_spark.oracle import (  # noqa: E402
    RDFXML_FULL_DOC as FULL_GRAMMAR,
)

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_EX = "http://ex.org/v#"


def test_parse_full_grammar():
    from bop_consus_importing_rdf_spark.sources.turtle_io import doc_label_tag

    tag = doc_label_tag(FULL_GRAMMAR)
    b = [f"_:xgen-{tag}-{i}" for i in range(0, 7)]  # b[1]..b[6] in emit order
    frag = "http://base.org/dir/page#frag"
    rows = _parse_doc(FULL_GRAMMAR)
    expected = [
        # node-element property attribute, inherited xml:lang
        (frag, _EX + "title", "Hello", "literal", "en", None),
        # relative rdf:resource vs xml:base + object property attribute
        (frag, _EX + "knows", "http://base.org/dir/other", "iri", None, None),
        ("http://base.org/dir/other", _EX + "note", "attached", "literal",
         "en", None),
        # rdf:li expansion on the anonymous typed Bag node
        (b[1], _RDF + "type", _RDF + "Bag", "iri", None, None),
        (b[1], _RDF + "_1", "one", "literal", "en", None),
        (b[1], _RDF + "_2", "http://base.org/dir/two", "iri", None, None),
        (frag, _EX + "bag", b[1], "bnode", None, None),
        # parseType=Resource: implicit bnode, datatype suppresses lang
        (frag, _EX + "addr", b[2], "bnode", None, None),
        (b[2], _EX + "city", "Berlin", "literal", "en", None),
        (b[2], _EX + "zip", "10", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        # parseType=Collection: rdf:first/rest chain, built tail-first
        (b[3], _RDF + "rest", _RDF + "nil", "iri", None, None),
        (b[3], _RDF + "first", "urn:abs:b", "iri", None, None),
        (b[4], _RDF + "rest", b[3], "bnode", None, None),
        (b[4], _RDF + "first", "http://base.org/dir/a", "iri", None, None),
        (frag, _EX + "list", b[4], "bnode", None, None),
        # parseType=Literal: inner XML as rdf:XMLLiteral lexical form
        (frag, _EX + "xml", 'pre<b attr="v">bold</b>post', "literal", None,
         _RDF + "XMLLiteral"),
        # empty property element with property attributes → fresh bnode
        (frag, _EX + "card", b[5], "bnode", None, None),
        (b[5], _EX + "name", "Ada", "literal", "en", None),
        (b[5], _EX + "mail", "a@b.c", "literal", "en", None),
        # element-scoped xml:base override + typed node element
        ("http://other.org/root", _RDF + "type", _EX + "Thing", "iri",
         None, None),
        ("http://other.org/root", _EX + "rel", "http://other.org/z", "iri",
         None, None),
    ]
    assert sorted(map(tuple, rows)) == sorted(expected)


def test_keep_malformed_emits_reject_row(spark):
    docs = spark.createDataFrame(
        [("good", GOLDEN), ("bad", "<rdf:RDF><unclosed")],
        "doc_id string, xml string",
    )
    out = parse_rdfxml(docs, carry_cols=("doc_id",), keep_malformed=True)
    rejects = out.filter(out.obj_kind.isNull()).collect()
    assert len(rejects) == 1
    assert rejects[0].doc_id == "bad"
    assert "ParseError" in rejects[0].obj_value
    # the good document still parsed fully alongside the reject
    assert out.filter(out.obj_kind.isNotNull()).count() >= 8


def test_render_parse_roundtrip_spark(spark):
    rows = [
        ("d0", "urn:s:1", "urn:p:name", 'tricky "literal"\n\t<&>', "literal",
         None, None),
        ("d0", "urn:s:1", "urn:p:lang", "hallo", "literal", "de", None),
        ("d0", "urn:s:1", "urn:p:count", "42", "literal", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("d0", "urn:s:1", "urn:p:link", "urn:o:1", "iri", None, None),
        ("d0", "_:b1", "urn:p:backref", "_:b2", "bnode", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_lang string, obj_datatype string",
    )
    docs = render_rdfxml_docs(df)
    back = parse_rdfxml(docs, carry_cols=("doc_id",))
    got = {tuple(r) for r in back.collect()}
    assert got == {tuple(r) for r in rows}


def test_cr_literal_roundtrips_exactly(spark):
    """XML parsers normalize raw CR in text to LF; the writer must emit
    &#13; so a \\r literal survives the round trip byte-for-byte."""
    rows = [("d0", "urn:s:1", "urn:p:x", "a\rb\r\nc", "literal", None, None)]
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_lang string, obj_datatype string",
    )
    back = parse_rdfxml(render_rdfxml_docs(df), carry_cols=("doc_id",))
    assert back.first().obj_value == "a\rb\r\nc"


def test_xml_unrepresentable_literal_raises_loudly(spark):
    """C0 controls (other than TAB/LF/CR) cannot exist in XML 1.0 at all —
    the writer must refuse with a clear error, not emit a document no
    parser will accept."""
    import pytest as _pytest

    rows = [("d0", "urn:s:bad", "urn:p:x", "oops\x01", "literal", None, None)]
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj_value string, "
        "obj_kind string, obj_lang string, obj_datatype string",
    )
    with _pytest.raises(Exception, match="not RDF/XML-serializable"):
        render_rdfxml_docs(df).collect()


def test_roundtrip_property_arbitrary_xml_legal_literals(spark):
    """Hypothesis: render∘parse == id for ANY XML-representable literal
    (full unicode incl. emoji, quotes, &<>, tabs, newlines, CRs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    xml_legal = st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_categories=("Cs",),          # no lone surrogates
            exclude_characters=[chr(c) for c in range(0x00, 0x20)
                                if c not in (0x09, 0x0A, 0x0D)],
        ),
        max_size=60,
    )

    @given(st.lists(xml_legal, min_size=1, max_size=6, unique=True))
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(texts):
        rows = [
            ("d0", f"urn:s:{i}", "urn:p:x", t, "literal", None, None)
            for i, t in enumerate(texts)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id string, subj string, pred string, obj_value string, "
            "obj_kind string, obj_lang string, obj_datatype string",
        )
        back = parse_rdfxml(render_rdfxml_docs(df), carry_cols=("doc_id",))
        got = {(r.subj, r.obj_value) for r in back.collect()}
        assert got == {(f"urn:s:{i}", t) for i, t in enumerate(texts)}

    check()
