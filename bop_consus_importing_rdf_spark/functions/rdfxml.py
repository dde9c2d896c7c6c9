"""RDF/XML serialization + parsing (reference S5/S10).

The reference's hardcoded *input* content type is ``application/rdf+xml``
(``Flows.kt:47-48``) and Jena parses/serializes it (``JenaUtils.read``,
``Flows.kt:66-77``; output format list ``config.schema.json:40-50``). No RDF
library exists in this container, so both directions are implemented
natively against the statement-table model:

- **render**: one ``<rdf:Description>`` block PER STATEMENT (spec-valid —
  RDF/XML merges repeated Description blocks for one subject), built as a
  pure column expression; the namespace of each predicate is declared
  inline on the property element, which sidesteps a global prefix table.
  Document assembly is one ``collect_list`` per source document.
- **parse**: Arrow-batched ``mapInPandas`` over whole documents using
  stdlib ``xml.etree`` — namespace-aware, handling ``rdf:Description`` and
  typed node elements, ``rdf:about``/``rdf:nodeID`` (blank) subjects,
  ``rdf:resource``/``rdf:nodeID`` object attributes, nested node elements
  (anonymous → generated blank ids), literals with inherited ``xml:lang``
  and ``rdf:datatype``. ``rdf:ID``/``rdf:parseType``/``rdf:li`` are outside
  the supported subset and raise cleanly rather than mis-parse.

Round-trip (render ∘ parse == id over the fixture graph) is an oracle-gated
driver query: the N-Triples lines of the round-tripped statements must hash
equal to ``nt_render`` straight off the graph.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..vocab import KIND_BNODE, KIND_IRI, RDF_TYPE

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"

_LOCAL_NAME_RE = r"([A-Za-z_][A-Za-z0-9_.\-]*)$"


def xml_escape_text(col: Column) -> Column:
    """``&`` first, then ``<``/``>``, then ``\\r`` — element text escaping.

    ``\\r`` must become the character reference ``&#13;``: XML parsers
    normalize raw CR (and CRLF) in text content to LF, which would silently
    corrupt a literal on round-trip (found by property testing — the ECHAR
    set tempts you to treat ``\\r`` like ``\\n``, but only ``\\n``/``\\t``
    survive as raw text). Replaced LAST so its ``&`` is not re-escaped.
    """
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return F.replace(out, F.lit("\r"), F.lit("&#13;"))


def xml_escape_attr(col: Column) -> Column:
    return F.replace(xml_escape_text(col), F.lit('"'), F.lit("&quot;"))


# code points XML 1.0 cannot represent AT ALL (not even as char refs)
_XML_INVALID = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def rdfxml_fragment(
    subj: Column, pred: Column, obj_value: Column, obj_kind: Column,
    obj_lang: Column, obj_datatype: Column,
) -> Column:
    """One ``<rdf:Description>…</rdf:Description>`` block for one statement.

    A literal containing a code point XML 1.0 cannot represent (C0 controls
    other than TAB/LF/CR) makes the graph UNSERIALIZABLE as RDF/XML — a
    documented limitation of the syntax, not of this writer. Such rows
    ``raise_error`` at render time with the offending subject, instead of
    silently emitting a document no parser will accept (which is what a
    naive writer does — found by property testing). N-Triples/Turtle
    serialize such literals fine via ``\\u`` escapes.
    """
    local = F.regexp_extract(pred, _LOCAL_NAME_RE, 1)
    ns = F.substring(pred, F.lit(1), F.length(pred) - F.length(local))
    subj_attr = F.when(
        subj.startswith("_:"),
        F.concat(F.lit('rdf:nodeID="'), F.substring(subj, 3, 1 << 20), F.lit('"')),
    ).otherwise(F.concat(F.lit('rdf:about="'), xml_escape_attr(subj), F.lit('"')))
    open_prop = F.concat(
        F.lit("<n:"), local, F.lit(' xmlns:n="'), xml_escape_attr(ns), F.lit('"')
    )
    lang_attr = F.when(
        obj_lang.isNotNull() & (obj_lang != ""),
        F.concat(F.lit(' xml:lang="'), obj_lang, F.lit('"')),
    ).otherwise(F.lit(""))
    dt_attr = F.when(
        obj_datatype.isNotNull() & (obj_datatype != ""),
        F.concat(F.lit(' rdf:datatype="'), xml_escape_attr(obj_datatype), F.lit('"')),
    ).otherwise(F.lit(""))
    prop = (
        F.when(
            obj_kind == KIND_IRI,
            F.concat(
                open_prop, F.lit(' rdf:resource="'), xml_escape_attr(obj_value),
                F.lit('"/>'),
            ),
        )
        .when(
            obj_kind == KIND_BNODE,
            F.concat(
                open_prop, F.lit(' rdf:nodeID="'),
                F.substring(obj_value, 3, 1 << 20), F.lit('"/>'),
            ),
        )
        .otherwise(
            F.concat(
                open_prop, lang_attr, dt_attr, F.lit(">"),
                F.when(
                    obj_value.rlike(_XML_INVALID),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "literal contains a code point XML 1.0 "
                                "cannot represent (C0 control); graph is "
                                "not RDF/XML-serializable — subject: "
                            ),
                            subj,
                        )
                    ),
                ).otherwise(xml_escape_text(obj_value)),
                F.lit("</n:"), local, F.lit(">"),
            )
        )
    )
    return F.concat(
        F.lit("<rdf:Description "), subj_attr, F.lit(">"), prop,
        F.lit("</rdf:Description>"),
    )


def render_rdfxml_docs(
    triples: DataFrame, doc_col: str = "doc_id"
) -> DataFrame:
    """``(doc_col, xml)`` — one full RDF/XML document per source document.

    Fragments are sorted before concatenation so the document bytes are
    deterministic under any partitioning.
    """
    frag = rdfxml_fragment(
        F.col("subj"), F.col("pred"), F.col("obj_value"),
        F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
    )
    return (
        triples.withColumn("_frag", frag)
        .groupBy(doc_col)
        .agg(
            F.concat(
                F.lit(
                    '<?xml version="1.0" encoding="utf-8"?>\n'
                    f'<rdf:RDF xmlns:rdf="{RDF_NS}">'
                ),
                F.concat_ws("", F.array_sort(F.collect_list("_frag"))),
                F.lit("</rdf:RDF>"),
            ).alias("xml")
        )
    )


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def _expand(tag: str) -> str:
    """etree ``{ns}local`` → full IRI ``nslocal``."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def _parse_doc(xml: str) -> list[tuple]:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)
    rows: list[tuple] = []
    gen = [0]

    def fresh_bnode() -> str:
        gen[0] += 1
        return f"_:genid{gen[0]}"

    def node_subject(el) -> str:
        about = el.get(f"{{{RDF_NS}}}about")
        if about is not None:
            return about
        node_id = el.get(f"{{{RDF_NS}}}nodeID")
        if node_id is not None:
            return "_:" + node_id
        if el.get(f"{{{RDF_NS}}}ID") is not None:
            raise ValueError("rdf:ID is outside the supported RDF/XML subset")
        return fresh_bnode()

    def walk_node(el, inherited_lang: str | None) -> str:
        subj = node_subject(el)
        lang = el.get(f"{{{XML_NS}}}lang", inherited_lang)
        tag = _expand(el.tag)
        if tag != RDF_NS + "Description":
            rows.append((subj, RDF_TYPE, tag, KIND_IRI, None, None))
        for pel in el:
            pred = _expand(pel.tag)
            if pred == RDF_NS + "li":
                raise ValueError("rdf:li is outside the supported subset")
            if pel.get(f"{{{RDF_NS}}}parseType") is not None:
                raise ValueError(
                    "rdf:parseType is outside the supported subset"
                )
            p_lang = pel.get(f"{{{XML_NS}}}lang", lang)
            resource = pel.get(f"{{{RDF_NS}}}resource")
            node_ref = pel.get(f"{{{RDF_NS}}}nodeID")
            dt = pel.get(f"{{{RDF_NS}}}datatype")
            children = list(pel)
            if resource is not None:
                rows.append((subj, pred, resource, KIND_IRI, None, None))
            elif node_ref is not None:
                rows.append((subj, pred, "_:" + node_ref, KIND_BNODE, None, None))
            elif children:
                obj = walk_node(children[0], p_lang)
                kind = KIND_BNODE if obj.startswith("_:") else KIND_IRI
                rows.append((subj, pred, obj, kind, None, None))
            else:
                text = pel.text or ""
                rows.append(
                    (subj, pred, text, "literal",
                     None if dt is not None else p_lang, dt)
                )
        return subj

    root_lang = root.get(f"{{{XML_NS}}}lang")
    for el in root:
        walk_node(el, root_lang)
    return rows


PARSED_SCHEMA = (
    "subj string, pred string, obj_value string, obj_kind string, "
    "obj_lang string, obj_datatype string"
)


def parse_rdfxml(
    docs: DataFrame,
    xml_col: str = "xml",
    carry_cols: tuple[str, ...] = (),
    keep_malformed: bool = False,
) -> DataFrame:
    """Whole RDF/XML documents → statement rows, Arrow-batched.

    ``carry_cols`` (e.g. the source doc id) are replicated onto every
    emitted statement row. ``keep_malformed=True`` mirrors
    ``parse_ntriples``'s lineage behavior: an unparseable document yields
    ONE reject row (``obj_kind`` NULL, the error text in ``obj_value``)
    instead of failing the task — the reference rethrows with address
    context (``Flows.kt:75-77``); here the address IS the carry column.
    """
    carry = list(carry_cols)
    schema = PARSED_SCHEMA
    for c in carry:
        schema = f"{c} string, " + schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        cols = carry + [
            "subj", "pred", "obj_value", "obj_kind", "obj_lang", "obj_datatype"
        ]
        for pdf in it:
            out: list[tuple] = []
            for _, row in pdf.iterrows():
                prefix = tuple(row[c] for c in carry)
                try:
                    parsed = _parse_doc(row[xml_col])
                except (ET.ParseError, ValueError) as e:
                    if not keep_malformed:
                        raise
                    out.append(
                        prefix + (None, None, f"{type(e).__name__}: {e}",
                                  None, None, None)
                    )
                    continue
                out.extend(prefix + r for r in parsed)
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(batches, schema)
