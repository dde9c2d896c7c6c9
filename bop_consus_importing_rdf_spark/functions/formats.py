"""Output serializations beyond N-Triples (reference S10).

The reference serializes each dataset model via ``Model.presentAs(mimeType)``
with six formats advertised in ``config.schema.json:40-50``: N-Triples
(``functions/ntriples.py``), RDF/XML (``functions/rdfxml.py``), and here
Turtle, N-Quads, TriG and JSON-LD — each as pure column expressions (zero
UDFs, whole-stage-codegen) with a ``sql_*`` DuckDB twin generated from the
SAME prefix table, so every format is oracle-checkable byte-for-byte.

Turtle/TriG use prefixed names where the IRI splits cleanly on a known
namespace (PN_LOCAL kept conservative: ``[A-Za-z_][A-Za-z0-9_-]*``), ``a``
for ``rdf:type`` in predicate position, and N-Triples ECHAR escaping (a
spec-valid subset of Turtle's literal syntax). JSON-LD is the flattened
one-object-per-statement form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..vocab import (
    DCAT_NS,
    DCT_NS,
    HYDRA_NS,
    KIND_BNODE,
    KIND_IRI,
    RDF_TYPE,
    XSD_NS,
    XSD_STRING,
)
from .ntriples import (
    escape_literal,
    render_object,
    render_subject,
    sql_escape_literal,
    sql_render_object,
    sql_render_subject,
)

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# ONE prefix table drives the Spark expressions AND the generated DuckDB SQL
PREFIXES: dict[str, str] = {
    "rdf": RDF_NS,
    "dcat": DCAT_NS,
    "dct": DCT_NS,
    "xsd": XSD_NS,
    "hydra": HYDRA_NS,
    "p": "urn:p:",
}

_PN_LOCAL = "[A-Za-z_][A-Za-z0-9_-]*"


def prefix_directives() -> list[str]:
    return [f"@prefix {p}: <{ns}> ." for p, ns in sorted(PREFIXES.items())]


# ---------------------------------------------------------------------------
# Turtle terms
# ---------------------------------------------------------------------------

def ttl_iri(col: Column) -> Column:
    """IRI → prefixed name when it splits on a known namespace, else <iri>."""
    out = F.concat(F.lit("<"), col, F.lit(">"))
    for p, ns in sorted(PREFIXES.items()):
        local = F.substring(col, len(ns) + 1, 1 << 20)
        out = F.when(
            col.startswith(ns) & local.rlike(f"^{_PN_LOCAL}$"),
            F.concat(F.lit(p + ":"), local),
        ).otherwise(out)
    return out


def ttl_subject(subj: Column) -> Column:
    return F.when(subj.startswith("_:"), subj).otherwise(ttl_iri(subj))


def ttl_predicate(pred: Column) -> Column:
    return F.when(pred == RDF_TYPE, F.lit("a")).otherwise(ttl_iri(pred))


def ttl_object(
    obj_value: Column, obj_kind: Column, obj_lang: Column, obj_datatype: Column
) -> Column:
    lit_body = F.concat(F.lit('"'), escape_literal(obj_value), F.lit('"'))
    lang_ok = obj_lang.isNotNull() & (obj_lang != "")
    dt_ok = (
        obj_datatype.isNotNull() & (obj_datatype != "")
        & (obj_datatype != XSD_STRING)
    )
    literal = F.when(lang_ok, F.concat(lit_body, F.lit("@"), obj_lang)).otherwise(
        F.when(dt_ok, F.concat(lit_body, F.lit("^^"), ttl_iri(obj_datatype)))
        .otherwise(lit_body)
    )
    return (
        F.when(obj_kind == KIND_IRI, ttl_iri(obj_value))
        .when(obj_kind == KIND_BNODE, obj_value)
        .otherwise(literal)
    )


def ttl_line(
    subj: Column, pred: Column, obj_value: Column, obj_kind: Column,
    obj_lang: Column, obj_datatype: Column,
) -> Column:
    return F.concat_ws(
        " ",
        ttl_subject(subj),
        ttl_predicate(pred),
        ttl_object(obj_value, obj_kind, obj_lang, obj_datatype),
        F.lit("."),
    )


def ttl_grouped_docs(
    triples: DataFrame, n_docs: int = 8
) -> DataFrame:
    """Realistic grouped Turtle rendering: one document per hash bucket of
    subjects, each subject a multi-line ``;`` predicate-object list (with
    ``,`` object lists per predicate), directives at the top — the form
    real ``.ttl`` dumps take, and the round-trip fixture for the
    statement re-assembly pass (``sources/turtle_io.parse_turtle_docs``).

    Returns ``(doc, ttl)``.
    """
    po = F.concat(
        ttl_predicate(F.col("pred")),
        F.lit(" "),
        F.concat_ws(
            " ,\n        ", F.array_sort(F.collect_list("_obj"))
        ),
    )
    per_pred = (
        triples.withColumn(
            "_obj",
            ttl_object(
                F.col("obj_value"), F.col("obj_kind"), F.col("obj_lang"),
                F.col("obj_datatype"),
            ),
        )
        .groupBy("subj", "pred")
        .agg(po.alias("_po"))
    )
    per_subj = per_pred.groupBy("subj").agg(
        F.concat(
            ttl_subject(F.col("subj")),
            F.lit(" "),
            F.concat_ws(" ;\n    ", F.array_sort(F.collect_list("_po"))),
            F.lit(" ."),
        ).alias("_block")
    )
    header = "\n".join(prefix_directives())
    return (
        per_subj.withColumn("doc", F.pmod(F.xxhash64("subj"), F.lit(n_docs)))
        .groupBy("doc")
        .agg(
            F.concat(
                F.lit(header + "\n\n"),
                F.concat_ws("\n\n", F.array_sort(F.collect_list("_block"))),
            ).alias("ttl")
        )
    )


def sql_ttl_iri(expr: str) -> str:
    out = f"'<'||{expr}||'>'"
    for p, ns in sorted(PREFIXES.items()):
        local = f"substring({expr}, {len(ns) + 1})"
        out = (
            f"CASE WHEN substring({expr}, 1, {len(ns)}) = '{ns}' "
            f"AND regexp_full_match({local}, '{_PN_LOCAL}') "
            f"THEN '{p}:'||{local} ELSE {out} END"
        )
    return out


def sql_ttl_line(
    subj: str = "subj", pred: str = "pred", obj_value: str = "obj_value",
    obj_kind: str = "obj_kind", obj_lang: str = "obj_lang",
    obj_datatype: str = "obj_datatype",
) -> str:
    s = (
        f"CASE WHEN substring({subj}, 1, 2) = '_:' THEN {subj} "
        f"ELSE {sql_ttl_iri(subj)} END"
    )
    p = f"CASE WHEN {pred} = '{RDF_TYPE}' THEN 'a' ELSE {sql_ttl_iri(pred)} END"
    body = f"chr(34)||{sql_escape_literal(obj_value)}||chr(34)"
    o = (
        f"CASE WHEN {obj_kind} = 'iri' THEN {sql_ttl_iri(obj_value)} "
        f"WHEN {obj_kind} = 'bnode' THEN {obj_value} "
        f"WHEN {obj_lang} IS NOT NULL AND {obj_lang} <> '' "
        f"THEN {body}||'@'||{obj_lang} "
        f"WHEN {obj_datatype} IS NOT NULL AND {obj_datatype} <> '' "
        f"AND {obj_datatype} <> '{XSD_STRING}' "
        f"THEN {body}||'^^'||{sql_ttl_iri(obj_datatype)} "
        f"ELSE {body} END"
    )
    return f"{s}||' '||{p}||' '||{o}||' .'"


# ---------------------------------------------------------------------------
# N-Quads / TriG (graph term = the source document)
# ---------------------------------------------------------------------------

def graph_iri(doc_col: Column) -> Column:
    return F.concat(F.lit("urn:graph:"), doc_col)


def nq_line(
    doc_col: Column, subj: Column, pred: Column, obj_value: Column,
    obj_kind: Column, obj_lang: Column, obj_datatype: Column,
) -> Column:
    return F.concat_ws(
        " ",
        render_subject(subj),
        F.concat(F.lit("<"), pred, F.lit(">")),
        render_object(obj_value, obj_kind, obj_lang, obj_datatype),
        F.concat(F.lit("<"), graph_iri(doc_col), F.lit(">")),
        F.lit("."),
    )


def sql_nq_line(doc_col: str = "doc_id") -> str:
    return (
        f"{sql_render_subject('subj')}||' <'||pred||'> '||"
        f"{sql_render_object('obj_value', 'obj_kind', 'obj_lang', 'obj_datatype')}"
        f"||' <urn:graph:'||{doc_col}||'> .'"
    )


def trig_docs(triples: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """``(doc_col, trig)`` — one TriG graph block per source document, lines
    sorted for deterministic bytes."""
    line = ttl_line(
        F.col("subj"), F.col("pred"), F.col("obj_value"),
        F.col("obj_kind"), F.col("obj_lang"), F.col("obj_datatype"),
    )
    return (
        triples.withColumn("_l", line)
        .groupBy(doc_col)
        .agg(
            F.concat(
                F.lit("<"), graph_iri(F.col(doc_col)), F.lit("> {\n"),
                F.concat_ws("\n", F.array_sort(F.collect_list("_l"))),
                F.lit("\n}"),
            ).alias("trig")
        )
    )


# ---------------------------------------------------------------------------
# JSON-LD (flattened, one object per statement)
# ---------------------------------------------------------------------------

# backslash FIRST; then the named escapes; then every remaining C0 control
# as \u00XX — raw control characters are INVALID inside JSON strings
# (json.loads rejects them), the same latent-corruption class the RDF/XML
# writer had with CR. The C0 replacements are emitted after the backslash
# escape so their own backslashes survive.
_JSON_ESCAPES = [
    ("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"),
] + [
    (chr(c), f"\\u{c:04x}")
    for c in range(0x20)
    if c not in (0x09, 0x0A, 0x0D)
]


def json_escape(col: Column) -> Column:
    out = col
    for raw, esc in _JSON_ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def jsonld_line(
    subj: Column, pred: Column, obj_value: Column, obj_kind: Column,
    obj_lang: Column, obj_datatype: Column,
) -> Column:
    q = '"'
    node = F.concat(F.lit('{"@id":"'), json_escape(obj_value), F.lit('"}'))
    lang_ok = obj_lang.isNotNull() & (obj_lang != "")
    dt_ok = (
        obj_datatype.isNotNull() & (obj_datatype != "")
        & (obj_datatype != XSD_STRING)
    )
    val = F.concat(F.lit('{"@value":"'), json_escape(obj_value), F.lit(q))
    literal = (
        F.when(lang_ok, F.concat(val, F.lit(',"@language":"'), obj_lang, F.lit('"}')))
        .when(dt_ok, F.concat(val, F.lit(',"@type":"'), json_escape(obj_datatype), F.lit('"}')))
        .otherwise(F.concat(val, F.lit("}")))
    )
    obj = (
        F.when(obj_kind.isin(KIND_IRI, KIND_BNODE), node).otherwise(literal)
    )
    return F.concat(
        F.lit('{"@id":"'), json_escape(subj), F.lit('","'),
        json_escape(pred), F.lit('":['), obj, F.lit("]}"),
    )


def sql_json_escape(expr: str) -> str:
    out = expr
    pairs = [
        ("chr(92)", "chr(92)||chr(92)"),
        ("chr(34)", "chr(92)||chr(34)"),
        ("chr(10)", "chr(92)||'n'"),
        ("chr(13)", "chr(92)||'r'"),
        ("chr(9)", "chr(92)||'t'"),
    ] + [
        (f"chr({c})", f"chr(92)||'u{c:04x}'")
        for c in range(0x20)
        if c not in (0x09, 0x0A, 0x0D)
    ]
    for raw, esc in pairs:
        out = f"replace({out}, {raw}, {esc})"
    return out


def sql_jsonld_line() -> str:
    node = (
        "'{'||chr(34)||'@id'||chr(34)||':'||chr(34)||"
        + sql_json_escape("obj_value")
        + "||chr(34)||'}'"
    )
    val = (
        "'{'||chr(34)||'@value'||chr(34)||':'||chr(34)||"
        + sql_json_escape("obj_value") + "||chr(34)"
    )
    literal = (
        f"CASE WHEN obj_lang IS NOT NULL AND obj_lang <> '' THEN {val}"
        "||','||chr(34)||'@language'||chr(34)||':'||chr(34)||obj_lang"
        "||chr(34)||'}' "
        f"WHEN obj_datatype IS NOT NULL AND obj_datatype <> '' "
        f"AND obj_datatype <> '{XSD_STRING}' THEN {val}"
        "||','||chr(34)||'@type'||chr(34)||':'||chr(34)||"
        + sql_json_escape("obj_datatype")
        + f"||chr(34)||'}}' ELSE {val}||'}}' END"
    )
    obj = (
        f"CASE WHEN obj_kind IN ('iri', 'bnode') THEN {node} "
        f"ELSE {literal} END"
    )
    return (
        "'{'||chr(34)||'@id'||chr(34)||':'||chr(34)||"
        + sql_json_escape("subj")
        + "||chr(34)||','||chr(34)||"
        + sql_json_escape("pred")
        + f"||chr(34)||':['||{obj}||']}}'"
    )
