"""N-Triples rendering as pure column expressions (reference S10/X3).

The reference serializes each extracted dataset model via
``Model.presentAs(mimeType)`` (``ImportingRdfVerticle.kt:90``), default
``application/n-triples``. Here each statement row renders to one N-Triples
line with built-in string functions only — no UDF, fully whole-stage-codegen.

Every renderer has a twin ``sql_*`` that emits the SAME logic as an ANSI-SQL
string runnable by both Spark SQL and DuckDB (special characters built with
``chr()`` so backslash-escaping dialect differences can't bite). The DuckDB
oracle in ``__spark_entry__.py`` uses these, so Spark and the oracle are
byte-identical by construction.

Escaping follows the canonical N-Triples spec (ECHAR): ``\\ \" \n \r \t``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..vocab import KIND_BNODE, KIND_IRI, XSD_STRING

# (raw char, escaped form) — backslash MUST be first
_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]


def escape_literal(col: Column) -> Column:
    """Escape a literal lexical form for N-Triples."""
    out = col
    for raw, esc in _ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def render_subject(subj: Column) -> Column:
    """``_:b…`` bnode labels pass through; anything else is an IRI."""
    return F.when(subj.startswith("_:"), subj).otherwise(
        F.concat(F.lit("<"), subj, F.lit(">"))
    )


def render_object(
    obj_value: Column, obj_kind: Column, obj_lang: Column, obj_datatype: Column
) -> Column:
    """Render the object term: IRI, bnode, or (possibly tagged) literal.

    Canonical form: ``xsd:string`` datatype is omitted; a language tag
    suppresses the datatype (per RDF 1.1 concepts).
    """
    lit_body = F.concat(F.lit('"'), escape_literal(obj_value), F.lit('"'))
    lang_ok = obj_lang.isNotNull() & (obj_lang != "")
    dt_ok = (
        obj_datatype.isNotNull() & (obj_datatype != "") & (obj_datatype != XSD_STRING)
    )
    literal = F.when(lang_ok, F.concat(lit_body, F.lit("@"), obj_lang)).otherwise(
        F.when(
            dt_ok, F.concat(lit_body, F.lit("^^<"), obj_datatype, F.lit(">"))
        ).otherwise(lit_body)
    )
    return (
        F.when(obj_kind == KIND_IRI, F.concat(F.lit("<"), obj_value, F.lit(">")))
        .when(obj_kind == KIND_BNODE, obj_value)
        .otherwise(literal)
    )


def nt_line(
    subj: Column, pred: Column, obj_value: Column, obj_kind: Column,
    obj_lang: Column, obj_datatype: Column,
) -> Column:
    """One full N-Triples statement line ``<s> <p> o .``"""
    return F.concat_ws(
        " ",
        render_subject(subj),
        F.concat(F.lit("<"), pred, F.lit(">")),
        render_object(obj_value, obj_kind, obj_lang, obj_datatype),
        F.lit("."),
    )


# ---------------------------------------------------------------------------
# SQL twins (dialect-portable: Spark SQL + DuckDB)
# ---------------------------------------------------------------------------

def sql_escape_literal(expr: str) -> str:
    """Portable SQL for :func:`escape_literal` applied to ``expr``.

    ``chr(92)`` = backslash, ``chr(34)`` = double quote — avoids every
    dialect's string-literal escaping rules.
    """
    out = expr
    pairs = [
        ("chr(92)", "chr(92)||chr(92)"),
        ("chr(34)", "chr(92)||chr(34)"),
        ("chr(10)", "chr(92)||'n'"),
        ("chr(13)", "chr(92)||'r'"),
        ("chr(9)", "chr(92)||'t'"),
    ]
    for raw, esc in pairs:
        out = f"replace({out}, {raw}, {esc})"
    return out


def sql_render_subject(subj: str) -> str:
    return (
        f"case when substring({subj}, 1, 2) = '_:' then {subj} "
        f"else '<'||{subj}||'>' end"
    )


def sql_render_object(
    obj_value: str, obj_kind: str, obj_lang: str, obj_datatype: str
) -> str:
    body = f"chr(34)||{sql_escape_literal(obj_value)}||chr(34)"
    return (
        f"case when {obj_kind} = 'iri' then '<'||{obj_value}||'>' "
        f"when {obj_kind} = 'bnode' then {obj_value} "
        f"when {obj_lang} is not null and {obj_lang} <> '' "
        f"then {body}||'@'||{obj_lang} "
        f"when {obj_datatype} is not null and {obj_datatype} <> '' "
        f"and {obj_datatype} <> '{XSD_STRING}' "
        f"then {body}||'^^<'||{obj_datatype}||'>' "
        f"else {body} end"
    )


def sql_nt_line(
    subj: str = "subj", pred: str = "pred", obj_value: str = "obj_value",
    obj_kind: str = "obj_kind", obj_lang: str = "obj_lang",
    obj_datatype: str = "obj_datatype",
) -> str:
    return (
        f"{sql_render_subject(subj)}||' <'||{pred}||'> '||"
        f"{sql_render_object(obj_value, obj_kind, obj_lang, obj_datatype)}||' .'"
    )
