"""JSON-LD input parse (reference S5 — flattened statement form).

Inverse of ``functions/formats.jsonld_line``: one flattened JSON object per
line, ``{"@id": s, pred: [{"@id": o} | {"@value": v, "@language"?: l,
"@type"?: dt}]}``. That is the exact form our serializer emits (and the
canonical flattened single-statement shape); full JSON-LD expansion with
``@context`` resolution is out of scope — such documents land in the
malformed bucket, loudly countable via ``keep_malformed``.

Same architecture as the other parsers: JVM regexp structure parse +
JVM-chain unescaping of the named JSON escapes. Lines carrying a raw
sentinel byte, a ``\\uXXXX`` escape (``json.loads`` handles surrogate
pairs, a ``chr()`` map cannot), or any OTHER non-named escape (strict
JSON rejects ``\\x`` etc. — such lines are malformed and must land in
the reject bucket, not crash or silently mis-decode) take the exact
whole-line Python fallback, which catches decode errors per line.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rdf_io import PARSED_SCHEMA

_JSTR = r'(?:[^"\\]|\\.)*'
_LINE_PATTERN = (
    rf'^\s*\{{"@id":"({_JSTR})","({_JSTR})":\[(.*)\]\}}\s*$'
)
_NODE_RE = rf'^\{{"@id":"({_JSTR})"\}}$'
_VALUE_RE = (
    rf'^\{{"@value":"({_JSTR})"'
    rf'(?:,"@language":"([A-Za-z][A-Za-z0-9-]*)")?'
    rf'(?:,"@type":"({_JSTR})")?\}}$'
)


def _json_unescape(s: str) -> str:
    return json.loads(f'"{s}"')


def _parse_one_jsonld(line: str) -> tuple:
    m = re.match(_LINE_PATTERN, line)
    if not m:
        return (None, None, line, None, None, None)
    subj, pred, inner = m.group(1), m.group(2), m.group(3)
    try:
        subj, pred = _json_unescape(subj), _json_unescape(pred)
        node = re.match(_NODE_RE, inner)
        if node:
            obj = _json_unescape(node.group(1))
            kind = "bnode" if obj.startswith("_:") else "iri"
            return (subj, pred, obj, kind, None, None)
        val = re.match(_VALUE_RE, inner)
        if not val:
            return (None, None, line, None, None, None)
        body = _json_unescape(val.group(1))
        lang = val.group(2)
        dt = _json_unescape(val.group(3)) if val.group(3) else None
        return (subj, pred, body, "literal", lang, dt)
    except (ValueError, json.JSONDecodeError):
        return (None, None, line, None, None, None)


def _unescape_json_col(col: Column) -> Column:
    """Named JSON escapes, fully in the JVM. Exact BECAUSE the caller
    routes every line carrying ``\\u`` or a non-named escape to the Python
    fallback first — what reaches this chain holds only the seven named
    escapes."""
    sent = "\x02"
    step1 = F.replace(col, F.lit("\\\\"), F.lit(sent))
    out = step1
    for raw, esc in (
        ('"', '"'), ("/", "/"), ("n", "\n"), ("r", "\r"), ("t", "\t"),
        ("b", "\b"), ("f", "\f"),
    ):
        out = F.replace(out, F.lit("\\" + raw), F.lit(esc))
    return F.replace(out, F.lit(sent), F.lit("\\"))


def parse_jsonld(
    lines: DataFrame, line_col: str = "value", keep_malformed: bool = False
) -> DataFrame:
    """Flattened JSON-LD statement lines → statement rows
    (``rdf_io.PARSED_SCHEMA``).

    Round-5 rebuild on the split-union architecture of the other parsers
    (previously a single projection with per-column
    ``when(has_ctl, fb[...])`` coalesces — that spelling inlines the
    fallback UDF into every output column AND re-evaluates the whole
    chain in the malformed-drop filter: measured **59.7s vs 4.6s** for
    the identical 905k-line parse at local[32]):

    - **clean branch** (no escapes beyond the seven named ones): 100%
      JVM — one packed regex pass projected into an attribute, anchored
      extracts over the attribute in a second projection, replace-chain
      unescaping; whole-stage codegen end to end.
    - **assist branch** (raw sentinel bytes, ``\\uXXXX`` — needs
      ``json.loads`` incl. surrogate pairs — or any non-named escape,
      which strict JSON rejects): whole-line exact Python fallback,
      ``asNondeterministic`` as the plan barrier, malformed-drop on the
      output struct (same discipline as ``rdf_io.parse_ntriples``).

    Entry materialization (``ensure_materialized``) enforces the shared
    caller contract."""
    from .rdf_io import ensure_materialized

    lines = ensure_materialized(lines)

    @F.pandas_udf(f"struct<{PARSED_SCHEMA}>")
    def _parse_fallback(s: pd.Series) -> pd.DataFrame:
        cols = ["subj", "pred", "obj_value", "obj_kind", "obj_lang",
                "obj_datatype"]
        mask = s.notna()
        out = pd.DataFrame(None, index=s.index, columns=cols, dtype=object)
        if mask.any():
            out.loc[mask] = pd.DataFrame(
                [_parse_one_jsonld(x) for x in s[mask]],
                columns=cols,
                index=s.index[mask],
            )
        return out

    _parse_fallback = _parse_fallback.asNondeterministic()

    line = F.col(line_col)
    stripped = F.trim(line)
    has_ctl = (
        line.contains("\x01") | line.contains("\x02")
        | line.contains("\\u") | line.rlike(r'\\[^"\\/bfnrtu]')
    )
    nd_guard = F.rand(7) > F.lit(-1.0)
    base = lines.filter(nd_guard & (stripped != ""))

    # two-step clean branch: the packed pass once into an attribute, the
    # anchored inner-object extracts once into attributes, the final
    # projection touches only attributes (filter predicates get no
    # subexpression sharing — same discipline as turtle_io)
    sep = "\x01"
    packed = F.regexp_replace(line, _LINE_PATTERN, f"$1{sep}$2{sep}$3")
    step = base.filter(~has_ctl).select(
        line.alias("_l"),
        (F.rand(17) > F.lit(-1.0)).alias("_g"),
        F.split(packed, sep).alias("_parts"),
    )
    parts = F.col("_parts")
    inner = F.get(parts, 2)
    step = step.select(
        "_l",
        "_g",
        (F.size(parts) == 3).alias("_matched"),
        F.get(parts, 0).alias("_subj_raw"),
        F.get(parts, 1).alias("_pred_raw"),
        inner.rlike(_NODE_RE).alias("_is_node"),
        inner.rlike(_VALUE_RE).alias("_is_value"),
        F.nullif(F.regexp_extract(inner, _NODE_RE, 1), F.lit("")).alias(
            "_node_id"
        ),
        F.regexp_extract(inner, _VALUE_RE, 1).alias("_body_raw"),
        F.nullif(F.regexp_extract(inner, _VALUE_RE, 2), F.lit("")).alias(
            "_lang"
        ),
        F.nullif(F.regexp_extract(inner, _VALUE_RE, 3), F.lit("")).alias(
            "_dt_raw"
        ),
    )
    is_node = F.col("_is_node")
    is_value = F.col("_is_value")
    ok = F.col("_matched") & (is_node | is_value)
    if not keep_malformed:
        step = step.filter(F.col("_g") & ok)
    obj_node = _unescape_json_col(F.col("_node_id"))
    clean = step.select(
        F.when(ok, _unescape_json_col(F.col("_subj_raw"))).alias("subj"),
        F.when(ok, _unescape_json_col(F.col("_pred_raw"))).alias("pred"),
        F.when(~ok, F.col("_l"))
        .when(is_node, obj_node)
        .otherwise(_unescape_json_col(F.col("_body_raw")))
        .alias("obj_value"),
        F.when(ok & is_node & obj_node.startswith("_:"), "bnode")
        .when(ok & is_node, "iri")
        .when(ok, "literal")
        .alias("obj_kind"),
        F.when(ok & is_value, F.col("_lang")).alias("obj_lang"),
        F.when(ok & is_value, _unescape_json_col(F.col("_dt_raw"))).alias(
            "obj_datatype"
        ),
    )
    assist = base.filter(has_ctl).select(_parse_fallback(line).alias("_p"))
    if not keep_malformed:
        assist = assist.filter(F.col("_p.obj_kind").isNotNull())
    assist = assist.select("_p.*")
    return clean.unionByName(assist)
