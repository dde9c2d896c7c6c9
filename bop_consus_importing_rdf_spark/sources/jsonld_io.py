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
    (``rdf_io.PARSED_SCHEMA``)."""
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

    line = F.col(line_col)
    stripped = F.trim(line)
    # exact-fallback routing: raw sentinel bytes (would corrupt the packed
    # split / replace-chain), \uXXXX (needs json.loads, incl. surrogate
    # pairs), and any non-named escape (\x, \q, … — invalid strict JSON,
    # must land in the malformed bucket; json.loads inside the fallback
    # raises per line and _parse_one_jsonld catches it)
    has_ctl = (
        line.contains("\x01") | line.contains("\x02")
        | line.contains("\\u") | line.rlike(r'\\[^"\\/bfnrtu]')
    )
    fb = _parse_fallback(F.when(has_ctl, line))

    sep = "\x01"
    packed = F.regexp_replace(line, _LINE_PATTERN, f"$1{sep}$2{sep}$3")
    parts = F.split(packed, sep)
    matched = F.size(parts) == 3
    subj_raw = F.get(parts, 0)
    pred_raw = F.get(parts, 1)
    inner = F.get(parts, 2)

    node_id = F.nullif(F.regexp_extract(inner, _NODE_RE, 1), F.lit(""))
    is_node = inner.rlike(_NODE_RE)
    is_value = inner.rlike(_VALUE_RE)
    body_raw = F.regexp_extract(inner, _VALUE_RE, 1)
    lang = F.nullif(F.regexp_extract(inner, _VALUE_RE, 2), F.lit(""))
    dt_raw = F.nullif(F.regexp_extract(inner, _VALUE_RE, 3), F.lit(""))

    subj = _unescape_json_col(subj_raw)
    pred = _unescape_json_col(pred_raw)
    obj_node = _unescape_json_col(node_id)
    body = _unescape_json_col(body_raw)
    dt = _unescape_json_col(dt_raw)

    ok = matched & (is_node | is_value)
    parsed = (
        lines.filter(stripped != "")
        .select(
            F.when(has_ctl, fb["subj"]).when(ok, subj).alias("subj"),
            F.when(has_ctl, fb["pred"]).when(ok, pred).alias("pred"),
            F.when(has_ctl, fb["obj_value"])
            .when(~ok, line)
            .when(is_node, obj_node)
            .otherwise(body)
            .alias("obj_value"),
            F.when(has_ctl, fb["obj_kind"])
            .when(ok & is_node & obj_node.startswith("_:"), "bnode")
            .when(ok & is_node, "iri")
            .when(ok, "literal")
            .alias("obj_kind"),
            F.when(has_ctl, fb["obj_lang"])
            .when(ok & is_value, lang)
            .alias("obj_lang"),
            F.when(has_ctl, fb["obj_datatype"])
            .when(ok & is_value, dt)
            .alias("obj_datatype"),
        )
    )
    if keep_malformed:
        return parsed
    return parsed.filter(F.col("obj_kind").isNotNull())
